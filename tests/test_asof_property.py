"""Property test: asof_backward_join vs pandas merge_asof.

pandas ``merge_asof`` is the canonical as-of reference implementation
(the kdb ``aj`` semantics); generating random keyed, timestamped
frames and asserting the Spark union-tag + window formulation matches
it row-for-row pins the operator far beyond the fixed-fixture oracle
in CORRECTNESS (which exercises one distribution).

Tie semantics pinned explicitly:
- strict=True  ≙ merge_asof(allow_exact_matches=False)
- among equal right timestamps the LARGEST sequence id wins (the
  operator's documented deterministic tie-break), which merge_asof
  honors by taking the last row in sort order.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pulsar_spark_spark.plans.timeseries import asof_backward_join

# keep domains small so key/timestamp collisions (the interesting tie
# cases) are common
_key_st = st.integers(min_value=0, max_value=3)
_ts_st = st.integers(min_value=0, max_value=20)

_left_st = st.lists(
    st.tuples(_key_st, _ts_st), min_size=1, max_size=12
)
_right_st = st.lists(
    st.tuples(_key_st, _ts_st, st.floats(0, 100, allow_nan=False)),
    min_size=0,
    max_size=12,
)


def _pandas_asof(left_rows, right_rows, strict: bool):
    left = pd.DataFrame(
        [
            {"purchase_id": i, "user_id": k, "purchase_ts": pd.Timestamp(t, unit="s")}
            for i, (k, t) in enumerate(left_rows)
        ]
    )
    right = pd.DataFrame(
        [
            {
                "user_id": k,
                "click_id": 1000 + i,
                "click_ts": pd.Timestamp(t, unit="s"),
                "click_value": v,
            }
            for i, (k, t, v) in enumerate(right_rows)
        ],
        columns=["user_id", "click_id", "click_ts", "click_value"],
    )
    if right.empty:
        out = left.copy()
        out["click_id"] = None
        return out
    # merge_asof keeps the LAST right row among equal (key, ts) in sort
    # order; sorting by (click_ts, click_id) makes that the largest
    # click_id — the operator's documented tie-break
    right = right.sort_values(["click_ts", "click_id"], kind="mergesort")
    left_s = left.sort_values(["purchase_ts", "purchase_id"], kind="mergesort")
    return pd.merge_asof(
        left_s,
        right,
        left_on="purchase_ts",
        right_on="click_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=not strict,
    )


@pytest.mark.parametrize("strict", [True, False])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=_left_st, right_rows=_right_st)
def test_asof_matches_pandas_merge_asof(spark, strict, left_rows, right_rows):
    epoch = dt.datetime(1970, 1, 1)
    left = spark.createDataFrame(
        [
            (i, k, epoch + dt.timedelta(seconds=t))
            for i, (k, t) in enumerate(left_rows)
        ],
        "purchase_id long, user_id long, purchase_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (k, 1000 + i, epoch + dt.timedelta(seconds=t), v)
            for i, (k, t, v) in enumerate(right_rows)
        ],
        "user_id long, click_id long, click_ts timestamp, click_value double",
    )
    got = {
        r["purchase_id"]: r["click_id"]
        for r in asof_backward_join(
            left,
            right,
            on="user_id",
            left_ts="purchase_ts",
            right_ts="click_ts",
            right_cols=["click_id", "click_ts", "click_value"],
            strict=strict,
        ).collect()
    }
    want_df = _pandas_asof(left_rows, right_rows, strict)
    want = {
        int(r.purchase_id): (None if pd.isna(r.click_id) else int(r.click_id))
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_rejects_non_integral_tiebreak(spark):
    """Round 14 review fix: the right-side tie order must come from an
    integral id column — a double/string first column silently cast
    to long made the tie winner vary across runs."""
    import pytest

    left = spark.createDataFrame(
        [(1, 1)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 0, 1.0, 7)], "k long, rts long, v double, rid long"
    )
    with pytest.raises(ValueError, match="tiebreak"):
        asof_backward_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["v", "rid"],
        )
    # explicit integral tiebreak accepts the same column order
    out = asof_backward_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["v", "rid"], tiebreak="rid",
    )
    assert out.collect()[0]["rid"] == 7
