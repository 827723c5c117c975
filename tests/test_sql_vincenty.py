"""The recursive-CTE Vincenty fragment in isolation: distances agree
with vincenty_np to the documented engine wobble, and the sentinel /
same-coordinate / self-pair short circuits match the numpy order of
precedence."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pulsar_spark_spark.functions.geo import (
    sql_vincenty_alldist_ctes,
    vincenty_np,
)


def _alldist(rows: list[tuple]) -> pd.DataFrame:
    """rows: (user_id, i, n, lat, lng) — run the fragment over them."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ord (user_id BIGINT, i BIGINT, n BIGINT, "
        "lat DOUBLE, lng DOUBLE)"
    )
    con.executemany("INSERT INTO ord VALUES (?,?,?,?,?)", rows)
    return con.execute(
        f"WITH RECURSIVE {sql_vincenty_alldist_ctes()} "
        "SELECT user_id, i, j, d, differs FROM alldist ORDER BY user_id, i, j"
    ).fetchdf()


def test_distances_match_numpy_within_wobble():
    rng = np.random.default_rng(11)
    lats = 2.0 + rng.random(12) * 38
    lngs = 60.0 + rng.random(12) * 40
    rows = [(1, k + 1, 12, float(lats[k]), float(lngs[k])) for k in range(12)]
    out = _alldist(rows)
    assert len(out) == 144
    want = vincenty_np(
        np.repeat(lats, 12), np.repeat(lngs, 12),
        np.tile(lats, 12), np.tile(lngs, 12),
    )
    got = out.sort_values(["i", "j"])["d"].to_numpy()
    # engine wobble (numpy-vs-libm atan2 ulps) is RELATIVE, ~1e-8 —
    # at the kernels' 200/300 m decision scale that is ~1e-6 m against
    # measured fixture margins of ~0.4 m
    nz = want > 0
    assert np.max(np.abs(got[nz] - want[nz]) / want[nz]) < 1e-7
    assert np.all(got[~nz] == 0.0)


def test_sentinel_beats_same_point_and_self_pairs_are_zero():
    rows = [
        (1, 1, 3, 0.0, 70.0),   # lat==0 sentinel point
        (1, 2, 3, 20.0, 70.0),
        (1, 3, 3, 20.0, 70.0),  # duplicate coordinate of i=2
    ]
    out = _alldist(rows).set_index(["i", "j"])
    assert out.loc[(1, 1), "d"] == 1.0e7       # self pair of the sentinel
    assert out.loc[(1, 2), "d"] == 1.0e7       # sentinel wins
    assert out.loc[(2, 2), "d"] == 0.0         # self pair
    assert out.loc[(2, 3), "d"] == 0.0         # duplicate coords
    assert not out.loc[(2, 3), "differs"]
    assert out.loc[(2, 1), "differs"]          # differing coords flagged
