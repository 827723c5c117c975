"""Pure-SQL surface: the scalar library + tables, usable from spark.sql.

The reference exposes its function library only to Scala code (e.g.
utils/DistanceCalculator.scala, utils/Geohash.scala, the KV accessors
in service/GeoTagOptimizedService.scala:23-34) — a user writing a new
job must import and call Scala. This module closes the same gap for
the SQL dialect: after ``register_all(spark, sf_dir)`` every scalar
function of the engine and every fixture table is addressable from a
plain ``spark.sql("...")`` string.

Two registration tiers, chosen by what keeps the hot path JVM-side:

1. **Catalyst SQL UDFs** (``CREATE OR REPLACE TEMPORARY FUNCTION ...
   RETURNS ... RETURN <expr>``) for every expression-based builder.
   These are *analyzed inline* — the body is substituted into the
   caller's plan, constant-folds, and stays inside whole-stage
   codegen; there is zero Python anywhere (pinned by
   tests/test_sql_surface.py::test_sql_udf_stays_jvm_side).

   The bodies are NOT hand-maintained twins: they are **derived from
   the live Column builders at registration time** by rendering the
   Catalyst expression to SQL (``SparkSession.expression(col).sql()``),
   so the SQL surface cannot drift from the DataFrame surface. The
   only transformation applied is rewriting Catalyst's non-parseable
   ``lambdafunction(body, x_1, ...)`` rendering back to the parser's
   ``(x_1, ...) -> body`` lambda syntax (:func:`_rewrite_lambdas`).

2. **Arrow-batched pandas UDFs** (``spark.udf.register``) for the two
   genuinely-procedural kernels the expression language cannot carry:
   Vincenty (iterative solver, functions/geo.py:70) and arbitrary-
   precision geohash encode (functions/geo.py:259). These cross the
   Python boundary per batch — callers on the 100 TB path should
   prefer ``hav_m``/``geohash7`` (pure-JVM) unless they need the
   sentinel-exact Vincenty semantics.

Table views come through :func:`register_tables`, which routes every
view through sources/tables.py::load_table so the NANOS-timestamp
normalization and map-dedup-policy pinning apply identically to SQL
users.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

from pulsar_spark_spark.functions.geo import (
    geohash_from_xy,
    geohash_quantize,
    geohash_udf,
    haversine_m,
    vincenty_udf,
)
from pulsar_spark_spark.functions.maps import (
    attrs_to_struct,  # noqa: F401  (struct shape is per-call; not registered)
    get_attr,
    has_attr,
    kv_list_to_map_first_wins,
    kv_list_to_map_last_wins,
)
from pulsar_spark_spark.functions.text import (
    char_shingles,
    clean_text,
    fingerprint64,
    lang_id,
    md5_i64,
    minhash_signature,
    quality_features,
    simhash16,
    tokens,
    word_ngrams,
)
from pulsar_spark_spark.functions.time import (
    date_string,
    format_duration,
    future_past_flag,
    ist_epoch_millis,
    parse_wire_ts,
    ts_millis,
    ts_seconds,
)

# the BPE-ish pre-tokenizer regex used by doc_quality_stats
from pulsar_spark_spark.plans.text import _BPE_RE  # noqa: E402

# the ANN family's exact scorer (expression fold, oracle-identical)
from pulsar_spark_spark.plans.similarity import cosine as _cosine  # noqa: E402

_LAMBDA_CALL = "lambdafunction("
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _expr_sql(spark: SparkSession, col: Column) -> str:
    """Render a (classic-mode) Column's Catalyst expression as SQL."""
    return spark._jsparkSession.expression(col._jc).sql()


def _split_top_level(s: str) -> list[str]:
    """Split a paren-balanced argument list on top-level commas,
    respecting single-quoted string literals."""
    parts: list[str] = []
    depth = 0
    in_str = False
    start = 0
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
        i += 1
    parts.append(s[start:].strip())
    return parts


def _rewrite_lambdas(sql: str) -> str:
    """Rewrite Catalyst's ``lambdafunction(body, v1[, v2])`` rendering
    to the parser's ``(v1[, v2]) -> body`` lambda syntax.

    Innermost-first so nested higher-order functions (minhash's
    transform-inside-transform, simhash's aggregate) resolve cleanly.
    Occurrences inside string literals are NOT rewritten (a literal
    containing the word "lambdafunction(" must survive verbatim —
    pinned by the adversarial round-trip test).
    """

    def _last_call_outside_strings(s: str) -> int:
        pos = -1
        in_str = False
        i = 0
        while i < len(s):
            ch = s[i]
            if in_str:
                if ch == "\\":
                    i += 2
                    continue
                if ch == "'":
                    in_str = False
            elif ch == "'":
                in_str = True
            elif s.startswith(_LAMBDA_CALL, i):
                pos = i
                i += len(_LAMBDA_CALL)
                continue
            i += 1
        return pos

    while True:
        pos = _last_call_outside_strings(sql)  # rightmost = innermost-or-later
        if pos < 0:
            return sql
        # walk to the matching close paren
        depth = 0
        in_str = False
        i = pos + len(_LAMBDA_CALL) - 1  # at the '('
        end = -1
        while i < len(sql):
            ch = sql[i]
            if in_str:
                if ch == "\\":
                    i += 2
                    continue
                if ch == "'":
                    in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
            i += 1
        if end < 0:  # unbalanced — leave as-is; CREATE will fail loudly
            return sql
        args = _split_top_level(sql[pos + len(_LAMBDA_CALL) : end])
        body, vars_ = args[0], args[1:]
        if not vars_ or not all(_IDENT.match(v) for v in vars_):
            # not the shape we expect — fail loudly at CREATE time
            return sql
        # grammar: single param must be bare (`x -> e`); multi needs parens
        head = vars_[0] if len(vars_) == 1 else f"({', '.join(vars_)})"
        lam = f"{head} -> {body}"
        sql = sql[:pos] + lam + sql[end + 1 :]


def _geohash7(lat: Column, lng: Column) -> Column:
    x, y = geohash_quantize(lat, lng, 7)
    return geohash_from_xy(x, y, 7)


# name -> (params [(name, sql_type)], builder(*param_cols) -> Column)
# or    -> (params, explicit SQL body str, sql return type) for the
# param-generic wrappers whose Python builders take literals.
_EXPR_FUNCTIONS: dict = {
    # geo
    "hav_m": (
        [("lat1", "DOUBLE"), ("lng1", "DOUBLE"), ("lat2", "DOUBLE"), ("lng2", "DOUBLE")],
        haversine_m,
    ),
    "geohash7": ([("lat", "DOUBLE"), ("lng", "DOUBLE")], _geohash7),
    # text
    "clean_text": ([("s", "STRING")], clean_text),
    "tokens": ([("s", "STRING")], tokens),
    "word_ngrams3": ([("s", "STRING")], lambda s: word_ngrams(tokens(s), 3)),
    "char_shingles5": ([("s", "STRING")], lambda s: char_shingles(s, 5)),
    "md5_i64": ([("s", "STRING")], md5_i64),
    "fingerprint64": ([("s", "STRING")], fingerprint64),
    "minhash16": (
        [("s", "STRING")],
        lambda s: minhash_signature(char_shingles(s, 5), 16),
    ),
    "simhash16": ([("s", "STRING")], lambda s: simhash16(tokens(s))),
    "lang_id": ([("s", "STRING")], lambda s: lang_id(tokens(s))),
    "quality_stats": (
        [("s", "STRING")],
        lambda s: F.struct(
            *[c.alias(n) for n, c in quality_features(s).items()]
        ),
    ),
    "bpe_count": (
        [("s", "STRING")],
        lambda s: F.size(F.regexp_extract_all(s, F.lit(_BPE_RE), 0)),
    ),
    # embeddings (ANN family scorer; same fold as the oracle twin)
    "cos_sim": ([("a", "ARRAY<FLOAT>"), ("b", "ARRAY<FLOAT>")], _cosine),
    # maps / KV attributes
    "kv_to_map_last": (
        [("kv", "ARRAY<STRUCT<key: STRING, value: STRING>>")],
        kv_list_to_map_last_wins,
    ),
    "kv_to_map_first": (
        [("kv", "ARRAY<STRUCT<key: STRING, value: STRING>>")],
        kv_list_to_map_first_wins,
    ),
    "get_attr": ([("m", "MAP<STRING, STRING>"), ("k", "STRING")], get_attr),
    "has_attr": ([("m", "MAP<STRING, STRING>"), ("k", "STRING")], has_attr),
    # time
    "ts_seconds": ([("ts", "TIMESTAMP")], ts_seconds),
    "ts_millis": ([("ts", "TIMESTAMP")], ts_millis),
    "parse_wire_ts": ([("s", "STRING")], parse_wire_ts),
    "ist_epoch_millis": ([("s", "STRING")], ist_epoch_millis),
    "date_string": ([("ts", "TIMESTAMP")], date_string),
    "format_duration": ([("ms", "BIGINT")], format_duration),
    "future_past_flag": (
        [("device_ts", "TIMESTAMP"), ("received_ts", "TIMESTAMP")],
        future_past_flag,
    ),
    # param-generic: the Python builder takes format literals, so the
    # SQL body is written directly (parity-pinned in tests).
    "convert_time": (
        [("s", "STRING"), ("in_fmt", "STRING"), ("out_fmt", "STRING")],
        "date_format(to_timestamp(s, in_fmt), out_fmt)",
        "STRING",
    ),
}


def _return_type(spark: SparkSession, params, col: Column) -> str:
    """Derive the SQL return type by analyzing the builder against a
    one-row NULL-typed probe relation."""
    probe = spark.sql(
        "SELECT " + ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in params)
    )
    return probe.select(col).schema[0].dataType.simpleString()


# procedural kernels registered as Arrow pandas UDFs (the slow path —
# per-batch Python crossing; prefer hav_m/geohash7 when exact
# Vincenty/var-precision semantics aren't required)
_PANDAS_FUNCTIONS: dict = {
    "vincenty_m": (
        "lat1 DOUBLE, lng1 DOUBLE, lat2 DOUBLE, lng2 DOUBLE",
        "double",
        vincenty_udf,
    ),
    "geohash_enc": ("lat DOUBLE, lng DOUBLE, precision INT", "string", geohash_udf),
}


def function_surface(spark: SparkSession) -> list[dict]:
    """The full registered-function surface as data: one dict per
    function with name/signature/return type/tier, the derived SQL
    body for expression functions, and the callable for pandas
    functions. SINGLE source of truth — :func:`register_functions`
    registers from it and tools/gen_functions.py documents from it,
    so the two can't drift."""
    rows: list[dict] = []
    for name, spec in _EXPR_FUNCTIONS.items():
        params = spec[0]
        if len(spec) == 3:  # explicit body
            body, rtype = spec[1], spec[2]
        else:
            builder = spec[1]
            cols = [F.col(n) for n, _ in params]
            col = builder(*cols)
            body = _rewrite_lambdas(_expr_sql(spark, col))
            rtype = _return_type(spark, params, col)
        rows.append(
            {
                "name": name,
                "signature": ", ".join(f"{n} {t}" for n, t in params),
                "returns": rtype,
                "tier": "expression",
                "body": body,
            }
        )
    for name, (sig, rtype, fn) in _PANDAS_FUNCTIONS.items():
        rows.append(
            {
                "name": name,
                "signature": sig,
                "returns": rtype,
                "tier": "pandas",
                "body": None,
                "fn": fn,
            }
        )
    return rows


def _require_classic(spark: SparkSession) -> None:
    """Fail with a diagnosable message on Spark Connect sessions: the
    derivation rides classic-only private handles (spark._jsparkSession,
    col._jc), which Connect replaces with opaque proxies."""
    if not hasattr(spark, "_jsparkSession"):
        raise RuntimeError(
            "pulsar_spark_spark.sql requires a CLASSIC SparkSession: the "
            "SQL-UDF bodies are derived from the live Column builders via "
            "SparkSession.expression(...).sql(), which Spark Connect does "
            "not expose. Use a non-remote session for register_all / "
            "register_functions (the DataFrame surface works on either)."
        )


def _derivation_error(exc: Exception) -> RuntimeError:
    import pyspark

    return RuntimeError(
        "pulsar_spark_spark.sql: SQL-surface derivation failed on pyspark "
        f"{pyspark.__version__}. The surface is derived from live Column "
        "builders through the private SparkSession.expression(...).sql() "
        "renderer plus the lambdafunction(...) rewrite; a Spark "
        "minor-version change to either breaks it. The DataFrame surface "
        f"is unaffected. Underlying error: {exc!r}"
    )


def register_functions(spark: SparkSession) -> list[str]:
    """Register the scalar library for spark.sql use; returns the
    registered names (expression UDFs first, then the pandas UDFs).

    Guarded three ways against Spark-version drift (the bodies are
    derived through a private API — see module docstring): Connect
    sessions are rejected up front with a clear message; any failure
    while rendering or re-parsing a derived body raises a loud
    RuntimeError naming the pyspark version instead of a bare
    AttributeError/ParseException; and two known-value probes (one
    plain expression, one lambda-bearing) run after registration so a
    rendering change that PARSES but mis-translates is also caught at
    register time, never silently at query time."""
    _require_classic(spark)
    names: list[str] = []
    try:
        rows = function_surface(spark)
    except Exception as e:  # noqa: BLE001 — private-API breakage surfaces here
        raise _derivation_error(e) from e
    for row in rows:
        if row["tier"] == "expression":
            try:
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY FUNCTION "
                    f"{row['name']}({row['signature']}) "
                    f"RETURNS {row['returns']} RETURN {row['body']}"
                )
            except Exception as e:  # noqa: BLE001
                raise _derivation_error(e) from e
        else:
            spark.udf.register(row["name"], row["fn"])
        names.append(row["name"])
    # value probes: clean_text is a plain expression; cos_sim carries
    # zip_with/aggregate lambdas through the rewrite. Exact equality —
    # 25.0/(5.0*5.0) is exactly 1.0 in binary floating point.
    probes = (
        ("SELECT clean_text('A1b c!')", "ab c"),
        ("SELECT cos_sim(array(3.0F, 4.0F), array(3.0F, 4.0F))", 1.0),
    )
    for sql_text, want in probes:
        got = spark.sql(sql_text).first()[0]
        if got != want:
            raise _derivation_error(
                AssertionError(f"probe {sql_text!r} returned {got!r}, want {want!r}")
            )
    return names


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create loader-normalized temp views for every fixture table
    present under ``sf_dir`` (NANOS→µs timestamp normalization and
    map-dedup pinning included — SQL users see the same relations the
    DataFrame plans do). Delegates to ``sources.tables.register_views``
    so the skip rule / path layout lives in one place."""
    from pulsar_spark_spark.sources.tables import register_views

    return register_views(spark, sf_dir)


_MISSING_INPUT_CLASSES = {"PATH_NOT_FOUND", "TABLE_OR_VIEW_NOT_FOUND"}


def _is_missing_input(e: Exception) -> bool:
    """True only for the absent-source AnalysisExceptions that a
    partial fixture dir legitimately produces; every other analysis
    error (unresolved column, bad view SQL) is a real plan bug and is
    re-raised by the callers."""
    from pyspark.errors import AnalysisException

    return (
        isinstance(e, AnalysisException)
        and (e.getErrorClass() or "") in _MISSING_INPUT_CLASSES
    )


def register_derived(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp views for the engine's derived relations — the ones SQL
    users actually want to query: ``geo_events`` (events + the
    deterministic lat/lng/accuracy columns every geo query uses,
    plans/geo.py:67) and ``geofences`` (nation-derived fence table,
    plans/geo.py:108). Lazy like all views. A relation whose source
    table is absent under ``sf_dir`` is skipped, like
    :func:`register_tables` does for tables."""
    from pulsar_spark_spark.plans.geo import geo_events, geofences

    names = []
    for name, fn in (("geo_events", geo_events), ("geofences", geofences)):
        try:
            fn(spark, sf_dir).createOrReplaceTempView(name)
        except Exception as e:
            if not _is_missing_input(e):  # real plan bug → surface
                raise
            continue
        names.append(name)
    return names


def register_queries(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every registered engine query as a temp view (lazy —
    views carry the plan, nothing executes until queried), so
    ``spark.sql("SELECT * FROM user_sessions WHERE ...")`` composes
    engine queries with ad-hoc SQL. Queries whose input tables are
    absent under ``sf_dir`` are skipped (partial fixture dirs are a
    supported input — :func:`register_tables` already guards them), so
    one missing parquet doesn't abort the rest of the surface.

    Recall note for the embedding dedup views
    (``embedding_near_dup_pairs`` / ``embedding_dedup_clusters``):
    SRP banding recall in the 0.9-0.97 near-dup band depends on the
    corpus-adaptive bucket width — 0.89 at the 8-bit floor, but as
    low as 0.78 at the 12-bit width a ~200k-unique corpus resolves to
    (measured, SCALE.md). Since round 12 the views' plans AUTO-enable
    Hamming-1 multiprobe (recall ≈0.99, candidate join (bits+1)×
    larger) whenever the closed-form recall at cos 0.95 drops below
    0.85 — EXCEPT (round 13) on replica-dominated corpora: when the
    exact-collapse rate (1 − n_unique/n_rows) is ≥ 0.5, the high-sim
    mass is exact replicas the banding-independent vkey collapse
    already catches, and the plan stays exact-bucket (probing was
    measured at 6.3× candidate volume for zero recall gain there —
    emb_recall.json). The rate itself is deterministic at the
    decision boundary (round 14): within the HLL error band of the
    0.5 threshold it escalates to an exact distinct count, so the
    arm a given corpus gets cannot flip across engine restarts.
    Price the trade for your corpus with
    ``plans.similarity.srp_banding_recall`` /
    ``plans.similarity.emb_collapse_rate`` and pin
    ``multiprobe=True/False`` on the DataFrame surface to override."""
    from pulsar_spark_spark.plans import QUERIES

    names = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).createOrReplaceTempView(name)
        except Exception as e:
            if not _is_missing_input(e):  # real plan bug → surface
                raise
            continue
        names.append(name)
    return names


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    """Functions + tables + query views in one call."""
    return {
        "functions": register_functions(spark),
        "tables": register_tables(spark, sf_dir),
        "derived": register_derived(spark, sf_dir),
        "queries": register_queries(spark, sf_dir),
    }
