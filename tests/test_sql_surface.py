"""The pure-SQL surface (pulsar_spark_spark/sql.py).

Parity contract: every registered SQL function must return exactly
what its DataFrame Column builder returns on the same input — the
bodies are derived from the builders at registration time, and these
tests pin that derivation (incl. the lambdafunction → parser-lambda
rewrite) against live fixture data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pulsar_spark_spark.functions.geo import (
    geohash_encode_py,
    geohash_from_xy,
    geohash_quantize,
    haversine_m,
    vincenty_py,
)
from pulsar_spark_spark.functions.maps import (
    kv_list_to_map_first_wins,
    kv_list_to_map_last_wins,
)
from pulsar_spark_spark.functions.text import (
    char_shingles,
    clean_text,
    fingerprint64,
    lang_id as _lang_id,
    md5_i64,
    minhash_signature,
    quality_features as _quality_features,
    simhash16,
    tokens,
    word_ngrams,
)
from pulsar_spark_spark.plans.text import _BPE_RE
from pulsar_spark_spark.functions.time import (
    date_string,
    format_duration,
    future_past_flag,
    ist_epoch_millis,
    ts_millis,
    ts_seconds,
)
from pulsar_spark_spark.sources.tables import load_table
from pulsar_spark_spark.sql import register_functions, register_tables
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_functions(spark)
    register_tables(spark, SF_DIR_SMALL)
    return spark


# --------------------------------------------------------------------
# text functions: SQL vs DataFrame builder over the documents fixture
# --------------------------------------------------------------------
_TEXT_CASES = {
    "clean_text": lambda c: clean_text(c),
    "tokens": lambda c: tokens(c),
    "word_ngrams3": lambda c: word_ngrams(tokens(c), 3),
    "char_shingles5": lambda c: char_shingles(c, 5),
    "md5_i64": lambda c: md5_i64(c),
    "fingerprint64": lambda c: fingerprint64(c),
    "minhash16": lambda c: minhash_signature(char_shingles(c, 5), 16),
    "simhash16": lambda c: simhash16(tokens(c)),
    "lang_id": lambda c: _lang_id(tokens(c)),
    "quality_stats": lambda c: F.struct(
        *[e.alias(n) for n, e in _quality_features(c).items()]
    ),
    "bpe_count": lambda c: F.size(F.regexp_extract_all(c, F.lit(_BPE_RE), 0)),
}


@pytest.mark.parametrize("fname", sorted(_TEXT_CASES))
def test_text_function_parity(sql_spark, fname):
    builder = _TEXT_CASES[fname]
    got = sql_spark.sql(
        f"SELECT doc_id, {fname}(text) AS v FROM documents ORDER BY doc_id"
    ).collect()
    docs = load_table(sql_spark, "documents", SF_DIR_SMALL)
    want = (
        docs.select("doc_id", builder(F.col("text")).alias("v"))
        .orderBy("doc_id")
        .collect()
    )
    assert got == want


# --------------------------------------------------------------------
# geo functions
# --------------------------------------------------------------------
# events carries no raw coordinates (geo plans derive them, plans/
# geo.py:68) — derive a deterministic (lat, lng) from event_id the
# same way on both sides.
# D suffix: SQL decimal literals would otherwise compute in DECIMAL
# and differ from the DataFrame side's doubles by an ulp.
_SQL_LATLNG = (
    "-40.0D + (event_id % 1600) * 0.05D AS lat, "
    "-180.0D + (event_id % 7200) * 0.05D AS lng"
)


def _df_latlng(ev):
    return ev.select(
        "event_id",
        (F.lit(-40.0) + (F.col("event_id") % 1600) * 0.05).alias("lat"),
        (F.lit(-180.0) + (F.col("event_id") % 7200) * 0.05).alias("lng"),
    )


def test_hav_m_parity(sql_spark):
    got = sql_spark.sql(
        f"SELECT event_id, hav_m(lat, lng, 12.9716, 77.5946) AS d FROM "
        f"(SELECT event_id, {_SQL_LATLNG} FROM events) "
        "ORDER BY event_id LIMIT 500"
    ).collect()
    ev = _df_latlng(load_table(sql_spark, "events", SF_DIR_SMALL))
    want = (
        ev.select(
            "event_id",
            haversine_m(
                F.col("lat"), F.col("lng"), F.lit(12.9716), F.lit(77.5946)
            ).alias("d"),
        )
        .orderBy("event_id")
        .limit(500)
        .collect()
    )
    assert got == want


def test_geohash7_parity(sql_spark):
    got = sql_spark.sql(
        f"SELECT event_id, geohash7(lat, lng) AS gh FROM "
        f"(SELECT event_id, {_SQL_LATLNG} FROM events) "
        "ORDER BY event_id LIMIT 500"
    ).collect()
    ev = _df_latlng(load_table(sql_spark, "events", SF_DIR_SMALL))
    x, y = geohash_quantize(F.col("lat"), F.col("lng"), 7)
    want = (
        ev.select("event_id", geohash_from_xy(x, y, 7).alias("gh"))
        .orderBy("event_id")
        .limit(500)
        .collect()
    )
    assert got == want


def test_pandas_udfs(sql_spark):
    rows = sql_spark.sql(
        "SELECT lat, lng, vincenty_m(lat, lng, 12.9716, 77.5946) AS v, "
        "geohash_enc(lat, lng, 7) AS g, geohash7(lat, lng) AS g_expr FROM "
        f"(SELECT event_id, {_SQL_LATLNG} FROM events) "
        "ORDER BY event_id LIMIT 50"
    ).collect()
    assert rows
    for r in rows:
        assert r["v"] == pytest.approx(
            vincenty_py(r["lat"], r["lng"], 12.9716, 77.5946), abs=1e-6
        )
        assert r["g"] == geohash_encode_py(r["lat"], r["lng"], 7)
        assert r["g_expr"] == r["g"]  # JVM expression == python encoder


def test_cos_sim_parity(sql_spark):
    from pulsar_spark_spark.plans.similarity import cosine

    got = sql_spark.sql(
        "SELECT a.vec_id AS va, b.vec_id AS vb, "
        "cos_sim(a.embedding, b.embedding) AS c "
        "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 "
        "WHERE a.vec_id < 50 ORDER BY va"
    ).collect()
    emb = load_table(sql_spark, "embeddings", SF_DIR_SMALL)
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    want = (
        a.join(b, F.col("vb") == F.col("va") + 1)
        .filter(F.col("va") < 50)
        .select("va", "vb", cosine(F.col("ea"), F.col("eb")).alias("c"))
        .orderBy("va")
        .collect()
    )
    assert got == want and len(got) > 0


# --------------------------------------------------------------------
# KV / map functions
# --------------------------------------------------------------------
_KV_LIT = (
    "array(named_struct('key', 'a', 'value', '1'), "
    "named_struct('key', 'b', 'value', '2'), "
    "named_struct('key', 'a', 'value', '3'))"
)


def test_kv_map_functions(sql_spark):
    row = sql_spark.sql(
        f"SELECT kv_to_map_last({_KV_LIT}) AS last, "
        f"kv_to_map_first({_KV_LIT}) AS first, "
        f"get_attr(kv_to_map_last({_KV_LIT}), 'a') AS ga, "
        f"has_attr(kv_to_map_last({_KV_LIT}), 'z') AS hz"
    ).collect()[0]
    assert row["last"] == {"a": "3", "b": "2"}  # last duplicate wins
    assert row["first"] == {"a": "1", "b": "2"}  # first duplicate wins
    assert row["ga"] == "3"
    assert row["hz"] is False
    # parity vs the builders on the same literal
    df = sql_spark.sql(f"SELECT {_KV_LIT} AS kv")
    want = df.select(
        kv_list_to_map_last_wins(F.col("kv")).alias("last"),
        kv_list_to_map_first_wins(F.col("kv")).alias("first"),
    ).collect()[0]
    assert row["last"] == want["last"] and row["first"] == want["first"]


# --------------------------------------------------------------------
# time functions over the events fixture
# --------------------------------------------------------------------
def test_time_function_parity(sql_spark):
    got = sql_spark.sql(
        "SELECT event_id, ts_seconds(ts) AS s, ts_millis(ts) AS ms, "
        "date_string(ts) AS d FROM events ORDER BY event_id LIMIT 500"
    ).collect()
    ev = load_table(sql_spark, "events", SF_DIR_SMALL)
    want = (
        ev.select(
            "event_id",
            ts_seconds("ts").alias("s"),
            ts_millis("ts").alias("ms"),
            date_string(F.col("ts")).alias("d"),
        )
        .orderBy("event_id")
        .limit(500)
        .collect()
    )
    assert got == want


def test_time_scalar_functions(sql_spark):
    row = sql_spark.sql(
        "SELECT ist_epoch_millis('2016-04-04 14:14:49+0530') AS ms, "
        "format_duration(90061000) AS dur, "
        "convert_time('2016-04-04 14:14:49+0530', "
        "'yyyy-MM-dd HH:mm:ssZ', 'yyyy-MM-dd HH:mm') AS ct, "
        "future_past_flag(timestamp'2024-01-02 00:00:00', "
        "timestamp'2024-01-01 00:00:00') AS fut, "
        "future_past_flag(timestamp'2024-01-01 00:00:00', "
        "timestamp'2024-01-03 00:00:00') AS past, "
        "future_past_flag(timestamp'2024-01-01 00:00:00', "
        "timestamp'2024-01-01 00:00:01') AS ok"
    ).collect()[0]
    df = sql_spark.sql("SELECT '2016-04-04 14:14:49+0530' AS s")
    want_ms = df.select(ist_epoch_millis(F.col("s")).alias("v")).collect()[0]["v"]
    assert row["ms"] == want_ms
    df2 = sql_spark.sql("SELECT CAST(90061000 AS BIGINT) AS m")
    want_dur = df2.select(format_duration(F.col("m")).alias("v")).collect()[0]["v"]
    assert row["dur"] == want_dur
    assert row["ct"] == "2016-04-04 08:44"  # UTC session zone
    assert row["fut"] == "FUTURE" and row["past"] == "PAST" and row["ok"] is None
    # parity for the flag builder
    df3 = sql_spark.sql(
        "SELECT timestamp'2024-01-02 00:00:00' AS a, "
        "timestamp'2024-01-01 00:00:00' AS b"
    )
    want_fut = df3.select(
        future_past_flag(F.col("a"), F.col("b")).alias("v")
    ).collect()[0]["v"]
    assert row["fut"] == want_fut


# --------------------------------------------------------------------
# the lambdafunction → parser-lambda rewrite, standalone
# --------------------------------------------------------------------
def test_rewrite_lambdas_adversarial_cases(sql_spark):
    """Round-trip Catalyst rendering → rewrite → parser for expression
    shapes beyond the registered set: nested lambdas, two-argument
    aggregate lambdas, and string literals containing commas, parens
    and the word lambdafunction itself."""
    from pulsar_spark_spark.sql import _expr_sql, _rewrite_lambdas

    cases = [
        # nested transform-in-transform
        F.transform(
            F.col("arr"), lambda x: F.transform(F.col("arr"), lambda y: x + y)
        ),
        # aggregate: 2-arg merge lambda + 1-arg finish lambda
        F.aggregate(
            F.col("arr"), F.lit(0), lambda acc, x: acc + x, lambda acc: acc * 2
        ),
        # filter with a string literal full of syntax-looking chars
        F.filter(
            F.col("strs"),
            lambda s: s != F.lit("a,b)(c -> lambdafunction(x, y)"),
        ),
        # exists + zip_with (different HOF arities)
        F.exists(F.col("arr"), lambda x: x > 1),
        F.zip_with(F.col("arr"), F.col("arr"), lambda a, b: a * b),
    ]
    src = "(SELECT array(1, 2, 3) AS arr, array('a,b)(c -> lambdafunction(x, y)', 'z') AS strs)"
    probe = sql_spark.sql(f"SELECT * FROM {src}")
    for c in cases:
        body = _rewrite_lambdas(_expr_sql(sql_spark, c))
        got = sql_spark.sql(f"SELECT {body} AS v FROM {src}").collect()
        want = probe.select(c.alias("v")).collect()
        assert got == want, body


# --------------------------------------------------------------------
# plan shape: expression UDFs must stay JVM-side (inlined, codegen)
# --------------------------------------------------------------------
def test_sql_udf_stays_jvm_side(sql_spark):
    # every expression UDF inlines into the caller's plan — no Python
    # eval node anywhere, even for the lambda-heavy ones
    df = sql_spark.sql(
        "SELECT md5_i64(text) AS h, simhash16(text) AS s, "
        "minhash16(text) AS mh, "
        "hav_m(CAST(doc_id AS DOUBLE), 0.0, 0.0, 0.0) AS d "
        "FROM documents"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "pythonUDF" not in plan.lower()
    # lambda-free bodies additionally stay inside whole-stage codegen
    # (higher-order functions are codegen-fallback by design)
    df2 = sql_spark.sql(
        "SELECT md5_i64(text) AS h, "
        "hav_m(CAST(doc_id AS DOUBLE), 0.0, 0.0, 0.0) AS d "
        "FROM documents"
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    # codegen'd spans print with the `*(n)` stage marker
    assert "*(1) Project" in plan2


# --------------------------------------------------------------------
# table + query views
# --------------------------------------------------------------------
def test_table_views_loader_normalized(sql_spark):
    # the events view must carry the loader's NANOS→µs normalization:
    # ts is a real timestamp, not the raw nanosecond bigint
    [(dtype,)] = [
        (f.dataType.simpleString(),)
        for f in sql_spark.table("events").schema.fields
        if f.name == "ts"
    ]
    assert dtype == "timestamp"


def test_register_all_tolerates_partial_fixture_dir(sql_spark, tmp_path):
    """A fixture dir missing tables must not abort registration: the
    queries/derived views that need absent tables are skipped, the
    rest of the surface stays usable."""
    import os

    from pulsar_spark_spark.sql import register_all

    os.symlink(
        os.path.join(SF_DIR_SMALL, "documents.parquet"),
        tmp_path / "documents.parquet",
    )
    out = register_all(sql_spark, str(tmp_path))
    assert out["tables"] == ["documents"]
    assert "doc_exact_dup_groups" in out["queries"]  # documents-only
    assert not any(q.startswith("ann_topk") for q in out["queries"])
    assert out["derived"] == []  # geo relations need events/nation
    n = sql_spark.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n > 0
    # restore the full-fixture views for tests that run after this one
    register_all(sql_spark, SF_DIR_SMALL)


def test_derived_views(sql_spark):
    from pulsar_spark_spark.plans.geo import geo_events
    from pulsar_spark_spark.sql import register_derived

    register_derived(sql_spark, SF_DIR_SMALL)
    # SQL over the derived relation + a registered function, vs the
    # DataFrame twin
    got = sql_spark.sql(
        "SELECT geohash7(lat, lng) AS cell, count(*) AS n "
        "FROM geo_events GROUP BY cell ORDER BY cell"
    ).collect()
    ge = geo_events(sql_spark, SF_DIR_SMALL)
    x, y = geohash_quantize(F.col("lat"), F.col("lng"), 7)
    want = (
        ge.select(geohash_from_xy(x, y, 7).alias("cell"))
        .groupBy("cell")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy("cell")
        .collect()
    )
    assert got == want
    assert sql_spark.sql("SELECT count(*) AS n FROM geofences").collect()[0]["n"] > 0


def test_query_views_compose(sql_spark):
    from pulsar_spark_spark.plans import QUERIES

    from pulsar_spark_spark.sql import register_queries

    register_queries(sql_spark, SF_DIR_SMALL)
    direct = QUERIES["user_sessions"](sql_spark, SF_DIR_SMALL).count()
    via_sql = sql_spark.sql("SELECT count(*) AS n FROM user_sessions").collect()[0]["n"]
    assert direct == via_sql
    # compose: ad-hoc SQL over an engine query view
    top = sql_spark.sql(
        "SELECT user_id, count(*) AS n_sessions FROM user_sessions "
        "GROUP BY user_id ORDER BY n_sessions DESC, user_id LIMIT 5"
    ).collect()
    assert len(top) == 5 and all(r["n_sessions"] >= 1 for r in top)


# ---------------------------------------------------------------------
# version-drift guards (round 7): the derivation rides a private API;
# any change must fail LOUDLY at registration, never silently
# ---------------------------------------------------------------------
def test_connect_session_rejected_with_clear_error():
    from pulsar_spark_spark import sql as psql

    class FakeConnectSession:  # no _jsparkSession attribute
        pass

    with pytest.raises(RuntimeError, match="CLASSIC SparkSession"):
        psql._require_classic(FakeConnectSession())


def test_rendering_change_fails_loudly_not_silently(spark, monkeypatch):
    """Simulate a Catalyst rendering change: lambdas left in the
    unparseable lambdafunction(...) form. register_functions must
    raise the versioned RuntimeError (from the CREATE parse failure),
    not register a broken surface."""
    from pulsar_spark_spark import sql as psql

    monkeypatch.setattr(psql, "_rewrite_lambdas", lambda s: s)
    with pytest.raises(RuntimeError, match="derivation failed on pyspark"):
        psql.register_functions(spark)
    # restore a working surface for later tests in the session
    monkeypatch.undo()
    assert "cos_sim" in psql.register_functions(spark)


def test_private_api_loss_fails_loudly(spark, monkeypatch):
    from pulsar_spark_spark import sql as psql

    def broken(spark_, col_):
        raise AttributeError("'SparkSession' object has no attribute 'expression'")

    monkeypatch.setattr(psql, "_expr_sql", broken)
    with pytest.raises(RuntimeError, match="derivation failed on pyspark"):
        psql.register_functions(spark)


def test_semantic_drift_probe_catches_wrong_values(spark, monkeypatch):
    """A rendering change that still parses AND type-checks but alters
    semantics must trip the known-value probes."""
    from pulsar_spark_spark import sql as psql

    real_surface = psql.function_surface

    def tampered_surface(spark_):
        rows = real_surface(spark_)
        for r in rows:
            if r["name"] == "clean_text":
                # type-valid (STRING->STRING), registers fine, wrong values
                r["body"] = f"upper({r['body']})"
        return rows

    monkeypatch.setattr(psql, "function_surface", tampered_surface)
    with pytest.raises(RuntimeError, match="probe"):
        psql.register_functions(spark)
    monkeypatch.undo()
    psql.register_functions(spark)  # leave the session surface healthy


def test_register_queries_reraises_real_plan_bugs(spark, monkeypatch, tmp_path):
    """Only missing-input AnalysisExceptions are skipped; a genuine
    plan bug (unresolved column) must propagate."""
    from pulsar_spark_spark import sql as psql
    from pulsar_spark_spark.plans import QUERIES

    def broken_query(spark_, sf_dir_):
        from pulsar_spark_spark.sources.tables import load_table

        return load_table(spark_, "events", sf_dir_).select("no_such_column")

    monkeypatch.setitem(QUERIES, "zz_broken_probe", broken_query)
    with pytest.raises(Exception, match="no_such_column|UNRESOLVED"):
        psql.register_queries(spark, SF_DIR_SMALL)
    monkeypatch.undo()
    # and a missing-source dir still skips quietly (partial fixtures)
    names = psql.register_queries(spark, str(tmp_path))
    assert names == []
