"""Unit tests for the scalar function library (F1-F5 coverage).

The reference tests its pure logic in isolation (PulsarLedgerTest
pattern); these pin the geo/text primitives: Vincenty semantics
(sentinel, zero, known geodesic distances), geohash round-trips and
published test vectors, haversine constants, and the n-gram/shingle
short-input guards.
"""

from __future__ import annotations

import numpy as np
import pytest

import pyspark.sql.functions as F

from pulsar_spark_spark.functions.geo import (
    NO_FIX_DISTANCE_M,
    geohash_decode_py,
    geohash_encode_py,
    haversine_m,
    haversine_py,
    vincenty_py,
)
from pulsar_spark_spark.functions.text import (
    char_shingles,
    char_shingles_of_clean,
    clean_text,
    md5_i64,
    simhash16,
    simhash16_from_hashes,
    tokens,
    word_ngrams,
)

BLR = (12.9716, 77.5946)
CHENNAI = (13.0827, 80.2707)


class TestVincenty:
    def test_zero_lat_sentinel(self):
        # reference BestLatLngCalculator.scala:17-18: lat==0 → 1e7
        assert vincenty_py(0.0, 77.0, 12.9, 77.6) == NO_FIX_DISTANCE_M
        assert vincenty_py(12.9, 77.6, 0.0, 77.0) == NO_FIX_DISTANCE_M

    def test_same_point_zero(self):
        assert vincenty_py(*BLR, *BLR) == 0.0

    def test_batch_scalar_bit_identical(self):
        """Kernels mix vincenty_np (pairwise matrices) and vincenty_py
        (sequential walks); threshold cuts (300 m / 200 m / 50 m) must
        never flip between them, so the paths must agree EXACTLY —
        the batch loop freezes each element at its own convergence
        point to guarantee it."""
        from pulsar_spark_spark.functions.geo import vincenty_np

        rng = np.random.default_rng(9)
        n = 400
        lat1 = rng.uniform(-80, 80, n)
        lng1 = rng.uniform(-179, 179, n)
        # mix: tight jitters (kernel regime), km-scale, and far pairs
        scale = np.repeat([1e-4, 1e-2, 5.0, 30.0], n // 4)
        lat2 = np.clip(lat1 + rng.uniform(-1, 1, n) * scale, -89.9, 89.9)
        lng2 = lng1 + rng.uniform(-1, 1, n) * scale
        batch = vincenty_np(lat1, lng1, lat2, lng2)
        for i in range(n):
            assert batch[i] == vincenty_py(lat1[i], lng1[i], lat2[i], lng2[i]), i

    def test_known_distance_blr_chennai(self):
        # WGS-84 geodesic BLR→Chennai ≈ 290.2 km (published geodesic
        # calculators agree within meters)
        d = vincenty_py(*BLR, *CHENNAI)
        assert d == pytest.approx(290_000, rel=0.01)

    def test_one_degree_latitude_at_equator_adjacent(self):
        # 1° of latitude ≈ 110.57 km near the equator on WGS-84
        d = vincenty_py(1.0, 0.0, 2.0, 0.0)
        assert d == pytest.approx(110_570, rel=0.005)

    def test_close_to_haversine_at_short_range(self):
        # ellipsoid vs sphere differ < 0.6% at city scale
        v = vincenty_py(12.9716, 77.5946, 12.9800, 77.6000)
        h = haversine_py(12.9716, 77.5946, 12.9800, 77.6000)
        assert v == pytest.approx(h, rel=0.006)


class TestHaversine:
    def test_known_value(self):
        # pure great-circle with R=6371 km (reference constant)
        d = haversine_py(*BLR, *CHENNAI)
        assert d == pytest.approx(290_200, rel=0.01)

    def test_expression_matches_python(self, spark):
        df = spark.createDataFrame(
            [(BLR[0], BLR[1], CHENNAI[0], CHENNAI[1])], "a double, b double, c double, d double"
        )
        got = df.select(
            haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
        ).collect()[0]["m"]
        assert got == pytest.approx(haversine_py(*BLR, *CHENNAI), abs=1e-6)


class TestGeohash:
    def test_published_vector(self):
        # canonical example from the public geohash spec
        assert geohash_encode_py(42.6, -5.6, 5) == "ezs42"
        lat, lng = geohash_decode_py("ezs42")
        assert lat == pytest.approx(42.6, abs=0.03)
        assert lng == pytest.approx(-5.6, abs=0.03)

    def test_roundtrip_precision7(self):
        # precision 7 cells are ≈153 m × 153 m → decode within ~0.002°
        for lat, lng in [BLR, CHENNAI, (-33.8688, 151.2093), (51.5074, -0.1278)]:
            gh = geohash_encode_py(lat, lng, 7)
            assert len(gh) == 7
            dlat, dlng = geohash_decode_py(gh)
            assert dlat == pytest.approx(lat, abs=0.002)
            assert dlng == pytest.approx(lng, abs=0.002)

    def test_prefix_property(self):
        # a longer geohash refines (shares the prefix of) a shorter one
        full = geohash_encode_py(*BLR, 12)
        for p in (4, 7, 9):
            assert geohash_encode_py(*BLR, p) == full[:p]

    def test_expression_port_matches_py(self, spark):
        """The quantize/interleave expression port (the JVM hot path of
        geohash_bucket_rollup) must agree with the bit-subdivision
        encoder on arbitrary coordinates and precisions."""
        import random

        import pandas as pd

        from pulsar_spark_spark.functions.geo import (
            geohash_from_xy,
            geohash_quantize,
        )

        random.seed(5)
        pts = [(random.uniform(-90, 90), random.uniform(-180, 180))
               for _ in range(200)]
        pts += [(42.6, -5.6), (0.0, 0.0), (-33.865, 151.21), (12.9716, 77.5946)]
        df = spark.createDataFrame(pd.DataFrame(pts, columns=["lat", "lng"]))
        for precision in (5, 7, 9):
            x, y = geohash_quantize(F.col("lat"), F.col("lng"), precision)
            staged = df.select("lat", "lng", x.alias("x"), y.alias("y"))
            rows = staged.select(
                "lat", "lng",
                geohash_from_xy(F.col("x"), F.col("y"), precision).alias("gh"),
            ).collect()
            for r in rows:
                assert r["gh"] == geohash_encode_py(r["lat"], r["lng"], precision)


class TestTextPrimitives:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [("the quick brown fox",), ("ab",), ("",), ("x y",)], "text string"
        )

    def test_tokens_and_short_input_guards(self, spark, df):
        rows = df.select(
            tokens(F.col("text")).alias("tok"),
            word_ngrams(tokens(F.col("text")), 3).alias("g3"),
            char_shingles(F.col("text"), 5).alias("sh"),
        ).collect()
        by_input = {tuple(r["tok"]): r for r in rows}
        r = by_input[("the", "quick", "brown", "fox")]
        assert r["g3"] == ["the quick brown", "quick brown fox"]
        assert len(r["sh"]) == len("the quick brown fox") - 4
        # short inputs: no junk from Spark's descending sequence()
        assert by_input[("ab",)]["g3"] == []
        assert by_input[("ab",)]["sh"] == []
        assert by_input[()]["g3"] == []
        assert by_input[("x", "y")]["g3"] == []

    def test_hoisted_variants_match_convenience_forms(self, spark):
        # the hot-path forms (pre-cleaned / pre-hashed input, which
        # dodge the per-element lambda re-evaluation trap) must stay
        # value-identical to the inline convenience forms
        df = spark.createDataFrame(
            [("The QUICK, brown fox!! 123",), ("ab",), ("",), ("Hello   World",)],
            "text string",
        )
        rows = df.select(
            char_shingles(F.col("text"), 5).alias("a"),
            char_shingles_of_clean(clean_text(F.col("text")), 5).alias("b"),
            simhash16(tokens(F.col("text"))).alias("sa"),
            simhash16_from_hashes(
                F.transform(tokens(F.col("text")), md5_i64)
            ).alias("sb"),
        ).collect()
        for r in rows:
            assert r["a"] == r["b"]
            assert r["sa"] == r["sb"]


def test_distance_and_geohash_null_semantics(spark):
    """Round 14 review fix: NULL/NaN coordinates must come back NULL
    from both registered distance functions and the geohash encoder.
    vincenty_np's isnan->0 degenerate-geometry guard used to launder
    a NULL coordinate into '0 meters away' (matching every proximity
    predicate), and the geohash UDF's `is not None` guard never fired
    (Spark NULL doubles arrive as NaN), encoding NULLs to the
    south-pole cell '0000000'."""
    import math

    import numpy as np

    from pulsar_spark_spark.functions.geo import vincenty_np
    from pulsar_spark_spark.sql import register_functions

    register_functions(spark)
    row = spark.sql(
        "SELECT vincenty_m(CAST(NULL AS DOUBLE), 77.6, 12.9, 77.6) AS v, "
        "       hav_m(CAST(NULL AS DOUBLE), 77.6, 12.9, 77.6) AS h, "
        "       geohash_enc(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 7) AS g, "
        "       vincenty_m(12.91, 77.61, 12.9, 77.6) AS ok"
    ).first()
    assert row["v"] is None and row["h"] is None and row["g"] is None
    assert row["ok"] is not None and row["ok"] > 0
    # the numpy kernel propagates NaN like the scalar path (parity)
    out = vincenty_np(
        np.array([float("nan"), 12.91]),
        np.array([77.6, 77.61]),
        np.array([12.9, 12.9]),
        np.array([77.6, 77.6]),
    )
    assert math.isnan(out[0]) and out[1] > 0


def test_minhash_and_band_sql_fragment_forms_match_column_forms(spark):
    """Round 15: the hot near-dup path builds the MinHash signature and
    LSH band expressions from SQL fragments (one JVM parse) instead of
    per-permutation py4j Column construction (profiled 0.44 s of
    driver time per plan build at 16 hashes). Both forms must produce
    byte-identical values — including the empty-input NULL guard."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import col

    from pulsar_spark_spark.functions.text import (
        char_shingles,
        lsh_bands,
        minhash_signature_from_hashes,
        shingle_hashes,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "lorem ipsum dolor sit amet consectetur"),
         (3, ""),  # empty text -> empty hv -> NULL signature entries
         (4, "zz")],
        "doc_id long, text string",
    ).select(
        "doc_id", shingle_hashes(char_shingles(col("text"), 5)).alias("hv")
    )
    sig = df.select(
        "doc_id",
        minhash_signature_from_hashes("hv", 16).alias("s_sql"),
        minhash_signature_from_hashes(col("hv"), 16).alias("s_col"),
    )
    rows = sig.collect()
    assert rows and all(r["s_sql"] == r["s_col"] for r in rows)
    bands = sig.select(
        lsh_bands("s_sql", 4, 4).alias("b_sql"),
        lsh_bands(col("s_col"), 4, 4).alias("b_col"),
    ).collect()
    assert all(r["b_sql"] == r["b_col"] for r in bands)
