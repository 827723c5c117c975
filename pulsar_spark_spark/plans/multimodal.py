"""Multimodal columns: opaque binary payloads + typed metadata.

The brief's multimodal component: image/audio/video payloads ride as
``binary`` columns with a typed metadata struct; decode / feature
extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The real media codecs are NOT in this
container, so the decode step is a deterministic byte-level fake (and
``decode_image_real`` raises NotImplementedError behind an import-try
of PIL) — but everything Spark-side is real and tested: the binary
schema, the metadata struct, the mapInPandas batch shape, the
row-expanding frame sampler, and the partitioning story.

The payloads are synthesized deterministically from ``documents``
(md5-chained bytes, same scheme as every other oracle-checked
projection), so the metadata query has a bit-exact DuckDB oracle and
the feature kernels have exact pytest expectations.

Reference lineage: the reference's only binary handling is the
signature BLOB (core/SignaturePayload.scala:22-24 — base64 → blob,
F11) and the per-row PNG dump (batch/ImageDump.scala:17-49, K4); this
module generalizes that surface to the training-data shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from pulsar_spark_spark.operators.shipping import ensure_package_on_executors
from pulsar_spark_spark.plans.registry import query
from pulsar_spark_spark.plans.kernels import _sorted_out
from pulsar_spark_spark.sources.tables import load_table, spread_scan

_TYPES = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media rows: (media_id, media_type, payload BINARY,
    payload_b64 STRING, meta STRUCT<width,height,n_frames,sample_rate>).

    The payload is 64 deterministic bytes (4 chained md5 digests of the
    doc text) — an opaque blob as far as the engine is concerned. The
    base64 column exists to exercise F11 (unbase64 → blob, the
    signature-payload path). The scan is spread first (round 15): the
    9-md5 payload/meta derivation otherwise runs on the single-file
    fixture scan's one partition (no-op on real corpora).
    """
    d = spread_scan(load_table(spark, "documents", sf_dir))
    hexes = F.concat(
        F.md5(col("text")),
        F.md5(F.concat(col("text"), F.lit(":1"))),
        F.md5(F.concat(col("text"), F.lit(":2"))),
        F.md5(F.concat(col("text"), F.lit(":3"))),
    )
    tsel = F.conv(F.substring(F.md5(F.concat(col("text"), F.lit(":t"))), 1, 4), 16, 10).cast(
        "bigint"
    )
    payload = F.unhex(hexes)
    meta = F.struct(
        (16 + F.conv(F.substring(F.md5(F.concat(col("text"), F.lit(":w"))), 1, 4), 16, 10)
         .cast("int") % 240).alias("width"),
        (16 + F.conv(F.substring(F.md5(F.concat(col("text"), F.lit(":h"))), 1, 4), 16, 10)
         .cast("int") % 240).alias("height"),
        (1 + F.conv(F.substring(F.md5(F.concat(col("text"), F.lit(":f"))), 1, 4), 16, 10)
         .cast("int") % 32).alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return d.select(
        col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(t) for t in _TYPES]), (tsel % 3 + 1).cast("int"))
        .alias("media_type"),
        payload.alias("payload"),
        F.base64(payload).alias("payload_b64"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------
# metadata/byte-level stats — oracle-checked (pure expressions)
# ---------------------------------------------------------------------
@query(
    "media_metadata_stats",
    oracle="""
        SELECT media_type,
               count(*)                                   AS n_media,
               CAST(sum(n_bytes) AS BIGINT)               AS total_bytes,
               CAST(sum(CASE WHEN b64_roundtrip THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_b64_ok,
               CAST(max(width * height) AS BIGINT)        AS max_pixels
        FROM (
            SELECT
                ['image','audio','video'][
                    CAST(('0x' || substr(md5(text || ':t'), 1, 4))::BIGINT % 3 AS INTEGER)
                    + 1] AS media_type,
                octet_length(unhex(md5(text) || md5(text || ':1')
                             || md5(text || ':2') || md5(text || ':3'))) AS n_bytes,
                unhex(md5(text)) = from_base64(to_base64(unhex(md5(text))))
                    AS b64_roundtrip,
                16 + CAST(('0x' || substr(md5(text || ':w'), 1, 4))::BIGINT AS INTEGER) % 240
                    AS width,
                16 + CAST(('0x' || substr(md5(text || ':h'), 1, 4))::BIGINT AS INTEGER) % 240
                    AS height
            FROM documents
        )
        GROUP BY media_type
        ORDER BY media_type
    """,
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-length / metadata audit over the binary column, plus an F11
    base64 → blob round-trip check — all JVM-side expressions, so the
    blob never crosses into Python for this query.
    """
    m = media_table(spark, sf_dir)
    m = m.withColumn("n_bytes", F.octet_length("payload")).withColumn(
        "b64_ok",
        F.unbase64(col("payload_b64")) == col("payload"),
    )
    return (
        m.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.when(col("b64_ok"), 1).otherwise(0)).alias("n_b64_ok"),
            F.max(col("meta.width").cast("bigint") * col("meta.height")).alias(
                "max_pixels"
            ),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------
# decode / feature extraction — Arrow-batched mapInPandas
# ---------------------------------------------------------------------
def fake_decode_features(payload: bytes) -> tuple[float, float, list[float]]:
    """Deterministic byte-level stand-in for a real media decode:
    mean byte value, byte stddev, and a 4-bin byte histogram (as
    fractions). Swap for a real decoder where codecs exist."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    hist = np.histogram(a, bins=4, range=(0, 256))[0] / len(a)
    return float(a.mean()), float(a.std()), [float(x) for x in hist]


def decode_image_real(payload: bytes):  # pragma: no cover - env-gated
    """Real image decode — unavailable in this container (no PIL/cv2).

    The Spark plumbing (schema, batching, partitioning) is identical
    for the real path; only this function body changes.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "use fake_decode_features for the byte-level pipeline"
        ) from e
    raise NotImplementedError("wire PIL decode here when codecs exist")


def _feature_cols(pdf: pd.DataFrame) -> dict:
    """Per-batch byte-stats columns — the ONE copy of the feature
    contract, consumed by :func:`extract_features` and the fused
    :func:`extract_features_resize` (it existed verbatim in both
    bodies before round 14; a payload-contract change must now land
    in exactly one place or the fused registered query and the
    standalone operator diverge)."""
    feats = [fake_decode_features(p) for p in pdf["payload"]]
    return {
        "n_bytes": [len(p) for p in pdf["payload"]],
        "byte_mean": [f[0] for f in feats],
        "byte_std": [f[1] for f in feats],
        "hist4": [f[2] for f in feats],
    }


def _pooled_cols(pdf: pd.DataFrame) -> dict:
    """Per-batch 8×8 → 4×4 mean-pool columns — the one copy of the
    pooling arithmetic, consumed by :func:`resize_pool2` and the
    fused :func:`extract_features_resize`. Exact in float64
    (integer sums / 4)."""
    mats = (
        np.stack([np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]])
        .astype(np.float64)
        .reshape(-1, 8, 8)
    )
    pooled = mats.reshape(-1, 4, 2, 4, 2).sum(axis=(2, 4)) / 4.0
    return {
        "r00": pooled[:, 0, 0],
        "r03": pooled[:, 0, 3],
        "r30": pooled[:, 3, 0],
        "r33": pooled[:, 3, 3],
        "pool_sum": pooled.sum(axis=(1, 2)),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Arrow moves each partition's blobs in batches; output is one row
    per media item with a fixed-length feature vector. At 100 TB this
    is a pure map stage — no shuffle, parallel per input split, and
    column pruning still drops the blob for queries that don't touch
    features.
    """
    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    **_feature_cols(pdf),
                }
            )

    schema = (
        "media_id bigint, media_type string, n_bytes int, "
        "byte_mean double, byte_std double, hist4 array<double>"
    )
    return media.mapInPandas(fn, schema)


def sample_frames(media: DataFrame) -> DataFrame:
    """Row-expanding frame sampler (video → one row per sampled frame).

    Emits ceil(n_frames/8) evenly-spaced frame indices per video with a
    64-byte pseudo-frame slice — the real decoder would emit decoded
    frame tensors; the EXPANSION shape (mapInPandas yielding more rows
    than it receives) is the part that matters for plan structure.
    """
    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized expansion: ceil(n/8) frames per row, built with
            # np.repeat + index arithmetic on the whole Arrow batch —
            # only the variable-length byte rotation touches objects.
            n = pdf["n_frames"].to_numpy(dtype=np.int64)
            counts = np.maximum(n, 0)
            counts = (counts + 7) // 8
            total = int(counts.sum())
            if total == 0:
                continue
            ends = np.cumsum(counts)
            starts = ends - counts
            frame_idx = (np.arange(total) - np.repeat(starts, counts)) * 8
            payloads = np.repeat(pdf["payload"].to_numpy(dtype=object), counts)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=total)
            shifts = frame_idx % np.maximum(lens, 1)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), counts),
                    "frame_idx": frame_idx,
                    "frame_bytes": [
                        p[s:] + p[:s] for p, s in zip(payloads, shifts)
                    ],
                }
            )

    schema = "media_id bigint, frame_idx int, frame_bytes binary"
    return media.mapInPandas(fn, schema)


def extract_features_resize(media: DataFrame) -> DataFrame:
    """Single-pass decode → byte features + 2×2 mean-pool resize.

    The registered ``media_feature_extract`` query fuses the feature
    and resize stages into ONE ``mapInPandas`` pass (both read the same
    decoded bytes, so fusing halves the Arrow transfer and Python
    dispatch). The standalone :func:`extract_features` /
    :func:`resize_pool2` operators remain for pipelines that need only
    one of the two.
    """
    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    **_feature_cols(pdf),
                    **_pooled_cols(pdf),
                }
            )

    schema = (
        "media_id bigint, media_type string, n_bytes int, "
        "byte_mean double, byte_std double, hist4 array<double>, "
        "r00 double, r03 double, r30 double, r33 double, pool_sum double"
    )
    return media.mapInPandas(fn, schema)


@query(
    "media_feature_extract",
    # The fake decode is byte arithmetic over 64 md5-derived bytes, and
    # every step is EXACT in float64 (integer sums need <=34 bits, the
    # mean's /64 is a power of two, squared deviations keep <=40
    # significand bits, pool cells are integer sums / 4), so numpy's
    # pairwise summation and DuckDB's sequential fold produce
    # bit-identical doubles and a full value oracle is honest — the
    # Python mapInPandas path is hash-checked, not just row-counted.
    # Round 5: absorbs the former media_resize query (registry
    # consolidated to fit the driver's 50-row correctness gate); the
    # pooled r00/r03/r30/r33/pool_sum columns are its output.
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id,
                   ['image','audio','video'][
                       CAST(('0x' || substr(md5(text || ':t'), 1, 4))::BIGINT % 3
                            AS INTEGER) + 1] AS media_type,
                   md5(text) || md5(text || ':1')
                       || md5(text || ':2') || md5(text || ':3') AS hexstr
            FROM documents
        ), b AS (
            SELECT media_id, media_type,
                   (k - 1) // 8 AS r, (k - 1) % 8 AS c,
                   ('0x' || substr(hexstr, 2 * k - 1, 2))::BIGINT AS byte
            FROM m, generate_series(1, 64) AS g(k)
        ), s AS (
            SELECT media_id,
                   any_value(media_type)            AS media_type,
                   CAST(64 AS INTEGER)              AS n_bytes,
                   CAST(sum(byte) AS DOUBLE) / 64   AS mean_b,
                   CAST(sum(CASE WHEN byte < 64 THEN 1 ELSE 0 END) AS DOUBLE)
                       / 64                         AS hist1
            FROM b GROUP BY media_id
        ), v AS (
            SELECT b.media_id,
                   sqrt(sum((b.byte - s.mean_b) * (b.byte - s.mean_b)) / 64)
                       AS std_b
            FROM b JOIN s USING (media_id)
            GROUP BY b.media_id
        ), pooled AS (
            SELECT media_id, r // 2 AS pr, c // 2 AS pc,
                   CAST(sum(byte) AS DOUBLE) / 4 AS v
            FROM b GROUP BY media_id, r // 2, c // 2
        ), pz AS (
            SELECT media_id,
                   sum(CASE WHEN pr = 0 AND pc = 0 THEN v END) AS r00,
                   sum(CASE WHEN pr = 0 AND pc = 3 THEN v END) AS r03,
                   sum(CASE WHEN pr = 3 AND pc = 0 THEN v END) AS r30,
                   sum(CASE WHEN pr = 3 AND pc = 3 THEN v END) AS r33,
                   sum(v) AS pool_sum
            FROM pooled GROUP BY media_id
        )
        SELECT s.media_id, s.media_type, s.n_bytes,
               round(s.mean_b, 6) AS byte_mean,
               round(v.std_b, 6)  AS byte_std,
               round(s.hist1, 6)  AS hist_bin1,
               pz.r00, pz.r03, pz.r30, pz.r33, pz.pool_sum
        FROM s JOIN v USING (media_id) JOIN pz USING (media_id)
        ORDER BY s.media_id
    """,
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → featurize → resize pipeline over binary media in one
    fused Arrow pass (byte stats + 2×2 mean-pool 8×8 → 4×4); the DuckDB
    oracle recomputes every column in SQL (exact float ops, see
    decorator) and exact values are additionally pinned in pytest."""
    m = media_table(spark, sf_dir)
    feats = extract_features_resize(m)
    out = feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_std", 6).alias("byte_std"),
        F.round(F.element_at("hist4", 1), 6).alias("hist_bin1"),
        "r00",
        "r03",
        "r30",
        "r33",
        "pool_sum",
    )
    return _sorted_out(out, "media_id")


@query(
    "media_frame_sample",
    # The expansion arithmetic (ceil(n_frames/8) frames at stride 8,
    # constant 64-byte payload length preserved by rotation) is pure
    # integer math, so the row-expanding mapInPandas stage gets a full
    # value oracle via unnest(generate_series).
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id,
                   CAST(('0x' || substr(md5(text || ':t'), 1, 4))::BIGINT % 3
                        AS INTEGER) AS t3,
                   1 + CAST(('0x' || substr(md5(text || ':f'), 1, 4))::BIGINT
                            AS INTEGER) % 32 AS n_frames
            FROM documents
        ), f AS (
            SELECT media_id,
                   unnest(generate_series(0, (n_frames + 7) // 8 - 1)) AS k
            FROM m WHERE t3 = 2
        )
        SELECT media_id,
               CAST(k * 8 AS INTEGER) AS frame_idx,
               CAST(64 AS INTEGER)    AS frame_len
        FROM f
        ORDER BY media_id, frame_idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline for video rows; the integer expansion
    arithmetic has a full DuckDB oracle and is pinned in pytest."""
    m = media_table(spark, sf_dir).filter(col("media_type") == "video")
    frames = sample_frames(
        m.select("media_id", "payload", col("meta.n_frames").alias("n_frames"))
    )
    out = frames.select(
        "media_id", "frame_idx", F.octet_length("frame_bytes").alias("frame_len")
    )
    return _sorted_out(out, "media_id", "frame_idx")


def resize_pool2(media: DataFrame) -> DataFrame:
    """mapInPandas 'resize': interpret each 64-byte payload as an 8×8
    single-channel image and 2×2 mean-pool it to 4×4 (the stand-in for
    a real resampling kernel; the batching/schema/partitioning story is
    identical with real codecs). Pure map stage — no shuffle; pooled
    values are exact in float64 (integer sums / 4)."""
    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], **_pooled_cols(pdf)}
            )

    schema = (
        "media_id bigint, r00 double, r03 double, r30 double, r33 double, "
        "pool_sum double"
    )
    return media.select("media_id", "payload").mapInPandas(fn, schema)


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone resize (2×2 mean-pool 8×8 → 4×4) over binary media
    payloads. No longer a registered query — the fused
    ``media_feature_extract`` carries the pooled columns under the
    driver's correctness gate (full value oracle there); this form
    stays for resize-only pipelines and is value-pinned in pytest."""
    m = media_table(spark, sf_dir)
    return _sorted_out(resize_pool2(m), "media_id")
