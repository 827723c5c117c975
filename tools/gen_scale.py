"""Generate a 10x sf1-equivalent dataset for scale-slope measurement.

The driver's testdata stops at sf0.1 (~17 MB); the 100 TB design
claims in PLANS.md are plan-shape arguments. This tool materializes a
~10x dataset under ``.scale/sf1/`` so ``tools/scale_slope.py`` can
convert those arguments into measured wall-time ratios.

Scaling model (matches how a real corpus grows — MORE entities, not
fatter ones):

- ``events`` x10: replica k offsets ``event_id += k * N_EVENTS`` and
  ``user_id += k * N_USERS``. Users x10, per-user event density
  constant, time range unchanged (a bigger fleet on the same day).
  The deterministic lat/lng derivation in ``plans/geo.py`` hashes the
  offset ids, so every new user gets its own home cluster.
- ``documents`` x10: replica k offsets ``doc_id += k * N_DOCS`` and
  word-shuffles ``text`` with a per-(doc_id, k) seeded RNG. Token /
  length / language statistics are preserved exactly, but char
  shingles, word 3-grams, and winnow grams are scrambled — replicas do
  NOT become artificial near-duplicates, so dedup pair counts grow
  with the data, not quadratically with the replication factor.
- ``embeddings`` x10: replica k offsets ``vec_id += k * N_VECS`` and
  rotates the vector components by ``7 * k`` positions — an isometry,
  so norms and intra-replica cosine structure are exact while
  cross-replica similarity is scrambled. The fixed ANN query set
  (``vec_id < 5``) stays in replica 0; the corpus it searches is x10.

The TPC-H tables are copied unchanged (the heavy queries are all
events/documents/embeddings-bound; relational q1-q5 already have the
sf ladder in the driver's own testdata).

Usage:  python tools/gen_scale.py [factor] [out_dir]
        (defaults: 10, /root/repo/.scale/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SMALL_TABLES = (
    "region nation customer supplier part orders lineitem"
).split()


def scale_events(factor: int, out_dir: str) -> int:
    # streamed one replica at a time (round 10): the 1000× events
    # point is 100M rows — an in-memory concat of 1000 replicas would
    # hold the whole table before writing; the writer keeps peak
    # memory at one replica
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    n_events = int(pa.compute.max(t["event_id"]).as_py()) + 1
    n_users = int(pa.compute.max(t["user_id"]).as_py()) + 1
    total = 0
    with pq.ParquetWriter(
        os.path.join(out_dir, "events.parquet"), t.schema
    ) as writer:
        for k in range(factor):
            part = t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pa.compute.add(t["event_id"], k * n_events),
            ).set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pa.compute.add(t["user_id"], k * n_users),
            )
            writer.write_table(part, row_group_size=200_000)
            total += part.num_rows
    return total


def scale_documents(factor: int, out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n_docs = int(pa.compute.max(t["doc_id"]).as_py()) + 1
    texts = t["text"].to_pylist()
    parts = [t]
    for k in range(1, factor):
        shuffled = []
        for i, txt in enumerate(texts):
            words = txt.split()
            rng = np.random.default_rng(1_000_003 * k + i)
            rng.shuffle(words)
            shuffled.append(" ".join(words))
        parts.append(
            t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pa.compute.add(t["doc_id"], k * n_docs),
            ).set_column(
                t.schema.get_field_index("text"),
                "text",
                pa.array(shuffled, type=t.schema.field("text").type),
            )
        )
    out = pa.concat_tables(parts)
    # Real 100 TB corpora arrive as thousands of files/row groups;
    # a single-row-group file makes EVERY scan of it a one-task stage
    # no matter how many splits Spark plans (profiled round 8: the
    # near-dup collapse ran its md5+regex map side on 1 of 32 cores).
    # 20k-row groups give the scan genuine parallelism at 100×.
    pq.write_table(
        out, os.path.join(out_dir, "documents.parquet"), row_group_size=20_000
    )
    return out.num_rows


def scale_embeddings(factor: int, out_dir: str) -> int:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n_vecs = int(pa.compute.max(t["vec_id"]).as_py()) + 1
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    elem_type = t.schema.field("embedding").type.value_type
    parts = [t]
    for k in range(1, factor):
        rolled = np.roll(mat, 7 * k, axis=1)
        parts.append(
            t.set_column(
                t.schema.get_field_index("vec_id"),
                "vec_id",
                pa.compute.add(t["vec_id"], k * n_vecs),
            ).set_column(
                t.schema.get_field_index("embedding"),
                "embedding",
                pa.array(list(rolled), type=pa.list_(elem_type)),
            )
        )
    out = pa.concat_tables(parts)
    # Same row-group rationale as scale_documents.
    pq.write_table(
        out, os.path.join(out_dir, "embeddings.parquet"), row_group_size=20_000
    )
    return out.num_rows


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    )
    # --corpus-only: documents + embeddings only (the dedup/ANN
    # family's 1000× point doesn't need 100M event rows on disk);
    # --events-only: the converse, for extending the kernel family's
    # fourth decade into an existing corpus-only dir (round 10)
    corpus_only = "--corpus-only" in sys.argv
    events_only = "--events-only" in sys.argv
    os.makedirs(out_dir, exist_ok=True)
    for name in SMALL_TABLES:
        if not os.path.exists(os.path.join(out_dir, f"{name}.parquet")):
            shutil.copy(
                os.path.join(SRC, f"{name}.parquet"),
                os.path.join(out_dir, f"{name}.parquet"),
            )
    if not corpus_only:
        print(f"events:     {scale_events(factor, out_dir):>9,} rows")
    if not events_only:
        print(f"documents:  {scale_documents(factor, out_dir):>9,} rows")
        print(f"embeddings: {scale_embeddings(factor, out_dir):>9,} rows")
    total = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    )
    print(f"wrote {out_dir} ({total / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()
