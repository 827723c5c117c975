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
- ``documents`` with ``--open-vocab`` (round 11, the containment-
  family measurement fix): the word-shuffle mode keeps the base
  corpus's ~31-word vocabulary, so at 100x/1000x EVERY word 3-gram is
  hot, the df cap (correctly) wipes them all, and the winnow/ngram
  slope rows timed map+join machinery over a near-empty candidate
  set. Open-vocab generates a FRESH corpus whose vocabulary grows
  with the data (Zipf-Mandelbrot rank-frequency over
  V ≈ total_tokens/100 words, the head playing the role of
  boilerplate/stop grams, the tail keeping typical gram df ~1) and
  PLANTS ground-truth work at fixed per-doc rates (2% near-duplicates
  at 5% token substitution, 1% half-containments), so candidate join
  volume is live and grows linearly at every decade. Use it for every
  scale dir the containment family is measured on.
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


def scale_documents_openvocab(factor: int, out_dir: str) -> int:
    """Open-vocabulary documents corpus (see module docstring).

    Deterministic (fixed seed per chunk), streamed chunk-at-a-time to
    the writer so the 1000x point (~5M docs, ~2.7e8 tokens) never
    holds the table in memory. Length distribution mirrors the base
    corpus (uniform-ish 10..100 tokens, mean ~54); lang/source cycle
    through the base rows so the metadata-driven queries keep their
    value mix.
    """
    base = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n_base = base.num_rows
    langs = base["lang"].to_pylist()
    sources = base["source"].to_pylist()
    n_docs = n_base * factor
    total_tokens_est = n_docs * 55
    # Heaps-style vocabulary: grows with the corpus so mean token df
    # stays ~100 at every decade; clipped so the sf1 point still has
    # a real tail and the sf100 point's word table stays in memory.
    V = int(min(max(total_tokens_est // 100, 100_000), 8_000_000))
    # Zipf-Mandelbrot 1/(r+q)^s: s near 1 gives the natural-language
    # shape — a hot head (the df cap's job) over a long flat tail
    # (typical gram df ~1, the identity-carrying signal).
    ranks = np.arange(1, V + 1, dtype=np.float64)
    w = 1.0 / np.power(ranks + 2.7, 1.05)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    # token id -> 7-letter [a-z] word (clean_text-proof: the engine's
    # tokenizer strips [^a-z ], so words must be pure lowercase alpha)
    chars = []
    x = np.arange(V, dtype=np.int64)
    for _ in range(7):
        chars.append((x % 26 + 97).astype(np.uint8))
        x //= 26
    vocab = (
        np.stack(chars[::-1], axis=1).reshape(V * 7).view("S7").copy()
    )

    schema = base.schema
    chunk_docs = 50_000
    total = 0
    with pq.ParquetWriter(
        os.path.join(out_dir, "documents.parquet"), schema
    ) as writer:
        for c0 in range(0, n_docs, chunk_docs):
            c1 = min(c0 + chunk_docs, n_docs)
            n = c1 - c0
            rng = np.random.default_rng(97_711 + c0)
            lens = rng.integers(10, 101, size=n)
            tot = int(lens.sum())
            ids = np.searchsorted(cdf, rng.random(tot)).astype(np.int64)
            toks = vocab[ids]
            off = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=off[1:])
            texts: list = [None] * n
            for i in range(n):
                texts[i] = b" ".join(toks[off[i] : off[i + 1]]).decode()
            # planted ground truth, fixed per-doc rates so pair counts
            # scale linearly with the corpus:
            # - every 50th doc: near-duplicate of its predecessor
            #   (5% token substitution -> word-3-gram survival
            #   0.95^3 ≈ 0.857, fingerprint Jaccard ≈ 0.75 > the 0.5
            #   gate; char-shingle Jaccard higher still)
            # - every 100th doc (offset 25): contains the first ~60%
            #   of its predecessor verbatim plus fresh tail tokens
            #   (a shared run of ≥ 30 grams -> winnowed shared
            #   fingerprints well past min_shared=5)
            for i in range(1, n):
                gid = c0 + i
                if gid % 50 == 0:
                    src_toks = texts[i - 1].split()
                    m = len(src_toks)
                    n_sub = max(1, m // 20)
                    pos = rng.choice(m, size=n_sub, replace=False)
                    sub_ids = np.searchsorted(
                        cdf, rng.random(n_sub)
                    ).astype(np.int64)
                    for p, s in zip(pos, sub_ids):
                        src_toks[p] = vocab[s].decode()
                    texts[i] = " ".join(src_toks)
                elif gid % 100 == 25:
                    src_toks = texts[i - 1].split()
                    keep = max(6, (len(src_toks) * 3) // 5)
                    fresh_n = max(4, len(src_toks) - keep)
                    fresh = np.searchsorted(
                        cdf, rng.random(fresh_n)
                    ).astype(np.int64)
                    texts[i] = " ".join(
                        src_toks[:keep] + [vocab[f].decode() for f in fresh]
                    )
            arrs = [
                pa.array(
                    np.arange(c0, c1, dtype=np.int64),
                    type=schema.field("doc_id").type,
                ),
                pa.array(texts, type=schema.field("text").type),
                pa.array(
                    [langs[i % n_base] for i in range(c0, c1)],
                    type=schema.field("lang").type,
                ),
                pa.array(
                    [sources[i % n_base] for i in range(c0, c1)],
                    type=schema.field("source").type,
                ),
                pa.array(
                    [len(t) for t in texts],
                    type=schema.field("n_chars").type,
                ),
            ]
            writer.write_table(
                pa.Table.from_arrays(arrs, schema=schema),
                row_group_size=20_000,
            )
            total += n
    return total


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
    # fourth decade into an existing corpus-only dir (round 10);
    # --docs-only: regenerate just documents in an existing dir;
    # --open-vocab: the round-11 open-vocabulary documents mode (see
    # module docstring) — required for honest containment-family
    # slope measurement
    corpus_only = "--corpus-only" in sys.argv
    events_only = "--events-only" in sys.argv
    docs_only = "--docs-only" in sys.argv
    open_vocab = "--open-vocab" in sys.argv
    os.makedirs(out_dir, exist_ok=True)
    for name in SMALL_TABLES:
        if not os.path.exists(os.path.join(out_dir, f"{name}.parquet")):
            shutil.copy(
                os.path.join(SRC, f"{name}.parquet"),
                os.path.join(out_dir, f"{name}.parquet"),
            )
    gen_docs = scale_documents_openvocab if open_vocab else scale_documents
    if docs_only:
        print(f"documents:  {gen_docs(factor, out_dir):>9,} rows")
    else:
        if not corpus_only:
            print(f"events:     {scale_events(factor, out_dir):>9,} rows")
        if not events_only:
            print(f"documents:  {gen_docs(factor, out_dir):>9,} rows")
            print(f"embeddings: {scale_embeddings(factor, out_dir):>9,} rows")
    total = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    )
    print(f"wrote {out_dir} ({total / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()
