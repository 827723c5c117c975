"""Text-pipeline scale-behavior tests.

The oracle-parity suite proves the text queries' VALUES; these tests
pin the scale properties — specifically that the winnowing hot-gram
document-frequency cap bounds candidate generation when a stock
phrase is shared across a large fraction of the corpus (the quadratic
hot-bucket risk at 100 TB).
"""

from __future__ import annotations

import pandas as pd

from pulsar_spark_spark.plans.text import winnow_pairs

STOP = "thanks for your order have a wonderful day and please come again"


def _stop_phrase_corpus(spark):
    rows = []
    # 30 docs whose ONLY overlap is the ubiquitous stop phrase
    for i in range(30):
        rows.append(
            (i, f"{STOP} unique{i}a filler{i}b content{i}c words{i}d here{i}e")
        )
    # one genuine overlapping pair: 8 shared tokens → 6 shared 3-grams
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows.append((100, f"{shared} xxa xxb xxc"))
    rows.append((101, f"{shared} yya yyb yyc"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_hot_gram_cap_bounds_candidates(spark):
    docs = _stop_phrase_corpus(spark)
    # stop-phrase grams have df=30 > cap=10 → pruned from both join
    # sides; the genuine pair's grams (df=2) survive
    out = winnow_pairs(docs, min_shared=2, max_gram_df=10).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(100, 101)}
    assert out[0]["n_shared"] == 6


def test_without_cap_stop_phrase_goes_quadratic(spark):
    docs = _stop_phrase_corpus(spark)
    # uncapped, every stop-doc pair is a candidate: 30×29/2 pairs from
    # the phrase alone — the blow-up the cap exists to prevent
    out = winnow_pairs(docs, min_shared=2, max_gram_df=10_000).collect()
    assert len(out) == 30 * 29 // 2 + 1


def test_dedup_corpus_keeps_canonical_per_cluster(spark):
    """dedup_corpus must drop exactly the non-canonical members of
    every near-dup cluster and pass untouched docs through."""
    from pulsar_spark_spark.plans import QUERIES
    from pulsar_spark_spark.plans.text import dedup_corpus
    from pulsar_spark_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    clusters = QUERIES["doc_dedup_clusters"](spark, SF_DIR).collect()
    expect_dropped = set()
    for r in clusters:
        ids = sorted(int(x) for x in r["doc_ids"].split(","))
        assert r["cluster_id"] == ids[0]  # canonical = min id
        expect_dropped.update(ids[1:])
    kept = {r["doc_id"] for r in dedup_corpus(docs).select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - expect_dropped
    assert expect_dropped and expect_dropped.isdisjoint(kept)
