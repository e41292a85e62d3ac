"""Near-dup clustering: connected components + keep decisions."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.dedup import cluster_pairs, dedup_decisions


def test_cluster_pairs_chain(spark):
    # chain 1-2, 2-3 and isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_decisions(spark):
    docs = spark.range(1, 7).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "doc_a bigint, doc_b bigint")
    rows = {r["doc_id"]: (r["keep"], r["cluster_id"]) for r in dedup_decisions(docs, pairs).collect()}
    assert rows[1] == (True, 1)
    assert rows[2] == (True, 2)   # cluster head
    assert rows[4] == (False, 2)
    assert rows[5] == (False, 2)
    assert rows[3] == (True, 3) and rows[6] == (True, 6)
    assert sum(1 for k, (keep, _) in rows.items() if keep) == 4


def test_duplicated_spans_semantics(spark):
    from osm2pgsql_spark.operators.dedup import duplicated_spans, strip_duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} omega"),
            (3, "solo text with no overlap anywhere at all kept intact"),
            (4, "short doc"),  # shorter than k -> no grams
            # within-doc-only repetition: k-grams repeat inside doc 5 but
            # appear in no other doc -> not a cross-doc span
            (5, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in duplicated_spans(docs, k=8).collect()
    }
    # doc1: shared occupies tokens 3..12; duplicated 8-grams at
    # positions 3..5 -> span tokens 3..12.  doc2: positions 1..3 ->
    # tokens 1..10.
    assert spans == {(1, 3, 12, 10), (2, 1, 10, 10)}

    cleaned = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(docs, duplicated_spans(docs, k=8)).collect()
    }
    assert cleaned[1] == "alpha beta gamma delta"
    assert cleaned[2] == "omega"
    assert cleaned[3] == "solo text with no overlap anywhere at all kept intact"
    assert cleaned[5].startswith("x1")  # untouched


def test_duplicated_spans_merges_overlaps(spark):
    from osm2pgsql_spark.operators.dedup import duplicated_spans

    # two docs sharing one long run -> one maximal span each, not one
    # span per duplicated k-gram
    run = " ".join(f"t{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, f"a b {run}"), (2, f"{run} z")], "doc_id bigint, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, k=8).collect()
    )
    assert got == [(1, 3, 32), (2, 1, 30)]
