"""Text cleaning/filtering operators (training-data extensions):
URL/email counting, redaction, Gopher-style quality verdict."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import text as TX


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "visit https://example.com/x?q=1 or mail me at a.b@test.org now"),
        (2, "the quick brown fox jumps over the lazy dog in a field of rye"),
        (3, "xxxx"),
        (4, "1234 5678 !!!! ####"),
        (5, "the " + "word " * 40 + "of it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_url_email_redact(spark, docs):
    out = docs.select(
        "doc_id",
        "text",
        TX.url_count(F.col("text")).alias("u"),
        TX.email_count(F.col("text")).alias("e"),
        TX.redact(F.col("text")).alias("red"),
    ).collect()
    r = {x["doc_id"]: x for x in out}
    assert r[1]["u"] == 1 and r[1]["e"] == 1
    assert "<url>" in r[1]["red"] and "<email>" in r[1]["red"]
    assert "example.com" not in r[1]["red"] and "test.org" not in r[1]["red"]
    # redact is the identity on text without URLs/emails
    assert r[2]["u"] == 0 and r[2]["e"] == 0 and r[2]["red"] == r[2]["text"]


def test_is_quality(spark, docs):
    out = {
        x["doc_id"]: x["q"]
        for x in docs.select(
            "doc_id", TX.is_quality(F.col("text")).alias("q")
        ).collect()
    }
    assert out[2] is True        # normal english sentence
    assert out[3] is False       # too short
    assert out[4] is False       # no stopwords, low alpha
    assert out[5] is True        # long but within band


def test_training_data_pipeline_stream_ingest(spark, tmp_path):
    """The streaming front door: shard replay through dedup_stream
    drops cross-batch duplicates; the deduped count matches the batch
    fingerprint-distinct count."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from examples.training_data_pipeline import ingest_stream
    from osm2pgsql_spark.functions.text import fingerprint
    from osm2pgsql_spark.sources.testdata import load_table

    n = ingest_stream(spark, "/root/testdata/sf0.001", str(tmp_path / "ing"))
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    expected = docs.select(fingerprint(F.col("text")).alias("k")).distinct().count()
    assert n == expected > 0


def test_generic_import_waterway_generalization(spark):
    """examples/generic_import.py waterway stage: a 30-segment river
    (long enough to cross propagate_width's escalation threshold into
    the chained path) feeding a wide tributary; the merged chains
    carry the propagated max width."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.generic_import import waterway_generalization
    from osm2pgsql_spark.model import NODE_SCHEMA, WAY_SCHEMA

    nodes = [(i, 50.0, float(i), {}, None, None, None, None, None, None) for i in range(31)]
    nodes.append((100, 51.0, 15.0, {}, None, None, None, None, None, None))
    ways = [
        # main stem: 30 unit segments west->east, width 2
        (1, list(range(31)), {"waterway": "river", "name": "main", "width": "2"},
         None, None, None, None, None, None),
        # wide tributary joining at node 15
        (2, [100, 15], {"waterway": "stream", "name": "trib", "width": "9"},
         None, None, None, None, None, None),
    ]
    out = waterway_generalization(
        spark,
        spark.createDataFrame(nodes, NODE_SCHEMA),
        spark.createDataFrame(ways, WAY_SCHEMA),
    )
    rows = out.collect()
    # the junction at node 15 splits the stem into two chains + trib
    assert sum(r["n_segments"] for r in rows) == 31
    mains = sorted(r["width"] for r in rows if r["name"] == "main")
    # downstream half carries the tributary's width 9, upstream keeps 2
    assert mains == [2.0, 9.0]
    assert [r["width"] for r in rows if r["name"] == "trib"] == [9.0]


@pytest.mark.slow
def test_training_data_pipeline_example(spark, tmp_path):
    """The end-to-end curation example runs and each stage only ever
    narrows the kept set."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.training_data_pipeline import curate

    counts = curate(spark, "/root/testdata/sf0.001", str(tmp_path / "out"))
    assert counts["input"] == 500
    seq = [
        counts["input"], counts["after_quality_filter"],
        counts["after_perplexity_filter"], counts["after_span_strip"],
        counts["after_exact_dedup"], counts["after_near_dedup"],
        counts["after_embedding_dedup"], counts["after_semdedup"],
        counts["after_decontamination"], counts["after_dsir_selection"],
        counts["after_token_budget"], counts["after_unimax"],
    ]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    # perplexity filter drops the worst tail but keeps most docs
    assert counts["after_perplexity_filter"] >= counts["after_quality_filter"] * 0.8
    # span stripping / decontamination rewrite text without dropping rows
    assert counts["after_span_strip"] == counts["after_perplexity_filter"]
    assert counts["after_decontamination"] == counts["after_semdedup"]
    # DSIR keeps the target-likest half
    assert counts["after_dsir_selection"] == max(1, counts["after_decontamination"] // 2)
    # the classifier stage annotates (score column) without dropping
    assert counts["after_classifier"] == counts["after_unimax"]
    # HLL corpus stat is in the right ballpark (tiny vocab corpus)
    assert 0 < counts["distinct_tokens_hll"] < 200
    # CMS heavy hitter: the hottest token appears at least as often
    # as a uniform share (one-sided estimate never under-counts)
    assert counts["top_token_cms"] > 0
    # PII scrub is an audit stage (no row drops; count non-negative)
    assert counts["pii_redactions"] >= 0
    # chunked view covers the kept docs (docs whose text was fully
    # span-stripped legitimately yield zero chunks, so >= is over the
    # non-empty subset, not the full kept count)
    assert 0 < counts["rag_chunks"]
    # every kept doc gets a pack assignment
    assert counts["written"] == counts["after_unimax"] > 0
