"""examples/training_data_pipeline.py pinned end-to-end (r11 VERDICT
#6): the showcase curation composition (clean -> quality + perplexity
filters -> span strip -> line dedup (r12 VERDICT #4) ->
exact/near/embedding/semantic dedup ->
decontamination -> PII scrub -> DSIR -> budgets -> packing) must keep
producing byte-stable decisions on the sf0.001 corpus, so example rot
fails CI instead of surfacing at demo time.

Every stage is hash-decided (md5-keyed sampling, frozen artifacts),
so the stage counts and the surviving doc_id set are deterministic
across runs, partitionings and engines."""

import hashlib
import importlib.util
import os
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: per-stage row counts pinned from the deterministic pipeline
EXPECTED_COUNTS = {
    "input": 500,
    "after_quality_filter": 465,
    "after_perplexity_filter": 444,
    "after_span_strip": 444,
    "after_line_dedup": 444,
    "after_exact_dedup": 444,
    "after_near_dedup": 425,
    "after_embedding_dedup": 425,
    "after_semdedup": 425,
    "after_decontamination": 425,
    "pii_redactions": 0,
    "after_dsir_selection": 212,
    "after_token_budget": 51,
    "after_unimax": 51,
    "after_classifier": 51,
    "distinct_tokens_hll": 32,
    "top_token_cms": 110,
    "rag_chunks": 48,
    "written": 51,
}
#: md5 of the comma-joined sorted surviving doc_ids
EXPECTED_ID_HASH = "8173e700a6239cea82e90d920fa7b53a"
#: (sum(n_tokens), sum(pack_id), sum(length(text))) of the output
EXPECTED_SUMS = (2890, 15, 14721)


def _load_example():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples",
        "training_data_pipeline.py")
    spec = importlib.util.spec_from_file_location("tdp_example", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["tdp_example"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_curate_end_to_end_pinned(spark, tmp_path):
    mod = _load_example()
    out = str(tmp_path / "curated")
    counts = mod.curate(spark, SF_DIR, out)
    assert counts == EXPECTED_COUNTS
    from pyspark.sql import functions as F

    df = spark.read.parquet(out)
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    got = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
    assert got == EXPECTED_ID_HASH
    row = df.agg(F.sum("n_tokens").alias("t"), F.sum("pack_id").alias("p"),
                 F.sum(F.length("text")).alias("L")).first()
    assert (row["t"], row["p"], row["L"]) == EXPECTED_SUMS
    assert sorted(df.columns) == [
        "bucket", "doc_id", "embedding", "lang", "n_tokens", "offset",
        "pack_id", "pack_offset", "quality", "score_e6", "text"]


@pytest.mark.slow
def test_ingest_stream_dedup_count(spark, tmp_path):
    mod = _load_example()
    n = mod.ingest_stream(spark, SF_DIR, str(tmp_path / "ingest"))
    assert n == 500  # synthetic corpus has no cross-shard duplicates
