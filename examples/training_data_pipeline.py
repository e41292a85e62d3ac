"""End-to-end training-data curation pipeline over the documents +
embeddings corpus: clean -> filter -> dedup (exact, near, embedding)
-> keep-decisions -> curated parquet.

This is the LLM-data counterpart of generic_import.py: one runnable
script showing how the engine's training-data operators compose into
the standard curation recipe (C4/Gopher-style filtering, MinHash-LSH
near-dedup, embedding near-dedup), with every stage a DataFrame plan
— no driver-side loops, no row-at-a-time Python.

Run against a testdata scale dir:

  python examples/training_data_pipeline.py /root/testdata/sf0.001 /tmp/curated
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm2pgsql_spark.functions import text as TX
from osm2pgsql_spark.operators import ann, dedup
from osm2pgsql_spark.session import get_spark
from osm2pgsql_spark.sources.testdata import load_table


def curate(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    counts = {"input": docs.count()}

    # 1. clean + annotate (pure column expressions, one pass)
    t = F.col("text")
    annotated = docs.select(
        "doc_id",
        TX.redact(t).alias("text"),  # URLs/emails -> placeholders
        TX.token_count(t).alias("n_tokens"),
        TX.quality_score(t).alias("quality"),
        TX.lang_guess(t).alias("lang"),
        TX.is_quality(t).alias("keep"),
    )

    # 2. quality filter (predicate stays pushdown-friendly)
    kept = annotated.where(F.col("keep")).drop("keep")
    counts["after_quality_filter"] = kept.count()

    # 2b. LM-perplexity filter (CCNet-style): score every doc against
    # the corpus's own char-trigram model, drop the worst tail
    from osm2pgsql_spark.operators import lm

    ppl = lm.perplexity3(docs)
    cutoff = ppl.agg(
        F.expr("percentile_approx(ppl3, 0.95)").alias("p95")
    ).collect()[0]["p95"]
    good_ppl = ppl.where(F.col("ppl3").isNull() | (F.col("ppl3") <= cutoff))
    kept = kept.join(good_ppl.select("doc_id"), "doc_id", "leftsemi")
    counts["after_perplexity_filter"] = kept.count()

    # 2c. exact-substring dedup (Lee et al.): strip token spans whose
    # every k-gram also appears in another document
    spans = dedup.duplicated_spans(docs, k=8)
    stripped = dedup.strip_duplicated_spans(
        kept.select("doc_id", "text"), spans
    )
    kept = kept.drop("text").join(stripped, "doc_id")
    counts["after_span_strip"] = kept.count()

    # 2d. corpus-global line dedup (C4 §2.2 / RefinedWeb): every
    # repeated line keeps only its first occurrence corpus-wide
    # (boilerplate headers/footers), documents rebuild from surviving
    # lines; a doc left with no real line drops out.  Decision path
    # shuffles only hashes + positions, text joins back once per doc.
    lined = dedup.line_dedup(kept.select("doc_id", "text"), min_chars=4)
    kept = kept.drop("text").join(
        lined.where(F.col("n_kept_lines") >= 1).select("doc_id", "text"),
        "doc_id")
    counts["after_line_dedup"] = kept.count()

    # 3. exact dedup: keep the lowest doc_id per md5 group
    exact_keep = dedup.exact_groups(docs).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(exact_keep, "doc_id", "leftsemi")
    counts["after_exact_dedup"] = kept.count()

    # 4. MinHash-LSH near-dedup: banded candidates, exact-Jaccard
    # verify, connected components -> per-cluster keep decision
    pairs = dedup.verified_near_dups(docs, min_jaccard=0.5)
    clusters = dedup.cluster_pairs(pairs.select("doc_a", "doc_b"))
    drop_near = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = kept.join(drop_near, "doc_id", "left_anti")
    counts["after_near_dedup"] = kept.count()

    # 5. embedding near-dedup (semantic duplicates): RP bands + exact
    # cosine verify; drop the higher id of each close pair
    epairs = ann.rp_near_dup_pairs(emb, threshold=0.95)
    drop_emb = epairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = kept.join(drop_emb, "doc_id", "left_anti")
    counts["after_embedding_dedup"] = kept.count()

    # 5b. SemDeDup: paraphrase-level duplicates inside k-means cells
    # (catches what lexical + pairwise-cosine dedup both miss)
    from osm2pgsql_spark.operators.semdedup import semantic_dedup

    sem = semantic_dedup(emb, nlist=8, iters=3, threshold=0.97)
    sem_drop = sem.where(~F.col("keep")).select(F.col("vec_id").alias("doc_id"))
    kept = kept.join(sem_drop, "doc_id", "left_anti")
    counts["after_semdedup"] = kept.count()

    # 5c. benchmark decontamination: strip spans whose every k-gram
    # occurs in the eval set (here: a held-out slice stands in)
    bench = docs.where(F.col("doc_id") % 29 == 0)
    contam = dedup.contaminated_spans(
        kept.select("doc_id", "text"), bench, k=8)
    kept = kept.drop("text").join(
        dedup.strip_duplicated_spans(kept.select("doc_id", "text"), contam),
        "doc_id")
    counts["after_decontamination"] = kept.count()

    # 5c2. PII scrub: redact emails/IPs/phone numbers in the surviving
    # text (one shuffle-free regexp projection; counts kept as audit
    # columns) — every published crawl corpus runs this before release.
    # checkpoint first: `kept` carries the whole 9-stage lineage by
    # now, and this stage fans it out again (select + join-back) —
    # without the cut, Catalyst re-analysis of the multiplied subtree
    # dominates (the r10 analyzer trap; same cut unimax_mixture does
    # internally)
    from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt2
    from osm2pgsql_spark.operators.pii import pii_scrub

    kept = _ckpt2(kept)
    scrubbed = pii_scrub(kept.select("doc_id", "text"))
    kept = kept.drop("text").join(
        scrubbed.withColumnRenamed("redacted", "text"), "doc_id")
    counts["pii_redactions"] = int(
        kept.agg(F.sum(F.col("n_email") + F.col("n_ipv4")
                       + F.col("n_phone"))).first()[0]
    )
    kept = kept.drop("n_email", "n_ipv4", "n_phone")

    # 5d. DSIR: keep the half of the corpus most like the target
    # domain (hashed n-gram importance log-ratios, pure Catalyst)
    from osm2pgsql_spark.operators import dsir

    tgt = docs.where(F.col("source").isin("src0", "src1"))
    picked = dsir.dsir_select(
        kept.select("doc_id", "text"), tgt,
        top_k=max(1, kept.count() // 2))
    kept = kept.join(picked.select("doc_id"), "doc_id", "leftsemi")
    counts["after_dsir_selection"] = kept.count()

    # 5e. token-budget mixture: deterministic per-source prefixes to
    # a token budget (layout-independent, reproducible on any cluster)
    budgeted = dedup.token_budget_mixture(
        kept.join(docs.select("doc_id", "source"), "doc_id"),
        budgets={"src0": 10_000, "src1": 10_000, "src2": 5_000},
        token_col="n_tokens")
    kept = kept.join(budgeted.select("doc_id"), "doc_id", "leftsemi")
    counts["after_token_budget"] = kept.count()

    # 5e2. UniMax language balancing (Chung et al. 2023): waterfill
    # a global token budget across languages (each capped at 2
    # epochs), keep documents drawn at least once — fairer than
    # proportional sampling for the long-tail languages
    from osm2pgsql_spark.operators import curation

    um = curation.unimax_mixture(
        kept.select("doc_id", "lang", "n_tokens"),
        total_budget=30_000, group_col="lang", max_epochs=2)
    kept = kept.join(
        um.where(F.col("n_epochs") >= 1).select("doc_id"), "doc_id",
        "leftsemi")
    counts["after_unimax"] = kept.count()

    # 5f. classifier-based quality filter (fastText-shaped hashed
    # linear model — one shuffle-free projection) as an audit column
    clf = curation.hashed_linear_score(kept.select("doc_id", "text"))
    kept = kept.join(clf.select("doc_id", "score_e6"), "doc_id")
    counts["after_classifier"] = kept.count()

    # 5g. CCNet head/middle/tail perplexity buckets (distributed rank)
    buckets = curation.ccnet_buckets(
        ppl.select("doc_id", "ppl3").join(
            kept.select("doc_id"), "doc_id", "leftsemi"))
    kept = kept.join(buckets.select("doc_id", "bucket"), "doc_id", "left")

    # 5h. corpus stats without a count(DISTINCT) shuffle: portable
    # HLL sketch of the distinct-token cardinality
    from osm2pgsql_spark.operators import sketch

    toks = kept.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
    ndv = sketch.hll_distinct(toks.where(F.col("t") != ""), "t").first()
    counts["distinct_tokens_hll"] = int(round(ndv["hll_estimate"]))

    # 5h2. heavy-hitter token frequency without a raw-value groupBy:
    # portable count-min sketch, per-cell-SUM mergeable across shards.
    # checkpoint: the token explode re-derives the full kept lineage
    # and the sketch references it twice (build + probe) — cut it
    from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt

    toks_nz = _ckpt(toks.where(F.col("t") != ""))
    reg = sketch.cms_registers(toks_nz, "t", depth=4, width=1 << 12)
    counts["top_token_cms"] = int(
        sketch.cms_estimate(reg, toks_nz, "t", depth=4, width=1 << 12)
        .agg(F.max("cms_count")).first()[0]
    )

    # 6b. sliding-window chunking (the RAG-style alternative to
    # packing): overlapping fixed-token windows, narrow plan only —
    # counted here as an audit of the chunked view of the corpus
    chunks = curation.chunk_documents(
        kept.select("doc_id", "text"), chunk_tokens=256, overlap=32)
    counts["rag_chunks"] = chunks.count()

    # 7. pack into fixed training windows (distributed prefix sum) and
    # write the curated corpus with pack assignments + embeddings
    packed = curation.pack_sequences(kept, window=2048, token_col="n_tokens")
    curated = kept.join(
        packed.select("doc_id", "offset", "pack_id", "pack_offset"), "doc_id"
    ).join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id", "left"
    )
    curated.write.mode("overwrite").parquet(out_dir)
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


def ingest_stream(spark, sf_dir: str, work_dir: str, n_shards: int = 4) -> int:
    """Streaming front door for the same pipeline: crawl shards arrive
    as files, duplicates are dropped ACROSS micro-batches with
    watermark-bounded state (streaming/dedup_stream.py), and the
    deduped stream lands as parquet that curate() can consume.

    Simulated here by splitting the documents table into n_shards
    parquet files and replaying them one file per trigger — the
    production shape is identical with a cloud-storage source
    directory.  Returns the deduped row count.

    dropDuplicates state here is exact but grows with distinct keys;
    for unbounded ingest swap in bloom_dedup_stream (same module):
    fixed m_bits/32-row register state, engine-portable, at the cost
    of a designed false-positive drop rate."""
    docs = load_table(spark, sf_dir, "documents")
    shards = os.path.join(work_dir, "shards")
    # deterministic event time derived from the id: duplicates within
    # the watermark window are dropped, the state stays bounded
    docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_000_000) + F.col("doc_id") % 3600)
    ).repartition(n_shards).write.mode("overwrite").parquet(shards)

    from osm2pgsql_spark.streaming.dedup_stream import dedup_stream

    stream = (
        spark.readStream.schema(spark.read.parquet(shards).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shards)
    )
    deduped = dedup_stream(
        stream, key="fingerprint", watermark_delay="1 hour", ts_col="ts"
    )
    out = os.path.join(work_dir, "ingested")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_docs"
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    n = ingest_stream(spark, sf_dir, out_dir + "_ingest")
    print(f"stream_ingested: {n}")
    counts = curate(spark, sf_dir, out_dir)
    for k, v in counts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
