"""Streaming deduplication: drop exact/near-exact duplicate documents
as they arrive (the streaming counterpart of operators/dedup.py's
batch hash-groupBy dedup).

Training-data ingestion is append-only in practice: crawl shards land
continuously and duplicates arrive across micro-batches, so the dedup
key state must persist between batches.  Structured Streaming's
dropDuplicates maintains exactly that state in the state store; with
a watermark the state is bounded (a duplicate arriving later than the
watermark delay is treated as new — the standard trade, spelled out
in the public Spark docs).

Scale shape: state is hash-partitioned by the dedup key across
executors (the same key the batch dedup shuffles on); nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.text import fingerprint


def dedup_stream(
    docs: DataFrame,
    key: str = "exact",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame with duplicate
    documents dropped across micro-batches.

    key='exact'       dedup on md5 of the raw text
    key='fingerprint' dedup on the canonical fingerprint (lowercase,
                      whitespace-normalized, token-sorted md5) — the
                      near-exact key batch dedup clusters on

    watermark_delay (e.g. "10 minutes") bounds the dedup state via the
    event-time watermark on ts_col; None keeps state forever (only
    sane for bounded backfills)."""
    if key == "exact":
        keyed = docs.withColumn("__dk", F.md5(F.col(text_col)))
    elif key == "fingerprint":
        keyed = docs.withColumn("__dk", fingerprint(F.col(text_col)))
    else:
        raise ValueError(f"unknown dedup key {key!r}")
    if watermark_delay is not None:
        # dropDuplicatesWithinWatermark keys state on __dk alone and
        # expires entries once the watermark passes — bounded state
        # with full dedup inside the delay window
        out = keyed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__dk"]
        )
    else:
        out = keyed.dropDuplicates(["__dk"])
    return out.drop("__dk")


def _read_bloom_state(spark, state_dir: str):
    """(registers_df, have_state) for the persistent Bloom state.

    Recovers from a crash mid-swap (state parked at `.old` by
    bloom_dedup_batch's rename-aside) and treats ONLY a genuinely
    missing path as 'first batch'; any other read error (corrupt
    files, permissions) raises instead of silently re-admitting every
    previously-seen duplicate."""
    import os

    from pyspark.errors import AnalysisException

    old = state_dir.rstrip("/") + ".old"
    if not os.path.exists(state_dir) and os.path.exists(old):
        # crashed between the rename-aside and the promote: the
        # previous batch's complete state is intact at .old
        os.rename(old, state_dir)
    try:
        return spark.read.parquet(state_dir), True
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return spark.createDataFrame([], "word long, bits long"), False
        raise


def bloom_dedup_batch(
    spark,
    batch: DataFrame,
    out_dir: str,
    state_dir: str,
    value_col: str = "text",
    key_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> None:
    """One micro-batch of Bloom-filtered ingest dedup: append rows NOT
    already (maybe-)seen to `out_dir` and fold their positions into
    the persistent register table at `state_dir`.

    dropDuplicates state above is EXACT but grows with the distinct
    keys; the Bloom register table is a FIXED m_bits/32 rows no matter
    how many documents pass — the 100-TB ingest trade: false positives
    drop a bounded fraction of genuinely-new documents, duplicates
    (within filter capacity) never pass.  The filter is the portable
    md5-based sketch (operators/sketch.py), so a parallel loader or a
    different engine can audit or continue the same state.

    Intra-batch duplicates dedup exactly (first by key order); the
    output append is at-least-once under task retries — idempotent
    sinks (MERGE on key) make it exactly-once downstream.  Wire into
    a stream with `.writeStream.foreachBatch(...)` calling this."""
    from osm2pgsql_spark.operators.sketch import (
        bloom_contains, bloom_registers,
    )

    reg, have_state = _read_bloom_state(spark, state_dir)

    # exact intra-batch dedup (keep the smallest key per value), then
    # probe the accumulated filter
    w_first = F.row_number().over(
        Window.partitionBy(value_col).orderBy(key_col)
    )
    uniq = batch.withColumn("__rn", w_first).where(F.col("__rn") == 1).drop("__rn")
    seen = bloom_contains(reg, uniq, value_col, [key_col], m_bits, k)
    kept = uniq.join(
        seen.where(~F.col("maybe_member")).select(key_col), key_col
    )
    # the kept set is consumed twice (output append + register build):
    # materialize once
    kept = kept.localCheckpoint(eager=True)
    kept.write.mode("append").parquet(out_dir)
    merged = (
        reg.unionByName(bloom_registers(kept, value_col, m_bits, k))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    # state swap via rename-aside: the previous registers are parked
    # at `.old` until the new ones are promoted, so a crash at ANY
    # point leaves a complete state on disk (either at state_dir or at
    # .old, recovered by _read_bloom_state) — never zero state
    import os
    import shutil

    tmp = state_dir.rstrip("/") + ".tmp"
    old = state_dir.rstrip("/") + ".old"
    merged.write.mode("overwrite").parquet(tmp)
    if have_state:
        if os.path.exists(old):  # leftover of an interrupted cleanup
            shutil.rmtree(old)
        os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    if have_state:
        shutil.rmtree(old, ignore_errors=True)


def bloom_dedup_stream(
    docs: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "text",
    key_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
):
    """readStream -> foreachBatch(bloom_dedup_batch): fixed-size
    cross-batch ingest dedup.  Returns the started StreamingQuery."""
    spark = docs.sparkSession

    def fn(batch_df: DataFrame, _batch_id: int) -> None:
        bloom_dedup_batch(
            spark, batch_df, out_dir, state_dir, value_col, key_col,
            m_bits, k,
        )

    return (
        docs.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
