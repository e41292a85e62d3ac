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

from pyspark.sql import DataFrame
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
