"""Loaders for the driver-provided parquet corpus (TESTDATA.md).

At cluster scale these would be partitioned/bucketed tables; here the
load is a plain parquet scan so Catalyst keeps predicate pushdown and
column pruning (check ``.explain``: PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from osm2pgsql_spark.model import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet, which Spark only
        # reads with the legacy nanosAsLong flag (as int64 nanos).  The
        # flag is a runtime-settable session conf, but callers (e.g. the
        # driver) may hand us a session that never set it — set it here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->TZ cast below is only exact when the session TZ is
        # UTC.  Spark analysis is eager and ResolveTimeZone bakes the
        # session zone into the cast at DataFrame-construction time, so
        # pinning UTC around the construction is enough — restore the
        # caller's zone afterwards instead of mutating their session
        # permanently (ADVICE r4).
        prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            # Be tolerant of all three ts encodings the driver has
            # shipped:
            #   1. TIMESTAMP(NANOS) read as int64 nanos (legacy flag)
            #   2. timestamp[us] isAdjustedToUTC=false -> TIMESTAMP_NTZ
            #   3. plain TIMESTAMP (already what downstream expects)
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, T.LongType):
                # convert int64 nanos to a microsecond timestamp
                # (matches DuckDB's epoch_us truncation for positive
                # epochs)
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif isinstance(ts_type, T.TimestampNTZType):
                # session TZ is UTC here, so NTZ wall-clock == UTC
                # instant and unix_micros after the cast matches
                # DuckDB's epoch_us
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            if prev_tz is not None:
                spark.conf.set("spark.sql.session.timeZone", prev_tz)
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (mirrors the driver's
    DuckDB-side pre-registered views, so spark.sql text can match
    oracle SQL nearly 1:1)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
