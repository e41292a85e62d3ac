"""Deterministic HyperLogLog distinct-count sketch.

The cardinality sketch of Flajolet et al. 2007 ("HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm", AofA),
built engine-portable: the register assignment hashes with md5 (the
repo's cross-engine hash32, functions/similarity.py) instead of an
engine-private hash, so the SAME sketch — register values AND the
final estimate — reproduces bit-for-bit in DuckDB/PostgreSQL/Trino.
Spark's own approx_count_distinct and DuckDB's approx functions are
each internally consistent but mutually incompatible; a portable
sketch is what lets one engine build the registers and another merge
or audit them.

Scale shape: the register table is the whole reduction — a
groupBy(bucket).max() of m = 2^p rows (map-side combined), mergeable
across shards/engines by element-wise max — the classic
"sketch-then-merge" pattern for counting distinct tag values / tokens
/ user ids over 100 TB without a count(DISTINCT) shuffle of the raw
values.  Reference parity note: osm2pgsql's taginfo-style statistics
(flex debug output) count distinct tag values exactly; this is the
at-scale replacement.

Determinism details (all integer until the final estimate):
- h = hash32(value)  (first 8 md5 hex chars as int64, [0, 2^32));
- bucket = h >> (32 - p)  (top p bits, m = 2^p registers);
- w = h & (2^(32-p) - 1)  (remaining 32-p bits);
- rho = (32 - p) - bitlen(w) + 1, with rho = 32 - p + 1 for w = 0 —
  bitlen via length(bin(w)), exact on both engines;
- registers as (bucket, max rho); absent buckets count as rho = 0;
- E = alpha_m * m^2 / sum(2^-M_j): every 2^-M_j is a multiple of
  2^-(33-p) and the sum of m <= 2^14 of them is exactly representable
  in a double, so the float sum is order-independent and the raw
  estimate is bit-identical across engines;
- small-range correction (E <= 5/2 m, empty registers): linear
  counting m * ln(m / V) — the one libm call, absorbed by the gate's
  4-decimal rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import similarity as S


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, value_col: str, p: int = 8
) -> DataFrame:
    """(bucket, rho): the sketch itself — m = 2^p rows, mergeable
    across shards (and engines) by per-bucket max."""
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    wbits = 32 - p
    h = S.hash32(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row (n_registers_set, hll_estimate) from a register table
    (absent buckets are empty, rho = 0)."""
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("v_set"),
        # coalesce: an EMPTY register table (no input values) must
        # estimate 0 via the linear-counting branch, not NULL
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("s_set"),
    )
    # empty buckets each contribute 2^0 = 1 to the indicator sum
    s = F.col("s_set") + (F.lit(m) - F.col("v_set"))
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("v_set")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.col("v_set").cast("long").alias("n_registers_set"),
        est.alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, value_col: str, p: int = 8) -> DataFrame:
    """Convenience: registers + estimate in one call."""
    return hll_estimate(hll_registers(df, value_col, p), p)


def hll_sql(value_expr: str, from_clause: str, p: int = 8) -> str:
    """The identical sketch as one DuckDB query (the gate twin):
    returns (n_registers_set, hll_estimate)."""
    m = 1 << p
    wbits = 32 - p
    # bare decimal literals parse as DECIMAL in DuckDB (and overflow
    # in the alpha*m^2 product) — every float constant is cast DOUBLE
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    md = f"CAST({float(m)!r} AS DOUBLE)"
    lim = f"CAST({2.5 * m!r} AS DOUBLE)"
    h = S.hash32_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
    WITH hv AS (SELECT {h} AS h FROM {from_clause}
                WHERE {value_expr} IS NOT NULL),
         reg AS (SELECT h >> {wbits} AS bucket,
                        max(CASE WHEN (h & {(1 << wbits) - 1}) = 0
                                 THEN {wbits + 1}
                                 ELSE {wbits} - length(bin(h & {(1 << wbits) - 1})) + 1
                            END) AS rho
                 FROM hv GROUP BY 1),
         agg AS (SELECT count(*) AS v_set,
                        coalesce(sum(power(2.0e0, -rho)), 0.0e0) AS s_set
                 FROM reg)
    SELECT CAST(v_set AS BIGINT) AS n_registers_set,
           CASE WHEN {amm} / (s_set + ({m} - v_set)) <= {lim}
                     AND ({m} - v_set) > 0
                THEN {md} * ln({md} / ({m} - v_set))
                ELSE {amm} / (s_set + ({m} - v_set))
           END AS hll_estimate
    FROM agg
    """
