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


def bloom_registers(
    df: DataFrame, value_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """(word, bits): a deterministic Bloom filter (Bloom 1970) as a
    register table — at most m_bits/32 rows of 32-bit words, mergeable
    across shards (and engines) by per-word bit-OR.

    The ingest-time membership sibling of hll_registers: "have we seen
    this URL / content hash before" across batches at 100 TB, without
    shipping the raw key set.  Bit positions hash with the repo's
    portable md5-based hash32 — position i of value v is
    hash32(v || ':' || i) % m_bits — so the SAME words (and therefore
    the same membership answers, false positives included) reproduce
    bit-for-bit in any engine with md5.  Words are 32-bit (mask <
    2^31) so every register value is a positive int64 on both engines
    — no left-shift-into-the-sign-bit portability edge.

    Build shape: explode k positions per value -> groupBy(word).bit_or
    (map-side combined); the register table is tiny (m_bits/32 rows)
    and broadcast-joins against any probe set."""
    if m_bits < 32 or m_bits % 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: S.hash32(
                F.concat(
                    F.col(value_col).cast("string"), F.lit(":"),
                    i.cast("string"),
                )
            ) % m_bits,
        )
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(pos.alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 5).alias("word"),
            # F.shiftleft only takes a literal bit count — build the
            # mask as a SQL expression over the position column
            F.expr(
                "shiftleft(cast(1 as bigint), cast(__pos % 32 as int))"
            ).alias("__m"),
        )
        .groupBy("word")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_contains(
    registers: DataFrame,
    probe: DataFrame,
    value_col: str,
    key_cols: list,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """probe's key_cols + `maybe_member` (bool): the Bloom membership
    test — true iff all k bit positions of `value_col` are set in the
    register table (false positives possible at the filter's designed
    rate, never false negatives).  The register side is broadcast
    (m_bits/32 rows); the probe side never shuffles on data volume —
    the only exchange is the final per-key regroup of k tiny rows,
    and k is a constant."""
    pos_i = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: S.hash32(
                F.concat(
                    F.col(value_col).cast("string"), F.lit(":"),
                    i.cast("string"),
                )
            ) % m_bits,
        )
    )
    d = probe.select(*key_cols, pos_i.alias("__pos")).select(
        *key_cols,
        F.shiftright(F.col("__pos"), 5).alias("word"),
        F.expr(
            "shiftleft(cast(1 as bigint), cast(__pos % 32 as int))"
        ).alias("__m"),
    )
    j = d.join(F.broadcast(registers), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__m"))
        == F.col("__m")
    ).cast("int")
    # min(hit) == 1, not sum(hit) == k: a probe key appearing on more
    # than one input row contributes k rows PER occurrence, and the
    # all-positions-set test must stay occurrence-count-invariant
    # (the SQL twin's bool_and has the same semantics).  A NULL value
    # hashes to NULL positions and would aggregate to NULL — coalesce
    # to False so NULL values answer "never seen" and pass through
    # downstream dedup instead of silently vanishing (NULL was never
    # inserted: bloom_registers filters value IS NOT NULL).
    return (
        j.groupBy(*key_cols)
        .agg(F.coalesce(F.min(hit) == 1, F.lit(False)).alias("maybe_member"))
    )


def bloom_build_sql(
    value_expr: str,
    relation: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    where: str = "TRUE",
) -> str:
    """The identical register build as a DuckDB CTE body (no WITH):
    SELECT word, bits FROM ... — the gate twin of bloom_registers.
    `relation` must be a bare relation (the k-way UNNEST is a lateral
    cross join on it); filters go in `where`."""
    h = S.hash32_sql(f"concat(CAST({value_expr} AS VARCHAR), ':', i)")
    return f"""
    SELECT p // 32 AS word, bit_or(CAST(1 AS BIGINT) << (p % 32)) AS bits
    FROM (SELECT ({h}) % {m_bits} AS p
          FROM {relation}, UNNEST(range(0, {k})) AS u(i)
          WHERE ({where}) AND {value_expr} IS NOT NULL)
    GROUP BY 1
    """


def bloom_probe_sql(
    value_expr: str,
    key_exprs: str,
    from_clause: str,
    registers_cte: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> str:
    """Membership probe twin: SELECT key_exprs..., maybe_member FROM
    the probe relation against a register CTE named `registers_cte`."""
    h = S.hash32_sql(f"concat(CAST({value_expr} AS VARCHAR), ':', i)")
    return f"""
    SELECT {key_exprs},
           coalesce(bool_and(coalesce(bits, 0) & m = m), false) AS maybe_member
    FROM (SELECT {key_exprs},
                 (({h}) % {m_bits}) // 32 AS word,
                 CAST(1 AS BIGINT) << ((({h}) % {m_bits}) % 32) AS m
          FROM {from_clause}, UNNEST(range(0, {k})) AS u(i)) AS bprobe
         LEFT JOIN {registers_cte} USING (word)
    GROUP BY {key_exprs}
    """


def cms_registers(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1 << 12
) -> DataFrame:
    """(row, col, cnt): a deterministic count-min sketch (Cormode &
    Muthukrishnan 2005) — depth x width integer counters, mergeable
    across shards (and engines) by per-cell SUM.

    The frequency sibling of hll/bloom: approximate per-value counts
    (always >= the true count, never under) over 100 TB without a
    full groupBy of the raw values — heavy-hitter tokens, hot URLs,
    skewed join keys.  Row i's hash is the portable md5-based
    hash32(value || ':' || i), so counters AND estimates (collision
    overcounts included) reproduce bit-for-bit in any engine with
    md5.  Build = explode depth rows per value -> groupBy(row, col)
    count, map-side combined; the register table is at most
    depth*width rows regardless of input volume."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rc = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.struct(
                i.cast("int").alias("row"),
                (
                    S.hash32(
                        F.concat(
                            F.col(value_col).cast("string"), F.lit(":"),
                            i.cast("string"),
                        )
                    )
                    % width
                ).cast("int").alias("col"),
            ),
        )
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(rc.alias("__rc"))
        .select("__rc.row", "__rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    registers: DataFrame,
    probe: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1 << 12,
) -> DataFrame:
    """(value_col, cms_count): the point estimate min_i cnt[i, h_i(v)]
    for each DISTINCT probe value — an upper bound on the true count
    (one-sided error).  The register side broadcasts (depth*width
    rows); probes never shuffle on data volume beyond a distinct of
    the probe keys."""
    vals = probe.where(F.col(value_col).isNotNull()).select(value_col).distinct()
    rc = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.struct(
                i.cast("int").alias("row"),
                (
                    S.hash32(
                        F.concat(
                            F.col(value_col).cast("string"), F.lit(":"),
                            i.cast("string"),
                        )
                    )
                    % width
                ).cast("int").alias("col"),
            ),
        )
    )
    d = vals.select(value_col, rc.alias("__rc")).select(
        value_col, "__rc.row", "__rc.col"
    )
    return (
        d.join(F.broadcast(registers), ["row", "col"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_count")
        )
    )


def cms_build_sql(
    value_expr: str,
    relation: str,
    depth: int = 4,
    width: int = 1 << 12,
    where: str = "TRUE",
) -> str:
    """The identical sketch build as a DuckDB CTE body: SELECT row,
    col, cnt FROM ... — the gate twin of cms_registers."""
    h = S.hash32_sql(f"concat(CAST({value_expr} AS VARCHAR), ':', i)")
    return f"""
    SELECT CAST(i AS INT) AS row, CAST(({h}) % {width} AS INT) AS col,
           count(*) AS cnt
    FROM {relation}, UNNEST(range(0, {depth})) AS u(i)
    WHERE ({where}) AND {value_expr} IS NOT NULL
    GROUP BY 1, 2
    """


def cms_estimate_sql(
    value_expr: str,
    alias: str,
    relation: str,
    registers_cte: str,
    depth: int = 4,
    width: int = 1 << 12,
) -> str:
    """Point-estimate twin: SELECT {alias}, cms_count for each
    distinct probe value against a register CTE."""
    h = S.hash32_sql(f"concat(CAST(v AS VARCHAR), ':', i)")
    return f"""
    SELECT v AS {alias},
           CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_count
    FROM (SELECT v, CAST(i AS INT) AS row,
                 CAST(({h}) % {width} AS INT) AS col
          FROM (SELECT DISTINCT {value_expr} AS v FROM {relation}
                WHERE {value_expr} IS NOT NULL) AS pv,
               UNNEST(range(0, {depth})) AS u(i)) AS cprobe
         LEFT JOIN {registers_cte} USING (row, col)
    GROUP BY v
    """


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
