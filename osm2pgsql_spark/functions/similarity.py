"""Similarity / dedup primitives: portable hashes, shingles, MinHash,
SimHash, cosine — the large-scale dedup toolchain.

Design rules:
- Integer-only, engine-portable hashing: the base token hash is the
  first 8 hex chars of md5 (identical in Spark and DuckDB), and all
  derived hashes are exact int64 arithmetic — so every stage has a
  bit-exact DuckDB oracle.
- Everything is Catalyst expressions over arrays (split / transform /
  aggregate / explode); no Python UDFs.  MinHash over 100 TB of text
  is shuffle-bound, not CPU-bound, when expressed this way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1


def _lcg(seed: int):
    state = seed
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield state


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs, a in [1, 2^30), b in [0, 2^30)."""
    g = _lcg(seed)
    out = []
    for _ in range(k):
        a = next(g) % ((1 << 30) - 1) + 1
        b = next(g) % (1 << 30)
        out.append((a, b))
    return out


# ------------------------------------------------- portable base hash

def hash32(s: Column) -> Column:
    """First 8 hex chars of md5 as int64 in [0, 2^32)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def hash32_sql(expr: str) -> str:
    return f"cast(cast(concat('0x', substr(md5({expr}), 1, 8)) as ubigint) as bigint)"


# ------------------------------------------------------------ shingles

def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def tokens_sql(col: str = "text") -> str:
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a *materialized* token-array
    column.  IMPORTANT: pass a plain column reference, not an inline
    split(...) expression — Catalyst does not CSE inside lambda
    functions, so an inline expression is re-evaluated per array
    element (O(tokens^2) — measured 10x slowdown on the dedup bench).

    Empty array when fewer than n tokens (guard needed: Spark's
    sequence() runs *descending* when start > stop)."""
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Shingles straight from a text column.  Prefer materializing
    tokens(text) in a column and calling shingles_from_tokens — see
    the CSE warning there."""
    return shingles_from_tokens(tokens(text), n)


def shingles_from_tokens_sql(tokens_col: str = "t", n: int = 3) -> str:
    """DuckDB twin over a token-list column (1-based indexing, same as
    Spark element_at)."""
    parts = " || ' ' || ".join(f"{tokens_col}[i + {j}]" for j in range(n))
    return (
        f"case when len({tokens_col}) >= {n} then "
        f"list_distinct(list_transform(generate_series(1, len({tokens_col}) - {n - 1}), "
        f"i -> {parts})) else [] end"
    )


# ------------------------------------------------------------- minhash

def minhash_value(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod M61 — exact in int64 (h < 2^32, a < 2^30)."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE61)


def minhash_value_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) * {a} + {b}) % {MERSENNE61}"


# ------------------------------------------------------------- simhash

def simhash32_from_hashes(hashes: Column) -> Column:
    """32-bit SimHash over a *materialized* token-hash array column
    (hash32 per token).  IMPORTANT: pass a plain column reference, not
    an inline transform(tokens(...), hash32) expression — the Column
    DSL copies the subtree into every per-bit aggregate and Catalyst
    does no CSE inside lambda functions, so the inline form pays the
    split + 32 md5-per-token passes PER BIT (the shingles_from_tokens
    lesson; measured on text_stats, plans/r14)."""
    bits = []
    for j in range(32):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1,
        )
        bits.append(F.when(vote > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash32(text: Column) -> Column:
    """32-bit SimHash over whitespace tokens: for each bit j, sum
    (+1/-1) of token-hash bit j; result bit j set iff sum > 0.
    Pure integer expression -> bit-exact oracle.  Hot paths should
    materialize transform(tokens(text), hash32) in a column and call
    simhash32_from_hashes on the reference instead (see its CSE
    warning)."""
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: hash32(t))
    return simhash32_from_hashes(hashes)


def simhash32_sql(col: str = "text") -> str:
    h = hash32_sql("t")
    terms = []
    for j in range(32):
        vote = (
            f"list_sum(list_transform({tokens_sql(col)}, "
            f"t -> ((({h}) >> {j}) & 1) * 2 - 1))"
        )
        terms.append(f"(case when ({vote}) > 0 then cast({1 << j} as bigint) else 0 end)")
    return "(" + " + ".join(terms) + ")"


def hash32_hi(s: Column) -> Column:
    """Hex chars 9-16 of md5 as int64 in [0, 2^32) — the high half of
    the 64-bit token hash (see simhash64)."""
    return F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("bigint")


def hash32_hi_sql(expr: str) -> str:
    return f"cast(cast(concat('0x', substr(md5({expr}), 9, 8)) as ubigint) as bigint)"


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens — the at-scale default:
    with hash_bits=32 the pigeonhole bands of simhash_hamming_pairs
    hold only 2^4..2^5 distinct values per band at max_hamming=6, so
    band buckets saturate (quadratic candidates per bucket) past
    ~10^8 docs; 64-bit bands are 2^9+ wide and stay selective at
    planet scale (PERF_NOTES: simhash band cardinality).

    Bit j's vote reads bit j of the token's 64-bit hash, assembled
    from two md5 32-bit halves so neither engine ever parses an
    unsigned 64-bit literal; bit 63 lands as the bigint sign bit.
    Pure integer expression -> bit-exact oracle."""
    toks = tokens(text)
    los = F.transform(toks, lambda t: hash32(t))
    his = F.transform(toks, lambda t: hash32_hi(t))

    def voter(jj: int):
        # Spark introspects lambda arity, so the bit index must be a
        # closure, not a defaulted third parameter
        return lambda acc, h: acc + F.shiftright(h, jj).bitwiseAND(F.lit(1)) * 2 - 1

    out = None
    for j in range(64):
        src = los if j < 32 else his
        jj = j % 32
        vote = F.aggregate(src, F.lit(0).cast("bigint"), voter(jj))
        term = F.lit(-9223372036854775808) if j == 63 else F.lit(1 << j).cast("bigint")
        bit = F.when(vote > 0, term).otherwise(F.lit(0).cast("bigint"))
        out = bit if out is None else out + bit
    return out


def simhash64_sql(col: str = "text") -> str:
    lo = hash32_sql("t")
    hi = hash32_hi_sql("t")
    terms = []
    for j in range(64):
        h = lo if j < 32 else hi
        jj = j % 32
        vote = (
            f"list_sum(list_transform({tokens_sql(col)}, "
            f"t -> ((({h}) >> {jj}) & 1) * 2 - 1))"
        )
        term = "cast(-9223372036854775808 as bigint)" if j == 63 else f"cast({1 << j} as bigint)"
        terms.append(f"(case when ({vote}) > 0 then {term} else cast(0 as bigint) end)")
    return "(" + " + ".join(terms) + ")"


# -------------------------------------------------------------- cosine

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two ARRAY<FLOAT/DOUBLE> columns, JVM-side: one
    zip_with + three aggregates."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
