"""PII detection and redaction — the privacy-scrubbing stage of a
training-data pipeline (run between quality filtering and packing in
the standard curation order; e.g. the C4/mC4 and FineWeb pipelines
strip emails/IPs before publication).

Scale shape: both operators are single-projection, shuffle-free — one
regexp pass per category inside whole-stage codegen (JVM
`regexp_extract_all` / `regexp_replace`), no UDF, no exchange.  At
100 TB this is scan-bound, exactly like the Gopher signals
(operators/quality.py).

Cross-engine contract: the patterns restrict themselves to the regex
subset with identical semantics in Java (Spark) and RE2 (DuckDB) —
no lookarounds, no backreferences, `\\d` = [0-9], `\\b` word
boundaries — so counts AND redacted text reproduce bit-for-bit in the
DuckDB gate twin (queries.py pii_scrub).  Redaction applies the
categories in a fixed order (email, ipv4, phone) — order matters when
matches could overlap, so both engines apply the same sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: category -> (pattern, replacement token); ORDER IS THE CONTRACT
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
)


def pii_counts(col: Column) -> list[Column]:
    """One count column per PII category over a string column.
    Spark's regexp_extract_all defaults to group idx=1 — idx=0 (the
    full match) is passed explicitly to mirror DuckDB's default."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        .cast("long").alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]


def pii_redact(col: Column) -> Column:
    """The redacted text: categories replaced in the fixed order."""
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, redacted): per-document PII
    counts and the scrubbed text.  NULL text passes through as NULL
    redacted with zero counts (regexp functions return NULL on NULL;
    counts coalesce so downstream threshold filters never drop rows
    on NULL-vs-0 semantics)."""
    c = F.col(text_col)
    counts = [
        F.coalesce(
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))),
            F.lit(0),
        ).cast("long").alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]
    return docs.select(F.col(id_col), *counts,
                       pii_redact(c).alias("redacted"))


def pii_counts_sql(expr: str) -> list[str]:
    """DuckDB twins of pii_counts (same patterns, RE2 semantics)."""
    return [
        f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT) "
        f"AS n_{name}"
        for name, pat, _repl in PII_PATTERNS
    ]


def pii_redact_sql(expr: str) -> str:
    """DuckDB twin of pii_redact (global replace, same order)."""
    out = expr
    for _name, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
