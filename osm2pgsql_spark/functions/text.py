"""Text-analysis expression library (training-data pipeline ops).

These are beyond the reference's surface (it processes map tags, not
documents) but reuse the same design rule as the tag transforms: the
hot path is JVM-side Catalyst expressions — tokenization, ratios,
fingerprints all stay inside whole-stage codegen.  At 100 TB of text
a Python UDF here would be the bottleneck; none of these use one.

Every function has a DuckDB-SQL twin (the *_SQL strings) evaluating
the identical formula for the driver's oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.rounding import roundn, roundn_sql

# Minimal per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic.  Tiny on purpose: the point is the operator
# shape (broadcast dictionary + expression scoring), not lexicography.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank -> 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


def token_count_sql(col: str = "text") -> str:
    return (
        f"cast(case when trim({col}) = '' then 0 "
        f"else len(string_split_regex(trim({col}), '\\s+')) end as bigint)"
    )


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


# BPE-style pre-tokenizer pattern: word pieces, numbers, single
# punctuation runs (the GPT-2 pre-tok shape without lookaheads, which
# neither engine's regex dialect shares reliably)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens — regexp_extract_all JVM-side."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast("bigint")


def bpe_token_count_sql(col: str = "text") -> str:
    return f"cast(len(regexp_extract_all({col}, '{BPE_PATTERN}')) as bigint)"


def alpha_ratio(text: Column) -> Column:
    """Fraction of alphabetic characters — a quality-score component."""
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(F.length(text) > 0, alpha.cast("double") / F.length(text)).otherwise(F.lit(0.0))


def alpha_ratio_sql(col: str = "text") -> str:
    return (
        f"case when length({col}) > 0 then "
        f"cast(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) as double) / length({col}) "
        f"else 0.0 end"
    )


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    """Number of tokens that are stopwords (JVM-side: split + filter)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("bigint")


def stopword_count_sql(col: str = "text", stopwords: list[str] | None = None) -> str:
    words = ", ".join(f"'{w}'" for w in (stopwords or STOPWORDS_EN))
    return (
        f"cast(len(list_filter(string_split_regex(lower(trim({col})), '\\s+'), "
        f"w -> list_contains([{words}], w))) as bigint)"
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + alpha ratio +
    stopword presence (the standard C4/Gopher-style cheap filters,
    expressed as one arithmetic column)."""
    n = F.length(text)
    len_score = F.when((n >= 50) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    alpha_score = alpha_ratio(text) * 0.3
    sw_score = F.when(stopword_count(text) >= 2, F.lit(0.3)).otherwise(F.lit(0.0))
    return roundn(len_score + alpha_score + sw_score, 4)


def quality_score_sql(col: str = "text") -> str:
    raw = (
        f"(case when length({col}) between 50 and 10000 then 0.4 else 0.0 end) "
        f"+ ({alpha_ratio_sql(col)}) * 0.3 "
        f"+ (case when ({stopword_count_sql(col)}) >= 2 then 0.3 else 0.0 end)"
    )
    return roundn_sql(raw, 4)


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: lowercase, whitespace-normalize,
    sort tokens, md5.  Key for exact-ish dedup clustering."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.md5(F.array_join(F.array_sort(toks), " "))


def fingerprint_sql(col: str = "text") -> str:
    return (
        f"md5(array_to_string(list_sort(string_split_regex(lower(trim({col})), '\\s+')), ' '))"
    )


def lang_guess(text: Column) -> Column:
    """Tiny language-ID heuristic: en if >=1 English stopword token,
    else 'und'.  (Shape of the operator: dictionary scoring in an
    expression; swap in bigger tables for real use.)"""
    return F.when(stopword_count(text) >= 1, F.lit("en")).otherwise(F.lit("und"))


def lang_guess_sql(col: str = "text") -> str:
    return f"case when ({stopword_count_sql(col)}) >= 1 then 'en' else 'und' end"


# --------------------------------------------------- cleaning / filtering
# patterns restricted to the Java-regex ∩ RE2 dialect (no lookarounds)
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def url_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0))).cast("bigint")


def url_count_sql(col: str = "text") -> str:
    return f"cast(len(regexp_extract_all({col}, '{URL_PATTERN}')) as bigint)"


def email_count(text: Column) -> Column:
    return F.size(
        F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0))
    ).cast("bigint")


def email_count_sql(col: str = "text") -> str:
    return f"cast(len(regexp_extract_all({col}, '{EMAIL_PATTERN}')) as bigint)"


def redact(text: Column) -> Column:
    """PII-lite cleaning: URLs -> <url>, emails -> <email> (the order
    matters: URLs first so an emailish path inside a URL is already
    gone).  Pure regexp_replace — JVM-side, no Python."""
    no_url = F.regexp_replace(text, URL_PATTERN, "<url>")
    return F.regexp_replace(no_url, EMAIL_PATTERN, "<email>")


def redact_sql(col: str = "text") -> str:
    return (
        f"regexp_replace(regexp_replace({col}, '{URL_PATTERN}', '<url>', 'g'), "
        f"'{EMAIL_PATTERN}', '<email>', 'g')"
    )


def is_quality(text: Column) -> Column:
    """Gopher/C4-style boolean keep-filter from cheap signals: length
    band, alphabetic ratio, stopword presence, mean token length band.
    One boolean Catalyst expression — composable with any filter
    pushdown."""
    n = F.length(text)
    toks = token_count(text)
    mean_tok = F.when(
        toks > 0,
        F.length(F.regexp_replace(text, r"\s", "")).cast("double") / toks,
    ).otherwise(F.lit(0.0))
    return (
        (n >= 50) & (n <= 100000)
        & (alpha_ratio(text) >= 0.5)
        & (stopword_count(text) >= 1)
        & (mean_tok >= 2.0) & (mean_tok <= 12.0)
    )


def is_quality_sql(col: str = "text") -> str:
    mean_tok = (
        f"case when ({token_count_sql(col)}) > 0 then "
        f"cast(length(regexp_replace({col}, '\\s', '', 'g')) as double) "
        f"/ ({token_count_sql(col)}) else 0.0 end"
    )
    return (
        f"(length({col}) between 50 and 100000) "
        f"and ({alpha_ratio_sql(col)}) >= 0.5 "
        f"and ({stopword_count_sql(col)}) >= 1 "
        f"and ({mean_tok}) between 2.0 and 12.0"
    )
