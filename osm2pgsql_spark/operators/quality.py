"""Gopher/MassiveText-style repetition and shape quality signals
(Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A;
the same family ships in public pipelines like Dolma and RedPajama).

Per-document signals over the `documents` table:

- ``dup_line_frac``      fraction of (non-empty) line INSTANCES that
                         are repeats of an identical line in the doc
- ``dup_line_char_frac`` same, weighted by line characters
- ``bullet_line_frac``   lines starting with a bullet (`- `, `* `, `• `)
- ``ellipsis_line_frac`` lines ending with `...` / `…`
- ``mean_word_len``      average whitespace-token length
- ``alpha_word_frac``    fraction of tokens containing a letter
- ``top2gram_char_frac`` chars in the most frequent word 2-gram
                         (count × gram length / text length)
- ``dup5gram_char_frac`` chars in word 5-grams occurring more than
                         once (Σ c·len(gram) / text length, capped at 1)

Everything is Catalyst built-ins — split / filter / transform /
explode / groupBy — so the 100-TB plan is two token-array scans plus
hash aggregations on (doc_id, gram); no Python runs per row.  Each
signal has a bit-matching DuckDB oracle (gopher_oracle_ctes) wired
into the text_stats gate.

Tokenization is the shared dedup tokenizer
(functions/similarity.tokens: lower + `\\s+` split, empty tokens
dropped) so quality signals and MinHash/SimHash agree on what a word
is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import similarity as S

BULLET_RE = "^ *[-*•] "
ELLIPSIS_RE = "(\\.\\.\\.|…) *$"


def _clean_tokens(text: Column) -> Column:
    return F.filter(S.tokens(text), lambda t: t != F.lit(""))


def _clean_tokens_sql(col: str) -> str:
    return (f"list_filter({S.tokens_sql(col)}, x -> x <> '')")


def gopher_signals(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc signal frame: one row per input doc, all signals
    null-free (docs with no lines/words get 0.0)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        F.greatest(F.length(text_col), F.lit(1)).alias("__tl"),
    )

    lines = d.select(
        "doc_id", F.explode(F.split("__t", "\n")).alias("line")
    ).where(F.length(F.trim("line")) > 0)
    line_shape = lines.groupBy("doc_id").agg(
        F.avg(F.col("line").rlike(BULLET_RE).cast("double"))
        .alias("bullet_line_frac"),
        F.avg(F.col("line").rlike(ELLIPSIS_RE).cast("double"))
        .alias("ellipsis_line_frac"),
    )
    per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_dup = per_line.groupBy("doc_id").agg(
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_line_frac"),
        (F.sum((F.col("c") - 1) * F.length("line"))
         / F.sum(F.col("c") * F.length("line")))
        .alias("dup_line_char_frac"),
    )

    toks = d.select("doc_id", "__tl", _clean_tokens(F.col("__t")).alias("t"))
    words = toks.select("doc_id", F.explode("t").alias("w"))
    word_shape = words.groupBy("doc_id").agg(
        F.avg(F.length("w")).alias("mean_word_len"),
        F.avg(F.col("w").rlike("[a-z]").cast("double"))
        .alias("alpha_word_frac"),
    )

    def gram_frame(n: int) -> DataFrame:
        sep = "concat(" + ", ' ', ".join(
            f"t[i + {j}]" for j in range(n)) + ")"
        expr = (f"CASE WHEN size(t) >= {n} THEN "
                f"transform(sequence(0, size(t) - {n}), i -> {sep}) "
                f"ELSE array() END")
        return (toks.select("doc_id", "__tl",
                            F.explode(F.expr(expr)).alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count("*").alias("c"), F.first("__tl").alias("tl")))

    from pyspark.sql import Window

    bgc = gram_frame(2)
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    top2 = (bgc.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", (F.col("c") * F.length("g") / F.col("tl"))
                    .alias("top2gram_char_frac")))

    g5c = gram_frame(5)
    d5 = g5c.groupBy("doc_id").agg(
        F.least(F.lit(1.0),
                F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g"))
                      .otherwise(0)) / F.first("tl"))
        .alias("dup5gram_char_frac"))

    out = d.select("doc_id")
    for sub in (line_dup, line_shape, word_shape, top2, d5):
        out = out.join(sub, "doc_id", "left")
    fill = [
        "dup_line_frac", "dup_line_char_frac", "bullet_line_frac",
        "ellipsis_line_frac", "mean_word_len", "alpha_word_frac",
        "top2gram_char_frac", "dup5gram_char_frac",
    ]
    return out.fillna(0.0, subset=fill)


def gopher_oracle_ctes(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB CTE chain computing the identical signals; the final CTE
    is ``gq`` keyed by doc_id (left-join it and coalesce to 0)."""
    toks = _clean_tokens_sql(text_col)
    big = "t[i] || ' ' || t[i + 1]"
    g5 = " || ' ' || ".join(f"t[i + {j}]" for j in range(5))
    return f"""
    gl AS (SELECT {id_col} AS doc_id, line
           FROM (SELECT {id_col}, unnest(string_split({text_col}, chr(10))) AS line
                 FROM {table})
           WHERE length(trim(line)) > 0),
    gls AS (SELECT doc_id,
                   avg(CASE WHEN regexp_matches(line, '{BULLET_RE}')
                       THEN 1.0e0 ELSE 0.0e0 END) AS bullet_line_frac,
                   avg(CASE WHEN regexp_matches(line, '{ELLIPSIS_RE}')
                       THEN 1.0e0 ELSE 0.0e0 END) AS ellipsis_line_frac
            FROM gl GROUP BY doc_id),
    glc AS (SELECT doc_id, line, count(*) AS c FROM gl GROUP BY doc_id, line),
    gld AS (SELECT doc_id,
                   (sum(c) - count(*)) * 1.0e0 / sum(c) AS dup_line_frac,
                   sum((c - 1) * length(line)) * 1.0e0
                       / sum(c * length(line)) AS dup_line_char_frac
            FROM glc GROUP BY doc_id),
    gt AS (SELECT {id_col} AS doc_id, {toks} AS t,
                  greatest(length({text_col}), 1) AS tl
           FROM {table}),
    gw AS (SELECT doc_id, unnest(t) AS w FROM gt),
    gws AS (SELECT doc_id, avg(length(w)) AS mean_word_len,
                   avg(CASE WHEN regexp_matches(w, '[a-z]')
                       THEN 1.0e0 ELSE 0.0e0 END) AS alpha_word_frac
            FROM gw GROUP BY doc_id),
    g2 AS (SELECT doc_id, {big} AS g, tl
           FROM gt, UNNEST(range(1, greatest(len(t), 1))) AS r(i)
           WHERE len(t) >= 2 AND i <= len(t) - 1),
    g2c AS (SELECT doc_id, g, count(*) AS c, any_value(tl) AS tl
            FROM g2 GROUP BY doc_id, g),
    g2t AS (SELECT doc_id, c * length(g) * 1.0e0 / tl AS top2gram_char_frac
            FROM (SELECT *, row_number() OVER
                      (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
                  FROM g2c)
            WHERE rn = 1),
    g5x AS (SELECT doc_id, {g5} AS g, tl
            FROM gt, UNNEST(range(1, greatest(len(t) - 3, 1))) AS r(i)
            WHERE len(t) >= 5 AND i <= len(t) - 4),
    g5c AS (SELECT doc_id, g, count(*) AS c, any_value(tl) AS tl
            FROM g5x GROUP BY doc_id, g),
    g5d AS (SELECT doc_id,
                   least(1.0e0, sum(CASE WHEN c > 1 THEN c * length(g)
                                    ELSE 0 END) * 1.0e0 / any_value(tl))
                       AS dup5gram_char_frac
            FROM g5c GROUP BY doc_id),
    gq AS (SELECT d.{id_col} AS doc_id,
                  coalesce(gld.dup_line_frac, 0.0e0) AS dup_line_frac,
                  coalesce(gld.dup_line_char_frac, 0.0e0) AS dup_line_char_frac,
                  coalesce(gls.bullet_line_frac, 0.0e0) AS bullet_line_frac,
                  coalesce(gls.ellipsis_line_frac, 0.0e0) AS ellipsis_line_frac,
                  coalesce(gws.mean_word_len, 0.0e0) AS mean_word_len,
                  coalesce(gws.alpha_word_frac, 0.0e0) AS alpha_word_frac,
                  coalesce(g2t.top2gram_char_frac, 0.0e0) AS top2gram_char_frac,
                  coalesce(g5d.dup5gram_char_frac, 0.0e0) AS dup5gram_char_frac
           FROM {table} d
           LEFT JOIN gld USING (doc_id) LEFT JOIN gls USING (doc_id)
           LEFT JOIN gws USING (doc_id) LEFT JOIN g2t USING (doc_id)
           LEFT JOIN g5d USING (doc_id))
    """
