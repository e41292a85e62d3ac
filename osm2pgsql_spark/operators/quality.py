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

Every signal is PER-DOCUMENT, so none of them needs a shuffle:
they are computed as pure Catalyst array expressions (split / filter
/ transform / aggregate over the row's own line/token arrays), one
scan, zero exchanges, embarrassingly parallel — the right plan at
100 TB, where exploding grams across the cluster to count them per
doc would shuffle the whole corpus for nothing.  Per-row cost is
O(distinct_grams * n_tokens) string compares in whole-stage codegen,
bounded by document length.  Each signal has a bit-matching DuckDB
oracle (gopher_oracle_ctes) wired into the text_stats gate.

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


def _fsum(arr, fn):
    """Sum fn(x) over an array column as doubles (per-row)."""
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + fn(x).cast("double")
    )


def _run_fold(sorted_arr, per_run, init=0.0):
    """Fold a SORTED string array into a double by run-length
    encoding in one pass: per_run(gram, count) is accumulated once
    per distinct value.  state = (prev, run_count, acc); the finish
    lambda closes the last run.  O(n) per row, and the array
    expression is referenced exactly once (repeated references would
    re-materialize the whole subtree per fold step after Catalyst's
    projection collapsing — the quadratic-tree trap)."""
    state = F.struct(
        F.lit("").alias("p"),
        F.lit(0).cast("long").alias("c"),
        F.lit(float(init)).alias("a"),
    )

    def merge(acc, x):
        closed = acc["a"] + per_run(acc["p"], acc["c"])
        return F.when(
            x == acc["p"],
            F.struct(acc["p"].alias("p"), (acc["c"] + 1).alias("c"),
                     acc["a"].alias("a")),
        ).otherwise(
            F.struct(x.alias("p"), F.lit(1).cast("long").alias("c"),
                     closed.alias("a"))
        )

    return F.aggregate(
        sorted_arr, state, merge,
        lambda acc: acc["a"] + per_run(acc["p"], acc["c"]),
    )


def gopher_exprs(text_col) -> dict:
    """The eight signals as plain column expressions over one text
    column — compose them into any projection; no shuffle, no join."""
    lines = F.filter(
        F.split(text_col, "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    nl = F.size(lines).cast("double")
    toks = _clean_tokens(text_col)
    nt = F.size(toks).cast("double")
    tl = F.greatest(F.length(text_col), F.lit(1)).cast("double")

    def gram_array(n: int):
        # sliding window as zip_with over n shifted slices: each slice
        # materializes the token array ONCE (an element_at(toks, i+j)
        # inside a transform lambda would re-evaluate the split per
        # ELEMENT — O(n^2) splits per row, the quadratic-tree trap)
        cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        g = F.slice(toks, 1, cnt)
        for j in range(1, n):
            g = F.zip_with(
                g, F.slice(toks, j + 1, cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return g

    g2, g5 = gram_array(2), gram_array(5)

    def zero_if(cond, val):
        return F.when(cond, F.lit(0.0)).otherwise(val)

    def dup_chars(g, c):
        # chars in runs occurring more than once (0 for the "" seed)
        return F.when(c > 1, c * F.length(g)).otherwise(F.lit(0)).cast("double")

    # top word-2-gram by (count desc, gram asc): runs arrive in
    # ascending gram order, so a strictly-greater count comparison
    # keeps the lexicographically-first gram on ties.  The fold packs
    # (best_c, best_g) into the accumulator string to keep the state
    # struct shared with _run_fold's shape-free double accumulator —
    # instead, use a dedicated struct fold here.
    def top2_pick():
        state = F.struct(
            F.lit("").alias("p"),
            F.lit(0).cast("long").alias("c"),
            F.lit(0).cast("long").alias("bc"),
            F.lit("").alias("bg"),
        )

        def close(acc):
            better = (acc["c"] > acc["bc"]) & (acc["p"] != F.lit(""))
            return (
                F.when(better, acc["c"]).otherwise(acc["bc"]),
                F.when(better, acc["p"]).otherwise(acc["bg"]),
            )

        def merge(acc, x):
            nbc, nbg = close(acc)
            return F.when(
                x == acc["p"],
                F.struct(acc["p"].alias("p"), (acc["c"] + 1).alias("c"),
                         acc["bc"].alias("bc"), acc["bg"].alias("bg")),
            ).otherwise(
                F.struct(x.alias("p"), F.lit(1).cast("long").alias("c"),
                         nbc.alias("bc"), nbg.alias("bg"))
            )

        def finish(acc):
            nbc, nbg = close(acc)
            return nbc * F.length(nbg) / tl

        return F.when(F.size(g2) == 0, F.lit(0.0)).otherwise(
            F.aggregate(F.array_sort(g2), state, merge, finish)
        )

    return {
        "dup_line_frac": zero_if(
            nl == 0, (nl - F.size(F.array_distinct(lines))) / nl
        ),
        "dup_line_char_frac": zero_if(
            nl == 0,
            _run_fold(
                F.array_sort(lines),
                lambda g, c: F.when(c > 1, (c - 1) * F.length(g))
                .otherwise(F.lit(0)).cast("double"),
            )
            / F.greatest(_fsum(lines, F.length), F.lit(1.0)),
        ),
        "bullet_line_frac": zero_if(
            nl == 0, _fsum(lines, lambda l: l.rlike(BULLET_RE).cast("int")) / nl
        ),
        "ellipsis_line_frac": zero_if(
            nl == 0,
            _fsum(lines, lambda l: l.rlike(ELLIPSIS_RE).cast("int")) / nl,
        ),
        "mean_word_len": zero_if(nt == 0, _fsum(toks, F.length) / nt),
        "alpha_word_frac": zero_if(
            nt == 0, _fsum(toks, lambda w: w.rlike("[a-z]").cast("int")) / nt
        ),
        "top2gram_char_frac": top2_pick(),
        "dup5gram_char_frac": F.when(F.size(g5) == 0, F.lit(0.0)).otherwise(
            F.least(F.lit(1.0), _run_fold(F.array_sort(g5), dup_chars) / tl)
        ),
    }


def gopher_signals(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc signal frame: one row per input doc, all signals
    null-free (docs with no lines/words get 0.0)."""
    exprs = gopher_exprs(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[v.alias(k) for k, v in exprs.items()],
    )


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
