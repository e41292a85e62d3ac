"""Corpus n-gram language-model scoring (CCNet-style quality signal).

Training-data pipelines filter documents by LM perplexity (CCNet,
Wenzek et al. 2020); the distributed re-expression is two hash
aggregations and two equi-joins — no model file, no Python in the
row path:

  1. explode each doc into character trigrams (one JVM-side
     transform+explode; L-2 rows per doc);
  2. model = trigram counts (corpus-scale groupBy, map-side partial
     agg) and context counts (sum of trigram counts per 2-char
     prefix — proper conditional: sums to 1 per context);
  3. score = avg ln P(c3 | c1 c2) per doc via two equi-joins back to
     the trigram stream; perplexity = exp(-avg).

At 100 TB the model tables are vocabulary-bounded (<= |charset|^3
rows) so the scoring joins broadcast; the only corpus-scale shuffles
are the count groupBys — the same shape as the MinHash shingle
aggregation.  Scoring-against-own-corpus needs no smoothing (every
observed trigram is in the model); score_against lets a cleaner
reference corpus train the model, with add-one smoothing over the
reference vocabulary for unseen grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_trigrams(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, g3) — one row per character-trigram position.
    substring(col, pos, len) needs a literal pos in the column API,
    so the positional form goes through expr()."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(
                F.length(text_col) >= 3,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - 2),"
                    f" i -> substring({text_col}, i, 3))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g3"),
    )


def trigram_model(tri: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(trigram counts, context counts): c3 per gram, c2 per 2-char
    prefix (the sum of its trigram counts)."""
    m3 = tri.groupBy("g3").agg(F.count(F.lit(1)).alias("c3"))
    m2 = (
        m3.groupBy(F.substring("g3", 1, 2).alias("p2"))
        .agg(F.sum("c3").alias("c2"))
    )
    return m3, m2


def perplexity3(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tri, ppl3): char-trigram perplexity of each doc
    against the corpus's own LM.  Docs shorter than 3 chars have no
    trigrams -> NULL ppl3."""
    tri = char_trigrams(docs, id_col, text_col)
    m3, m2 = trigram_model(tri)
    scored = (
        tri.join(m3, "g3")
        .join(m2, F.substring("g3", 1, 2) == F.col("p2"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.avg(F.log(F.col("c3") / F.col("c2"))).alias("lp"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.exp(-F.col("lp")).alias("ppl3"),
        )
    )


def score_against(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity of `docs` under an LM trained on `reference` (the
    CCNet setup: a clean corpus scores a noisy one).  Unseen grams get
    add-one smoothing over the reference trigram vocabulary."""
    ref_tri = char_trigrams(reference, id_col, text_col)
    m3, m2 = trigram_model(ref_tri)
    vocab = m3.count()
    tri = char_trigrams(docs, id_col, text_col)
    scored = (
        tri.join(m3, "g3", "left")
        .join(m2, F.substring("g3", 1, 2) == F.col("p2"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.avg(
                F.log(
                    (F.coalesce(F.col("c3"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c2"), F.lit(0)) + float(vocab))
                )
            ).alias("lp"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.exp(-F.col("lp")).alias("ppl3"),
        )
    )
