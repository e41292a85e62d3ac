"""DSIR-style data selection: hashed n-gram importance weights.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169): estimate bag-of-
hashed-ngram unigram+bigram distributions for a TARGET domain and the
RAW source corpus, score every source document by its importance
log-ratio sum_g log(p_target(bucket(g)) / p_source(bucket(g))), and
keep the top-weighted documents (the paper resamples with Gumbel
noise; the deterministic top-k variant here is reproducible on any
cluster, which is what a production pipeline wants).

Scale shape: everything is Catalyst — tokenize/bigram with JVM array
functions, hash-bucket counts are two ordinary groupBy aggregations
(map-side combined, at most n_buckets rows each), and scoring is one
broadcast join of the tiny bucket tables onto the exploded gram
stream + an integer sum per doc.  No Python stage, no shuffle wider
than (doc_id) for the final sum.

Cross-engine determinism: buckets are the first two hex chars of
md5(gram) (portable to any engine with md5, like
dedup._decision_hash); per-gram log-ratios are integerized
(floor(1e6 * (ln pt - ln ps) + 0.5) as int64) BEFORE the per-doc sum,
so document scores are exact order-independent integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256  # two hex chars of md5
ALPHA = 0.5  # add-alpha smoothing


def _grams(text_col) -> object:
    """Unigrams + bigrams of the whitespace tokens (the paper's
    hashed feature set) as one array column."""
    toks = F.split(text_col, " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def _bucket(gram_col) -> object:
    return F.substring(F.md5(gram_col), 1, 2)


def bucket_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(bucket, cnt): hashed-gram counts for one corpus — at most
    N_BUCKETS rows, an ordinary map-side-combined aggregation."""
    return (
        docs.select(F.explode(_grams(F.col(text_col))).alias("g"))
        .select(_bucket(F.col("g")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_scores(
    source_docs: DataFrame,
    target_counts: DataFrame,
    source_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score_e6): integerized DSIR importance weight per source
    document.  The two count frames are tiny (<= N_BUCKETS rows) and
    broadcast; ln of the smoothed probabilities is evaluated on
    exact-rounded doubles so both engines see identical inputs."""
    t_tot = target_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    s_tot = source_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    denom_t = float(t_tot) + ALPHA * N_BUCKETS
    denom_s = float(s_tot) + ALPHA * N_BUCKETS

    buckets = (
        target_counts.select("bucket", F.col("cnt").alias("t_cnt"))
        .join(
            source_counts.select("bucket", F.col("cnt").alias("s_cnt")),
            "bucket",
            "full",
        )
        .select(
            "bucket",
            F.floor(
                (
                    F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(ALPHA))
                          / F.lit(denom_t))
                    - F.log((F.coalesce(F.col("s_cnt"), F.lit(0)) + F.lit(ALPHA))
                            / F.lit(denom_s))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("lr_e6"),
        )
    )
    grams = source_docs.select(
        F.col(id_col), F.explode(_grams(F.col(text_col))).alias("g")
    ).select(id_col, _bucket(F.col("g")).alias("bucket"))
    return (
        grams.join(F.broadcast(buckets), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lr_e6").alias("score_e6"))
    )


def dsir_select(
    source_docs: DataFrame,
    target_docs: DataFrame,
    top_k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score_e6, rank): the top_k source documents most like the
    target domain — deterministic (ties break on id), layout-
    independent.  A per-partition pre-cut (same (score desc, id)
    total order) bounds the single-partition global window to
    partitions * top_k rows, so no task ever funnels the whole
    corpus's scores."""
    scores = importance_scores(
        source_docs,
        bucket_counts(target_docs, text_col),
        bucket_counts(source_docs, text_col),
        id_col,
        text_col,
    )
    order = [F.desc("score_e6"), F.asc(id_col)]
    wp = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    pre = (
        scores.withColumn("__pr", F.row_number().over(wp))
        .where(F.col("__pr") <= top_k)
        .drop("__pr")
    )
    w = Window.orderBy(*order)
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "score_e6", "rank")
    )
