"""Training-data curation stages: classifier-based quality filtering,
GPT-style sequence packing, CCNet-style perplexity bucketing.

Three pipeline stages every large-scale LLM data build runs between
dedup and tokenization, each expressed scale-first:

- **hashed_linear_score** — fastText-shaped classifier INFERENCE: a
  linear model over hashed bag-of-words features.  The score is a
  per-row array fold (F.aggregate over the token array), so the whole
  stage is one shuffle-free projection — the same rewrite that took
  the Gopher signals from 7 exchanges to 0 (operators/quality.py).
  Weights are a pure integer function of the hashed feature index, so
  the scores are exact int64s and reproduce bit-for-bit in any engine
  (the DuckDB gate twin); swapping in real trained weights is a
  broadcast map lookup with the same plan shape.

- **pack_sequences** — the GPT training-data packing: concatenate
  documents in a deterministic order and chop the token stream into
  fixed windows.  The naive plan is one global cumulative-sum window
  (single task at planet scale).  This runs the distributed
  prefix-sum instead: per-bucket token sums (tiny frame) -> window
  over 256 bucket rows assigns each bucket its global offset ->
  broadcast join + per-bucket window finishes each document's exact
  global offset.  The portable order (md5 hex, key) makes the bucket
  (first two hex chars) a PREFIX of the order, so one single-window
  cumsum over (md5, key) is an exact cross-engine twin — the same
  equivalence token_budget_mixture documents (operators/dedup.py).

- **rank_by_value / ccnet buckets** — CCNet (Wenzek et al. 2020,
  arXiv:1911.00359) splits a corpus into head/middle/tail by
  per-document LM perplexity terciles.  Exact global rank without a
  global sort: coarse histogram on floor(value) (an ordinary hash
  agg), prefix-sum the tiny histogram, broadcast the offsets, finish
  with a per-coarse-bucket window — rank = offset + within-bucket
  row_number, total-ordered by (value, key).  Bucket k of n rows is
  floor((rank-1) * k / n) (an explicit formula on both engines — SQL
  NTILE distributes remainders differently and is avoided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import similarity as S

# weight-generator constants (Knuth multiplicative hash spread over an
# odd modulus, centered): w(idx) = (idx * WA) % WM - (WM - 1) / 2,
# an exact int64 in [-1e6, 1e6] on any engine
_WA = 2654435761
_WM = 2000001
_WC = (_WM - 1) // 2


def _weight(tok):
    idx = S.hash32(tok)
    return (idx % F.lit(_WM) * F.lit(_WA)) % F.lit(_WM) - F.lit(_WC)


def hashed_linear_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_scored_tokens, score_e6, is_kept): linear classifier
    score = sum over tokens of w(hash32(token)); keep rule score > 0.
    One shuffle-free projection (fold over the token array).  NULL
    text scores as an empty document — (0, 0, false), matching the
    SQL twin's coalesced semantics."""
    toks = F.filter(
        S.tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda t: t != F.lit(""),
    )
    d = docs.withColumn("__t", toks)
    score = F.aggregate(
        F.col("__t"),
        F.lit(0).cast("long"),
        lambda acc, t: acc + _weight(t),
    )
    return d.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_scored_tokens"),
        score.alias("score_e6"),
        (score > 0).alias("is_kept"),
    )


def hashed_linear_score_sql(text_col: str = "text") -> tuple[str, str]:
    """(score_sql, n_tokens_sql): the per-row score as DuckDB scalar
    SQL (the gate twin).  NULL text coalesces to the empty document,
    like the operator."""
    coalesced = "coalesce({}, '')".format(text_col)
    toks = f"list_filter({S.tokens_sql(coalesced)}, t -> t <> '')"
    w = f"(({S.hash32_sql('t')}) % {_WM} * {_WA}) % {_WM} - {_WC}"
    return (
        f"coalesce(list_sum(list_transform({toks}, t -> {w})), 0)",
        f"coalesce(len({toks}), 0)",
    )


def pack_sequences(
    docs: DataFrame,
    window: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """(key, n_tokens, offset, pack_id, pack_offset): each document's
    position in the concatenated token stream under the deterministic
    portable order (md5(key || salt) hex, key), chopped into
    `window`-token training sequences.  offset is the exact global
    prefix sum of earlier documents' tokens — computed with the
    two-phase distributed prefix sum (module docstring), no global
    window."""
    from osm2pgsql_spark.operators.dedup import _decision_hash

    h = _decision_hash(key_col, salt, True)
    d = docs.withColumn("__h", h).withColumn("__b", F.substring("__h", 1, 2))
    coarse = d.groupBy("__b").agg(F.sum(token_col).alias("__bsum"))
    wofs = Window.orderBy("__b")
    coarse = coarse.withColumn(
        "__ofs",
        F.coalesce(
            F.sum("__bsum").over(
                wofs.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__b", "__ofs")
    wfine = Window.partitionBy("__b").orderBy(F.asc("__h"), F.asc(key_col))
    j = d.join(F.broadcast(coarse), "__b")
    offset = (
        F.col("__ofs")
        + F.sum(token_col).over(wfine)
        - F.col(token_col)
    ).cast("long")
    return (
        j.withColumn("offset", offset)
        .select(
            F.col(key_col),
            F.col(token_col).cast("long").alias("n_tokens"),
            "offset",
            F.floor(F.col("offset") / window).cast("long").alias("pack_id"),
            (F.col("offset") % window).cast("long").alias("pack_offset"),
        )
    )


def rank_by_value(
    df: DataFrame,
    value_col: str,
    key_col: str,
) -> DataFrame:
    """df + `rank` (1-based, total order (value, key)) via the
    coarse-histogram distributed rank — no global sort, no global
    window.  NULL values must be filtered by the caller (engines
    disagree on NULL placement in ORDER BY)."""
    d = df.withColumn("__cb", F.floor(F.col(value_col)).cast("long"))
    coarse = d.groupBy("__cb").agg(F.count(F.lit(1)).alias("__c"))
    wofs = Window.orderBy("__cb")
    coarse = coarse.withColumn(
        "__ofs",
        F.coalesce(
            F.sum("__c").over(wofs.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("__cb", "__ofs")
    wfine = Window.partitionBy("__cb").orderBy(
        F.asc(value_col), F.asc(key_col)
    )
    return (
        d.join(F.broadcast(coarse), "__cb")
        .withColumn(
            "rank", (F.col("__ofs") + F.row_number().over(wfine)).cast("long")
        )
        .drop("__cb", "__ofs")
    )


def ccnet_buckets(
    scored: DataFrame,
    value_col: str = "ppl3",
    key_col: str = "doc_id",
    k: int = 3,
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style k-cile bucketing by ascending `value_col`:
    (key, value, rank, bucket) with bucket = labels[floor((rank-1) *
    k / n)].  Low perplexity = head (the highest-quality slice)."""
    from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt

    # the scored frame fans out three ways below (coarse histogram,
    # fine rank join, total count) — materialize it once so an
    # expensive upstream (e.g. the trigram LM) isn't re-evaluated per
    # branch (stats-stripped checkpoint, the repo's standard cut)
    ranked = rank_by_value(
        _ckpt(scored.where(F.col(value_col).isNotNull())),
        value_col, key_col,
    )
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    lab = F.array(*[F.lit(x) for x in labels])
    return (
        ranked.join(F.broadcast(n))
        .withColumn(
            "__bi", F.floor((F.col("rank") - 1) * k / F.col("__n")).cast("int")
        )
        .select(
            key_col,
            value_col,
            "rank",
            F.element_at(lab, F.col("__bi") + 1).alias("bucket"),
        )
    )
