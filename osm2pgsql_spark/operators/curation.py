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
  over the 16^width bucket rows assigns each bucket its global offset
  -> broadcast join + per-bucket window finishes each document's
  exact global offset.  The portable order (md5 hex, key) makes the
  bucket (the md5's first `bucket_hex_width` hex chars) a PREFIX of
  the order, so one single-window cumsum over (md5, key) is an exact
  cross-engine twin at ANY width — the same equivalence
  token_budget_mixture documents (operators/dedup.py).

- **rank_by_value / ccnet buckets** — CCNet (Wenzek et al. 2020,
  arXiv:1911.00359) splits a corpus into head/middle/tail by
  per-document LM perplexity terciles.  Exact global rank without a
  global sort: coarse histogram on an adaptively scaled floor
  (floor(value * 2^k), k from a min/max probe; heavy buckets re-split
  at finer scale — _rank_buckets), prefix-sum the tiny histogram,
  broadcast the offsets, finish with a per-coarse-bucket window —
  rank = offset + within-bucket row_number, total-ordered by
  (value, key).  Bucket k of n rows is floor((rank-1) * k / n) (an
  explicit formula on both engines — SQL NTILE distributes remainders
  differently and is avoided).
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

# NULL group names coalesce to this sentinel inside the unimax
# operators (joins and ORDER BY would otherwise drop / misplace NULL
# rows, engine-dependently); \x00 sorts before any printable group
# name on both engines, and the outputs restore NULL
_NULL_GROUP = "\x00null"


def _restore_null_group(col):
    return F.when(col == F.lit(_NULL_GROUP), F.lit(None)).otherwise(col)


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


# fixed stopword list for the weak-supervision label the demo trainer
# uses (a Gopher-style quality proxy); ANY offline labeler slots in —
# the artifact contract is just (weights: bucket -> int, bias, n_buckets)
_LABEL_STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is",
                    "it", "that")


def train_hashed_linear(
    docs: DataFrame,
    n_buckets: int = 256,
    epochs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 1_000_000,
) -> tuple[dict[int, int], int]:
    """Train a hashed bag-of-words perceptron (integer weights) —
    the offline step that produces a REAL artifact for
    trained_linear_score.  Weak-supervision label: +1 when the doc's
    stopword ratio is at or above the corpus mean (a crude
    fastText-wiki-vs-crawl stand-in).

    Label threshold = the corpus-mean stopword ratio, compared in
    integers (n_stop * sum(n) >= n * sum(n_stop)) so the split is
    exact on any engine.  Deterministic: docs iterate in id order,
    integer perceptron updates (w += label * count on mistakes), so
    retraining reproduces the frozen artifact bit-for-bit
    (test_frozen).  The feature extraction (per-doc hashed bucket
    counts) is distributed; the sequential update loop runs
    driver-side over the collected per-doc sparse counts — training
    data is the small curated set, INFERENCE is the 100-TB path.
    `max_docs` enforces that contract: pointing this at more than
    max_docs documents raises a descriptive error instead of OOMing
    the driver (raise the cap explicitly if you mean it)."""
    toks = F.filter(
        S.tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda t: t != F.lit(""),
    )
    sw = F.array(*[F.lit(w) for w in _LABEL_STOPWORDS])
    d = docs.withColumn("__t", toks).select(
        F.col(id_col).alias("id"),
        F.size("__t").alias("n"),
        F.size(F.filter(F.col("__t"), lambda t: F.array_contains(sw, t)))
        .alias("n_stop"),
        F.transform(
            F.col("__t"), lambda t: (S.hash32(t) % n_buckets).cast("int")
        ).alias("buckets"),
    )
    # probe one row past the cap before collecting the feature rows:
    # the failure mode for a mispointed full corpus is a message, not
    # a driver OOM (docstring contract; r10 VERDICT #5)
    if len(d.select("id").limit(max_docs + 1).take(max_docs + 1)) > max_docs:
        raise ValueError(
            f"train_hashed_linear collects the training set to the "
            f"driver (sequential perceptron) and is capped at "
            f"max_docs={max_docs} documents; this input exceeds the "
            f"cap. Training corpora are small by design — curate "
            f"first, or raise max_docs explicitly if you mean it."
        )
    rows = d.orderBy("id").collect()
    sum_n = sum(r["n"] for r in rows)
    sum_stop = sum(r["n_stop"] for r in rows)
    w: dict[int, int] = {}
    bias = 0
    for _ in range(epochs):
        for r in rows:
            cnt: dict[int, int] = {}
            for b in r["buckets"]:
                cnt[b] = cnt.get(b, 0) + 1
            label = (
                1 if r["n"] > 0 and r["n_stop"] * sum_n >= r["n"] * sum_stop
                else -1
            )
            s = bias + sum(w.get(b, 0) * c for b, c in cnt.items())
            if (1 if s > 0 else -1) != label:
                for b, c in cnt.items():
                    w[b] = w.get(b, 0) + label * c
                bias += label
    return {b: v for b, v in sorted(w.items()) if v != 0}, bias


def trained_linear_score(
    docs: DataFrame,
    weights: dict[int, int],
    n_buckets: int,
    bias: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """hashed_linear_score with a REAL trained artifact: feature index
    = hash32(token) % n_buckets (the fastText hashing trick), weights
    shipped as a Catalyst map literal — plan-broadcast to every task,
    no join, no Exchange (plan-pinned like the synthetic path).
    Integer weights keep scores exact int64 on any engine.

    Scale note: the map literal is O(non-zero buckets) inside the
    plan — fine to ~1e5 entries; past that, ship the weights through
    an Arrow pandas_udf closure (same zero-Exchange shape), never a
    join."""
    wmap = F.create_map(
        *[F.lit(x) for b in sorted(weights) for x in (int(b), int(weights[b]))]
    )
    toks = F.filter(
        S.tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda t: t != F.lit(""),
    )
    d = docs.withColumn("__t", toks)
    score = F.aggregate(
        F.col("__t"),
        F.lit(int(bias)).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(wmap, (S.hash32(t) % n_buckets).cast("int")),
            F.lit(0),
        ).cast("long"),
    )
    return d.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_scored_tokens"),
        score.alias("score_e6"),
        (score > 0).alias("is_kept"),
    )


def trained_linear_score_sql(
    weights: dict[int, int],
    n_buckets: int,
    bias: int = 0,
    text_col: str = "text",
) -> tuple[str, str]:
    """(score_sql, n_tokens_sql): the trained-weights score as DuckDB
    scalar SQL — the weight map becomes a CASE over the hashed bucket
    (evaluated once per token)."""
    coalesced = "coalesce({}, '')".format(text_col)
    toks = f"list_filter({S.tokens_sql(coalesced)}, t -> t <> '')"
    arms = " ".join(
        f"WHEN {int(b)} THEN {int(weights[b])}" for b in sorted(weights)
    )
    w = f"(CASE (({S.hash32_sql('t')}) % {n_buckets}) {arms} ELSE 0 END)"
    return (
        f"({int(bias)} + coalesce(list_sum(list_transform({toks}, t -> {w})), 0))",
        f"coalesce(len({toks}), 0)",
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, start_tok, n_tokens, chunk): sliding-window
    document chunking — the RAG / long-context training prep stage
    that cuts each document into `chunk_tokens`-token windows with
    `overlap` tokens of context carried between consecutive chunks
    (stride = chunk_tokens - overlap).  A trailing partial window is
    kept only when it adds tokens beyond the previous chunk's end
    (i.e. chunk i (i>=1) is emitted iff i*stride + overlap < n) — a
    final window fully contained in its predecessor would duplicate
    content into RAG/training output.  The last emitted chunk always
    reaches the end of the document (if chunk i+1 is dropped then
    i*stride + chunk_tokens >= n), so reconstruction by dropping each
    chunk's overlap prefix is exact.  Empty / NULL documents yield
    zero chunks.

    Scale shape: split -> explode over a per-row sequence -> slice —
    all JVM built-ins, narrow operations only (explode is not a
    shuffle), so the stage is scan-bound at any corpus size and the
    output is partition-aligned with the input for the downstream
    packing join."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+"),
        lambda t: t != F.lit(""),
    )
    d = docs.select(F.col(id_col), toks.alias("__t"))
    n = F.size("__t")
    # chunk starts: 0, stride, 2*stride, ... while the window adds
    # tokens beyond the previous chunk's end (start + overlap < n)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(F.floor((n - overlap - 1) / stride), F.lit(0)) + 1
    ).cast("int")
    # guard the empty case explicitly: F.sequence(0, -1) DESCENDS
    # ([0, -1]) rather than yielding an empty array
    d = d.withColumn(
        "chunk_id",
        F.explode(
            F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1))
            .otherwise(F.array().cast("array<int>"))
        ),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("__t"), start + 1, chunk_tokens)
    return d.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def chunk_documents_sql(
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    relation: str = "documents",
) -> str:
    """DuckDB twin of chunk_documents (same tokenization, same window
    arithmetic; list_slice end is inclusive)."""
    stride = chunk_tokens - overlap
    toks = (
        f"list_filter(string_split_regex(lower(trim(coalesce("
        f"{text_col}, ''))), '\\s+'), t -> t <> '')"
    )
    return f"""
    SELECT {id_col},
           CAST(g.i AS BIGINT) AS chunk_id,
           CAST(g.i * {stride} AS BIGINT) AS start_tok,
           CAST(len(list_slice(toks, g.i * {stride} + 1,
                    g.i * {stride} + {chunk_tokens})) AS BIGINT)
               AS n_tokens,
           array_to_string(list_slice(toks, g.i * {stride} + 1,
                    g.i * {stride} + {chunk_tokens}), ' ') AS chunk
    FROM (SELECT {id_col}, {toks} AS toks FROM {relation}) t,
         LATERAL (SELECT unnest(range(0,
             CASE WHEN len(t.toks) <= 0 THEN 0
                  ELSE greatest((len(t.toks) - {overlap} - 1)
                                // {stride}, 0) + 1 END)) AS i) g
    """


def pack_sequences(
    docs: DataFrame,
    window: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
    bucket_hex_width: int = 2,
) -> DataFrame:
    """(key, n_tokens, offset, pack_id, pack_offset): each document's
    position in the concatenated token stream under the deterministic
    portable order (md5(key || salt) hex, key), chopped into
    `window`-token training sequences.  offset is the exact global
    prefix sum of earlier documents' tokens — computed with the
    two-phase distributed prefix sum (module docstring), no global
    window.

    The fan-out is 16^bucket_hex_width buckets (the md5 prefix is a
    prefix of the order at any width, so the result is
    width-invariant); a fine window sees ~n/16^width rows — planet
    jobs want width 3-4, the default 2 (256 buckets) suits bench
    scale."""
    from osm2pgsql_spark.operators.dedup import _decision_hash

    h = _decision_hash(key_col, salt, True)
    d = docs.withColumn("__h", h).withColumn(
        "__b", F.substring("__h", 1, bucket_hex_width))
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


def unimax_allocation(
    docs: DataFrame,
    total_budget: int,
    group_col: str = "lang",
    token_col: str = "n_tokens",
    max_epochs: int = 1,
) -> DataFrame:
    """(group, avail_tokens, alloc_tokens): UniMax budget allocation
    (Chung et al. 2023, ICLR — "UniMax: Fairer and More Effective
    Language Sampling") — distribute `total_budget` tokens across
    groups as equally as possible, capping each group at
    avail * max_epochs (no group repeats more than max_epochs times).

    The closed-form integer waterfill: sort groups ascending by cap;
    group i is fully allocated (alloc = cap) iff
    prefix(i-1) + cap_i * (n - i + 1) <= B (fullness is a prefix of
    the sorted order because caps ascend); the remaining budget
    R = B - sum(full caps) splits over the n_p partial groups as
    base = R // n_p with the remainder's +1 going to the first R % n_p
    partials in (cap, group) order.  All-integer, window-expressible,
    so the allocation replays exactly in any engine (the gate twin).
    The group frame is tiny (|groups| rows) — the windows here never
    see data volume."""
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    # coalesce: an all-NULL-token group must sort as cap 0 (engines
    # disagree on NULL placement in ORDER BY — NULL caps would break
    # the cross-engine idx assignment).  A NULL group NAME likewise
    # becomes the \x00 sentinel (sorts before any printable name on
    # both engines) so NULL-group rows get a real allocation instead
    # of vanishing through inner joins; the output restores NULL.
    caps = docs.groupBy(
        F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_GROUP))
        .alias("group")
    ).agg(
        F.coalesce(F.sum(token_col), F.lit(0)).cast("long")
        .alias("avail_tokens")
    ).withColumn("__cap", F.col("avail_tokens") * max_epochs)
    w = Window.orderBy("__cap", "group")
    wall = Window.partitionBy()
    g = (
        caps.withColumn("__idx", F.row_number().over(w))
        .withColumn(
            "__pfx",
            F.coalesce(
                F.sum("__cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__full",
            F.col("__pfx")
            + F.col("__cap") * (F.col("__n") - F.col("__idx") + 1)
            <= total_budget,
        )
        .withColumn(
            "__sum_full",
            F.coalesce(
                F.sum(F.when(F.col("__full"), F.col("__cap"))).over(wall),
                F.lit(0),
            ),
        )
        .withColumn(
            "__n_full",
            F.sum(F.col("__full").cast("int")).over(wall),
        )
    )
    # integer floor-div on longs via SQL `div` (no float rounding);
    # greatest(..., 1) totalizes the expression — when every group is
    # full the partial branch is never taken
    base = F.expr(
        f"({int(total_budget)} - __sum_full) div "
        "greatest(__n - __n_full, 1)"
    )
    rem = F.expr(
        f"({int(total_budget)} - __sum_full) % "
        "greatest(__n - __n_full, 1)"
    )
    alloc = F.when(F.col("__full"), F.col("__cap")).otherwise(
        base + (F.col("__idx") - F.col("__n_full") <= rem).cast("long")
    )
    return g.select(
        _restore_null_group(F.col("group")).alias("group"),
        "avail_tokens",
        F.greatest(alloc, F.lit(0)).cast("long").alias("alloc_tokens"),
    )


def unimax_mixture(
    docs: DataFrame,
    total_budget: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_epochs: int = 1,
    salt: str = "",
    bucket_hex_width: int = 2,
) -> DataFrame:
    """(key, group, n_tokens, n_epochs): per-document epoch counts
    realizing the UniMax allocation — group g's alloc_tokens unroll as
    full_epochs = alloc // avail complete passes plus a deterministic
    partial prefix of alloc % avail tokens in the portable (md5, key)
    order; the document crossing the partial boundary is kept (the
    token_budget_mixture convention, so a met budget never
    undershoots).  n_epochs = 0 rows are returned (auditable drops).

    Scale shape is token_budget_mixture's three-way bucket
    classification: per-(group, md5-prefix-bucket) token sums
    (map-side combined) -> a tiny window assigns bucket offsets and
    classifies each bucket as fully-inside / fully-outside the
    partial prefix; ONLY the boundary bucket (at most one per group)
    pays a per-bucket ordered window — so no task ever sees more than
    ~group_tokens/16^bucket_hex_width rows regardless of group skew."""
    from osm2pgsql_spark.operators.dedup import _decision_hash
    from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt

    # the input fans out four ways below (allocation groupBy, coarse
    # bucket sums, the fine join, and the caller usually joins the
    # result back) — checkpoint the NARROW 3-column selection once so
    # a deep upstream lineage isn't re-analyzed/re-run per branch
    # (Catalyst analysis cost is per-referenced-subtree: an un-cut
    # curation pipeline upstream made the analyzer walk minutes-long
    # expression trees; same cut as ccnet_buckets)
    h = _decision_hash(key_col, salt, True)
    base = _ckpt(
        docs.select(
            F.col(key_col),
            # NULL group -> sentinel so the inner joins below keep the
            # rows (restored to NULL in the output select)
            F.coalesce(F.col(group_col).cast("string"),
                       F.lit(_NULL_GROUP)).alias("group"),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
    )
    alloc = unimax_allocation(
        base, total_budget, "group", "n_tokens", max_epochs
    ).withColumn(  # allocation restores NULL at its boundary; re-key
        "group", F.coalesce(F.col("group"), F.lit(_NULL_GROUP))
    )
    d = base.withColumn("__h", h).withColumn(
        "__b", F.substring("__h", 1, bucket_hex_width)
    )
    a = alloc.withColumn(
        "__full_ep",
        F.expr("alloc_tokens div greatest(avail_tokens, 1)").cast("long"),
    ).withColumn(
        "__rem",
        (F.col("alloc_tokens") % F.greatest(F.col("avail_tokens"), F.lit(1)))
        .cast("long"),
    ).select("group", "__full_ep", "__rem")

    coarse = d.groupBy("group", "__b").agg(
        F.sum("n_tokens").alias("__bsum")
    )
    wofs = Window.partitionBy("group").orderBy("__b")
    coarse = coarse.withColumn(
        "__ofs",
        F.coalesce(
            F.sum("__bsum").over(
                wofs.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).join(F.broadcast(a), "group")

    j = d.join(
        F.broadcast(coarse.select("group", "__b", "__bsum", "__ofs",
                                  "__full_ep", "__rem")),
        ["group", "__b"],
    )
    # three mutually exclusive, exhaustive bucket classes.  inside is
    # STRICT (< rem, not <=): in a bucket flush against the boundary a
    # trailing zero-token document ties tokens_before == rem and must
    # resolve by the uniform per-doc rule (tokens_before < rem -> +1),
    # so flush buckets pay the fine window — at most one extra bucket
    # per group
    inside = j.where(F.col("__ofs") + F.col("__bsum") < F.col("__rem"))
    outside = j.where(F.col("__ofs") >= F.col("__rem"))
    wfine = Window.partitionBy("group", "__b").orderBy(
        F.asc("__h"), F.asc(key_col)
    )
    boundary = (
        j.where(
            (F.col("__ofs") < F.col("__rem"))
            & (F.col("__ofs") + F.col("__bsum") >= F.col("__rem"))
        )
        .withColumn("__cum", F.sum("n_tokens").over(wfine))
        .withColumn(
            "__in",
            F.col("__ofs") + F.col("__cum") - F.col("n_tokens")
            < F.col("__rem"),
        )
        .drop("__cum")
    )
    parts = [
        inside.withColumn("__in", F.lit(True)),
        outside.withColumn("__in", F.lit(False)),
        boundary,
    ]
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.select(
        F.col(key_col),
        _restore_null_group(F.col("group")).alias("group"),
        "n_tokens",
        (F.col("__full_ep") + F.col("__in").cast("long"))
        .cast("long")
        .alias("n_epochs"),
    )


def _rank_buckets(
    df: DataFrame,
    value_col: str,
    heavy_threshold: int,
    base_buckets: int,
    fanout: int,
    max_levels: int,
) -> DataFrame:
    """df + `__cb` (int64): a value-monotone bucket id — equal values
    share a bucket, bucket boundaries are a prefix of the value order
    at ANY granularity, so the rank result is bucketing-invariant.

    Adaptive granularity (r9 VERDICT/ADVICE de-skew): a min/max/count
    probe picks a power-of-two scale so floor(value * 2^k) yields
    ~base_buckets buckets over the ACTUAL value range (scores packed
    in [0,1) get a large k instead of one degenerate floor bucket);
    then any bucket whose count exceeds heavy_threshold is re-split at
    fanout× finer scale, up to max_levels rounds — a heavy bucket only
    survives when its values are identical (or closer than the float
    scale cap allows), where order degenerates to the key tie-break
    and no value-based split exists.  Power-of-two scaling is an exact
    float exponent shift, so the bucketing replays bit-identically on
    any engine."""
    import math

    vmin, vmax, n = df.agg(
        F.min(value_col), F.max(value_col), F.count(F.lit(1))
    ).first()
    if n == 0:
        return df.withColumn("__cb", F.lit(0).cast("long"))
    rng = float(vmax) - float(vmin)
    vabs = max(abs(float(vmin)), abs(float(vmax)), 1.0)
    # total scale cap: floor(|v| * 2^k) must stay well inside int64
    kcap = int(61 - math.ceil(math.log2(vabs)))
    k = min(int(round(math.log2(base_buckets / rng))) if rng > 0 else 0, kcap)
    d = df.withColumn(
        "__cb", F.floor(F.col(value_col) * F.lit(2.0 ** k)).cast("long")
    )
    if rng <= 0 or n <= heavy_threshold:
        return d
    lvl_bits = int(math.log2(fanout))
    for _ in range(max_levels):
        if k + lvl_bits > kcap:
            break  # float-granularity cap: remaining heavy ≈ ties
        heavy = (
            d.groupBy("__cb")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > heavy_threshold)
            .select("__cb")
        )
        if heavy.limit(1).count() == 0:
            break
        k += lvl_bits
        d = (
            d.join(
                F.broadcast(heavy.withColumn("__hv", F.lit(True))),
                "__cb", "left",
            )
            .withColumn(
                "__cb",
                F.when(
                    F.col("__hv").isNotNull(),
                    F.floor(F.col(value_col) * F.lit(2.0 ** k)).cast("long"),
                ).otherwise(F.col("__cb") * fanout),
            )
            .drop("__hv")
        )
    return d


def rank_by_value(
    df: DataFrame,
    value_col: str,
    key_col: str,
    heavy_threshold: int = 4_000_000,
    base_buckets: int = 4096,
    fanout: int = 4096,
    max_levels: int = 3,
) -> DataFrame:
    """df + `rank` (1-based, total order (value, key)) via the
    coarse-histogram distributed rank — no global sort, no global
    window.  Buckets come from _rank_buckets (adaptive scaled floor +
    heavy-bucket refinement), so concentrated distributions — scores
    normalized to [0,1), perplexity point masses — still spread across
    tasks; only an exact-tie mass wider than heavy_threshold falls
    back to a single fine window (its order is the key tie-break,
    which no value bucketing can split).  NULL values must be filtered
    by the caller (engines disagree on NULL placement in ORDER BY)."""
    d = _rank_buckets(
        df, value_col, heavy_threshold, base_buckets, fanout, max_levels
    )
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


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    **rank_kwargs,
) -> DataFrame:
    """(q, value): EXACT corpus quantiles — value at rank ceil(q*n)
    in the total order (value, key) — built on the de-skewed
    distributed rank (no global sort, no sampling error like
    approxQuantile).  The training-data use: picking exact keep
    thresholds (perplexity cutoffs, length caps) at corpus scale.
    NULL values must be filtered by the caller."""
    ranked = rank_by_value(df, value_col, key_col, **rank_kwargs)
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    quants = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double")
    targets = quants.join(F.broadcast(n)).select(
        "q", F.ceil(F.col("q") * F.col("__n")).cast("long").alias("rank"))
    return (
        ranked.join(F.broadcast(targets), "rank")
        .select("q", F.col(value_col).cast("double").alias("value"))
    )


def ccnet_buckets(
    scored: DataFrame,
    value_col: str = "ppl3",
    key_col: str = "doc_id",
    k: int = 3,
    labels: tuple = ("head", "middle", "tail"),
    **rank_kwargs,
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
        value_col, key_col, **rank_kwargs,
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
