"""Approximate / exact nearest-neighbor search over an embedding
column (ARRAY<FLOAT>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the full corpus; one narrow pass + per-query top-k via window.
All math is JVM-side (zip_with/aggregate in doubles, left-to-right),
which also makes it bit-reproducible against the DuckDB oracle.

Scale path: LSH bucketing via signed random projections (the SimHash
of the embedding): hash = sign bits against fixed pseudo-random
hyperplanes -> candidates share >= 1 band -> exact re-rank.  The
expensive cross product never materializes; the shuffle key is the
bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.rounding import round6
from osm2pgsql_spark.functions.similarity import minhash_params


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim) — exact cosine top-k.

    queries is expected small (broadcast); corpus streams through one
    stage, per-query top-k via window over (query_id)."""
    # norms are per-ROW: compute them on each side BEFORE the cross
    # join, so each of the |q| x |corpus| pairs pays one zip_with dot
    # instead of dot + two norm re-aggregations (~3x array work; the
    # lsh_topk hoist).  Identical IEEE values — same sqrt(sum(x^2))
    # left-to-right fold, evaluated once per row instead of per pair.
    def _norm(col):
        return F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        ))

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        _norm(F.col(vec_col)).alias("nn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.when((F.col("qn") > 0) & (F.col("nn") > 0),
                   dot / (F.col("qn") * F.col("nn"))).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round6(F.col("sim")).alias("sim"))
    )


def rp_bucket_components(n_bits: int, dim: int, seed: int = 7) -> list[list[float]]:
    """[bit] -> dim-length +-1.0 hyperplane for the single-bucket RP
    hash (deterministic from the shared LCG; a DuckDB oracle can embed
    the identical literals)."""
    params = minhash_params(n_bits * dim, seed)
    return [
        [1.0 if params[b * dim + d][0] % 2 == 0 else -1.0 for d in range(dim)]
        for b in range(n_bits)
    ]


def random_projection_buckets(
    df: DataFrame,
    n_bits: int = 16,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket BIGINT): sign-of-dot-product LSH against n_bits
    fixed pseudo-random hyperplanes (deterministic +-1 components from
    the shared LCG).

    Computed by the Arrow band-signature kernel (one band of n_bits
    bits) rather than n_bits zip_with/aggregate expressions: the
    literal hyperplanes made the Catalyst tree ~800 nodes, and per-run
    PLANNING dominated execution 4:1 (measured: 1.9s fresh-plan vs
    0.7s reused-plan for the sf0.1 gate; kernel execution itself is
    ~0.1s).  The kernel folds dims sequentially, so bucket values stay
    bit-identical to the aggregate form and the DuckDB list_sum
    oracle."""
    comps_by_bit = rp_bucket_components(n_bits, dim, seed)
    sig_udf = _band_sigs_kernel([comps_by_bit])
    return df.select(
        F.col(id_col), F.col(vec_col),
        F.element_at(sig_udf(F.col(vec_col)), 1).alias("bucket"),
    )


def rp_band_components(
    n_bands: int, bits_per_band: int, dim: int, seed: int = 7
) -> list[list[list[float]]]:
    """[band][bit] -> dim-length +-1.0 hyperplane, deterministic from
    the shared LCG so a DuckDB oracle can embed the same literals."""
    params = minhash_params(n_bands * bits_per_band * dim, seed)
    return [
        [
            [
                1.0 if params[(b * bits_per_band + j) * dim + d][0] % 2 == 0 else -1.0
                for d in range(dim)
            ]
            for j in range(bits_per_band)
        ]
        for b in range(n_bands)
    ]


def _band_sigs_kernel(comps: list[list[list[float]]]):
    """Arrow-batched band signatures: ALL bands' sign-bit buckets in
    one corpus pass.  The dot products accumulate SEQUENTIALLY over
    the dimension axis (vectorized across rows/planes), which is the
    exact left-to-right double fold of the JVM aggregate() path and of
    DuckDB's list_sum — bit-identical oracle parity is preserved while
    the per-row higher-order-function overhead (the former hot spot:
    ~25us/row/band, CodegenFallback) disappears."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_bands = len(comps)
    bits = len(comps[0])
    dim = len(comps[0][0])
    # planes matrix [dim, n_bands*bits]
    planes = np.asarray(
        [[comps[b][j][d] for b in range(n_bands) for j in range(bits)]
         for d in range(dim)],
        dtype="f8",
    )
    weights = np.asarray(
        [np.float64(1 << j) for _ in range(n_bands) for j in range(bits)]
    )

    def kernel(vecs):
        m = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        if m.size == 0:
            return pd.Series([], dtype=object)
        acc = np.zeros((m.shape[0], planes.shape[1]))
        for d in range(dim):  # sequential over dims = exact fold order
            acc += m[:, d, None] * planes[d, None, :]
        sig_bits = np.where(acc > 0, weights[None, :], 0.0).astype("int64")
        sigs = sig_bits.reshape(m.shape[0], n_bands, bits).sum(axis=2)
        return pd.Series(list(sigs))

    # asNondeterministic: the derived band/bucket column becomes a join
    # key, and the pushed isnotnull filter (lsh_topk both sides) or
    # InferFiltersFromGenerate's size guard (posexplode in
    # rp_near_dup_pairs) otherwise duplicates the dim x planes matmul
    # below its own output filter (guide §4.4;
    # plans/r14/ann_lsh_topk_before.txt showed 4 evals for 2).
    return pandas_udf(kernel, "array<bigint>").asNondeterministic()


def rp_near_dup_pairs(
    vecs: DataFrame,
    threshold: float,
    n_bands: int = 12,
    bits_per_band: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, sim) — cosine near-dup pairs via multi-band random
    projection candidates + exact verification.  NOTE: calling this
    function EXECUTES the candidate pipeline (signature kernel + band
    self-join + distinct) eagerly via localCheckpoint before returning
    the lazy result — construction triggers Spark jobs.  The
    checkpointed blocks are executor-local (not fault-tolerant): on a
    cluster, an executor loss after lineage truncation fails the job
    and the caller must re-invoke.  persist() would keep lineage but
    pins storage in the CacheManager forever (this API has no
    unpersist point); checkpoint blocks are reclaimed by the
    ContextCleaner when the frame is unreferenced.  The 100 TB shape:
    the only corpus-sized shuffle is the (band, sig) equi-join; the
    cross product never materializes.  Recall < 1 by construction
    (sign-LSH misses some borderline pairs); a probe with the same
    bands is the oracle twin, and the brute-force all-pairs form is
    the small-scale recall baseline.

    Parameter scaling: candidate volume per band is ~n^2/2^bits, so
    bits_per_band must grow with corpus density — the 8/12 default
    keeps near-dup recall high (>=0.98 at cos 0.9) while candidates
    stay ~n^2/256 per band instead of the near-quadratic blowup a
    4-bit band produces on anything bigger than a toy corpus."""
    comps = rp_band_components(n_bands, bits_per_band, dim, seed)
    base = vecs.select(F.col(id_col), F.col(vec_col))
    sig_udf = _band_sigs_kernel(comps)
    allb = base.select(
        F.col(id_col), F.posexplode(sig_udf(F.col(vec_col))).alias("band", "sig")
    )
    a = allb.select(F.col(id_col).alias("id_a"), "band", "sig")
    bb = allb.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        a.join(bb, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # materialize once: the candidate pipeline (signature kernel +
        # band self-join + distinct) feeds TWO broadcast subtrees below,
        # and broadcast exchanges of different projections share nothing
        # — without this the whole pipeline executes twice per action
        # (verified_near_dups uses the same eager-localCheckpoint
        # pattern; blocks are reclaimed by the ContextCleaner)
        .localCheckpoint()
    )
    # candidates << corpus: broadcast ONLY the bare id pairs into the
    # two vector joins so the embedding table streams shuffle-free
    # (verified_near_dups shape).  The hint must never wrap a relation
    # carrying embeddings — candidate pairs are O(corpus) on a
    # dup-heavy input and candidates x 64 floats would OOM executors.
    # The final pair-up joins two candidate-sized sides without a hint;
    # AQE picks the strategy from real sizes.
    # norms are per-ROW (brute_force_topk hoist, guide §2.3): each
    # verified pair pays one zip_with dot instead of dot + two norm
    # re-aggregations.  Identical IEEE values — same sqrt(sum(x^2))
    # left-to-right fold, evaluated once per row instead of per pair.
    def _norm(col):
        return F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        ))

    va = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    ).join(F.broadcast(cand), "id_a")
    vb = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    ).join(F.broadcast(cand.select("id_b").distinct()), "id_b")
    j = va.join(vb, ["id_b"])
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    sim = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0), dot / (F.col("na") * F.col("nb"))
    ).otherwise(F.lit(0.0))
    return (
        j.withColumn("sim", sim)
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", round6(F.col("sim")).alias("sim"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: join on LSH bucket, exact re-rank within
    bucket.  Recall < 1.0 by construction; use brute_force_topk as the
    correctness baseline."""
    cb = random_projection_buckets(corpus, n_bits, dim, id_col=id_col, vec_col=vec_col)
    qb = random_projection_buckets(queries, n_bits, dim, id_col=id_col, vec_col=vec_col)

    # norms are per-ROW, so compute them before the bucket join: the
    # per-candidate cosine then costs one zip_with dot instead of
    # dot + two norm re-aggregations per pair (~3x array work saved;
    # identical IEEE values — same sqrt(sum(x^2)) expression, just
    # evaluated once per row)
    def norm_of(col):
        return F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        ))

    q = qb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket",
        norm_of(F.col(vec_col)).alias("qn"),
    )
    c = cb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket",
        norm_of(F.col(vec_col)).alias("nn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.when((F.col("qn") > 0) & (F.col("nn") > 0),
                   dot / (F.col("qn") * F.col("nn"))).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round6(F.col("sim")).alias("sim"))
    )
