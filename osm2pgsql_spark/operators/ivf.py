"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding search (alongside the random-
projection LSH in operators/ann.py): a k-means coarse quantizer
partitions the corpus into nlist cells; queries probe only the
nprobe nearest cells and exact-rerank within them.  At 100 TB the
corpus stays partitioned by cell id (the shuffle key), the centroid
table is tiny and broadcast, and search cost drops by ~nlist/nprobe.

k-means runs as Lloyd iterations expressed in DataFrames:
assignment = vectorized numpy matmul in a pandas kernel (k*dim flops
per row), centroid update = posexplode + groupBy(cluster, dim) mean —
both single-shuffle stages.  Deterministic: centroids seed from fixed
ids, iteration count fixed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osm2pgsql_spark.functions.rounding import round6


# Lloyd trainings on corpora at or below this row count run on the
# driver (one collect; ~50 MB at 100k rows x 64 f8 dims) instead of
# paying `iters` sequential corpus-pass jobs — the rivers small-graph
# pattern: data-size-gated, so production-scale corpora always train
# distributed.  Overridable for tests.
_LOCAL_TRAIN_MAX_ROWS = 100_000


def _assign_udf(centroids: np.ndarray):
    """vec -> nearest centroid id by cosine (numpy matmul batch)."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def kernel(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        return pd.Series(np.argmax(sims, axis=1).astype("int64"))

    # asNondeterministic: `cluster` becomes a join key downstream and
    # the inferred isnotnull(cluster) filter otherwise duplicates the
    # k*dim-matmul assignment below its own output filter — the corpus
    # paid two assignment passes per search/build (guide §4.4;
    # plans/r14/ann_ivf_topk_before.txt nodes 10+13).  Pure kernel;
    # the flag only pins single evaluation.
    return pandas_udf(kernel, "bigint").asNondeterministic()


def train_kmeans(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> np.ndarray:
    """Lloyd k-means; returns centroids ndarray[nlist, dim].

    Seeds: the nlist lowest-id vectors (deterministic).

    round_decimals: if set, quantize each updated centroid mean with
    the repo's cross-engine floor-rounding (functions.rounding).  Sums
    of doubles are order-dependent, so Spark's avg() and any oracle
    re-computation differ in the last ulps; rounding the means to a
    coarse grid after every Lloyd round makes the trained centroids
    bit-identical across engines (a determinism knob, not a quality
    one — 1e-6 is far below centroid noise).

    Small corpora train LOCALLY (the rivers small-graph pattern): each
    distributed Lloyd iteration is a full corpus pass + a 64-way dim
    explode + an aggregation + a driver collect, so `iters` sequential
    jobs of pure dispatch overhead dominate when the vectors fit in
    driver memory.  Below _LOCAL_TRAIN_MAX_ROWS the corpus is
    collected once and the SAME math (normalized matmul argmax
    assignment; per-cluster/dim mean; empty clusters keep their
    centroid) runs in numpy.  The grid quantization above is what
    makes this exact: it already absorbs summation-order ulps across
    engines (it is why the DuckDB oracle twin matches), and it
    equally absorbs Spark-avg vs numpy-mean order.  Production-scale
    corpora (the 100 TB case) always take the distributed path — the
    gate is on the data, not the deployment."""
    n_rows = corpus.count()
    if n_rows <= _LOCAL_TRAIN_MAX_ROWS:
        rows = corpus.select(id_col, vec_col).collect()
        rows.sort(key=lambda r: r[0])
        m = np.asarray([np.asarray(r[1], dtype="f8") for r in rows])
        centroids = m[:nlist].copy()
        scale = float(10 ** round_decimals) if round_decimals is not None else None
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        for _ in range(iters):
            c = centroids / np.maximum(
                np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
            )
            clusters = np.argmax(mn @ c.T, axis=1)
            new_c = centroids.copy()
            for cid in np.unique(clusters):
                v = m[clusters == cid].mean(axis=0)
                if scale is not None:
                    v = np.floor(v * scale + 0.5) / scale
                new_c[cid] = v
            centroids = new_c
        return centroids

    seed_rows = (
        corpus.orderBy(id_col).limit(nlist).select(vec_col).collect()
    )
    centroids = np.asarray([np.asarray(r[vec_col], dtype="f8") for r in seed_rows])

    for _ in range(iters):
        assign = _assign_udf(centroids)
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster")
        )
        # centroid update: explode dims -> mean per (cluster, dim)
        exploded = assigned.select(
            "cluster", F.posexplode(vec_col).alias("dim", "val")
        )
        means = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_c = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim"])] = float(r["m"])
        for cid, dims in by_cluster.items():
            for d, v in dims.items():
                if round_decimals is not None:
                    scale = float(10**round_decimals)
                    v = float(np.floor(v * scale + 0.5) / scale)
                new_c[cid, d] = v
        centroids = new_c
    return centroids


def build_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + cluster assignment — persist/bucket this by `cluster`
    for repeated searches."""
    assign = _assign_udf(centroids)
    return corpus.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster")
    )


def search(
    index: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim): probe the nprobe nearest
    cells per query, exact cosine rerank inside them."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def probe_kernel(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int64").tolist() for row in order])

    probe = pandas_udf(probe_kernel, "array<bigint>")
    # norms are per-ROW (brute_force_topk hoist, guide §2.3): each of
    # the probed pairs pays one zip_with dot instead of dot + two norm
    # re-aggregations.  Identical IEEE values — same sqrt(sum(x^2))
    # left-to-right fold, evaluated once per row instead of per pair.
    def _norm(col):
        return F.sqrt(F.aggregate(
            col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        ))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        F.explode(probe(F.col(vec_col))).alias("cluster"),
    )
    cand = index.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        _norm(F.col(vec_col)).alias("nn"), "cluster",
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(q).join(cand, "cluster")
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
