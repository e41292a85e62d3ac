"""Product-quantization (PQ) approximate nearest-neighbor search.

Public method (Jegou, Douze, Schmid 2011, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 33(1)): split each D-dim vector
into M subvectors, k-means each subspace into ksub centroids, store a
vector as M small codes, and answer queries with asymmetric distance
computation (ADC): a per-query [M, ksub] table of exact
query-subvector-to-centroid squared distances turns the corpus scan
into M integer lookups + adds per vector — the original floats are
never touched at query time.

Scale shape (the third embedding-search path, after brute cosine and
IVF, operators/ann.py / ivf.py): at D=128 float32 a vector is 512
bytes; at M=16, ksub=256 its code is 16 bytes — a 32x smaller scan,
which is the whole point at 100 TB: ADC reads tens of GB where
brute-force reads TB.  The codebook ([M, ksub, D/M]) is tiny and
ships in the kernel closure; queries are the small side by definition
and ship the same way (bounded driver collect, like the IVF probe);
the corpus-side scan emits only a per-partition top-k, so the global
merge shuffles O(partitions * nq * k) rows.

Cross-engine determinism (same discipline as ivf.train_kmeans):
seeds are the ksub lowest-id vectors, assignment ties break to the
lowest code, centroid means floor-round to a 1e-6 grid each Lloyd
round, and ADC distances are integerized per subspace
(floor(d * 1e6 + 0.5) as int64) BEFORE summing — integer sums are
order-independent, so the DuckDB oracle that unrolls the same
training reproduces every distance exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _round_grid(v: float, decimals: int | None) -> float:
    if decimals is None:
        return float(v)
    scale = float(10**decimals)
    return float(np.floor(v * scale + 0.5) / scale)


def _encode_kernel(books: np.ndarray):
    """vec -> M argmin-L2 sub-codes (ties to the lowest code, which is
    what np.argmin returns)."""
    m, ksub, dsub = books.shape

    def kernel(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        xs = x.reshape(len(x), m, dsub)
        codes = np.empty((len(x), m), dtype="i8")
        for mi in range(m):
            d = ((xs[:, mi, None, :] - books[mi][None, :, :]) ** 2).sum(-1)
            codes[:, mi] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return pandas_udf(kernel, "array<bigint>")


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd k-means; returns codebooks [m, ksub, D/m].

    One distributed pass per iteration covers ALL m subspaces: the
    encode kernel assigns every row its m codes, then one
    posexplode + groupBy(sub, code, dim) mean updates every
    sub-centroid — the only driver-side object is the [m*ksub*dsub]
    means result (tiny).  Empty (sub, code) cells keep their previous
    centroid.  round_decimals: the cross-engine determinism knob
    (see module docstring)."""
    seed_rows = corpus.orderBy(id_col).limit(ksub).select(vec_col).collect()
    seeds = np.asarray([np.asarray(r[vec_col], dtype="f8") for r in seed_rows])
    if len(seeds) < ksub:
        raise ValueError(f"need >= {ksub} vectors to seed {ksub} sub-centroids")
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.ascontiguousarray(
        seeds.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )  # [m, ksub, dsub]

    for _ in range(iters):
        enc = _encode_kernel(books)
        assigned = corpus.select(
            F.col(vec_col).alias("v"), enc(F.col(vec_col)).alias("codes")
        )
        sub = (F.col("dim") / dsub).cast("int")
        exploded = assigned.select(
            F.posexplode("v").alias("dim", "val"), "codes"
        ).select(
            sub.alias("s"),
            F.element_at("codes", sub + 1).alias("code"),
            (F.col("dim") % dsub).alias("sdim"),
            "val",
        )
        means = (
            exploded.groupBy("s", "code", "sdim")
            .agg(F.avg("val").alias("mval"))
            .collect()
        )
        new_books = books.copy()
        for r in means:
            new_books[int(r["s"]), int(r["code"]), int(r["sdim"])] = _round_grid(
                float(r["mval"]), round_decimals
            )
        books = new_books
    return books


def encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): the compressed corpus — persist THIS for repeated
    searches; it is the 32x-smaller scan target."""
    enc = _encode_kernel(books)
    return corpus.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def _seq_sq_l2(a: np.ndarray, b: np.ndarray) -> float:
    """Left-to-right float64 squared L2 — matches the accumulation
    order of a sequential SQL list_sum so the integerized LUT agrees
    with the oracle (numpy's pairwise summation may differ in the
    last ulp on longer subvectors)."""
    acc = 0.0
    for i in range(a.shape[0]):
        d = float(a[i]) - float(b[i])
        acc += d * d
    return acc


def _batch_lut(books: np.ndarray, qvecs: np.ndarray) -> np.ndarray:
    """Integerized ADC LUT [m, ksub, nq] for one query batch.

    Bit-identical to applying _seq_sq_l2 per (centroid, query) pair:
    the accumulation loops over the subvector DIMENSION (left to
    right, like a sequential SQL list_sum) and vectorizes over the
    (ksub, nq) pairs — float64 adds are elementwise, so every scalar
    accumulator sees exactly the scalar loop's operation sequence."""
    m, ksub, dsub = books.shape
    nq = len(qvecs)
    lut = np.empty((m, ksub, nq), dtype="i8")
    for mi in range(m):
        qs = qvecs[:, mi * dsub : (mi + 1) * dsub]  # [nq, dsub]
        acc = np.zeros((ksub, nq), dtype="f8")
        for i in range(dsub):
            d = books[mi][:, i][:, None] - qs[:, i][None, :]
            acc += d * d
        lut[mi] = np.floor(acc * 1e6 + 0.5).astype("i8")
    return lut


def search_adc(
    codes_df: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_batch: int = 1024,
) -> DataFrame:
    """(query_id, neighbor_id, rank, adist_e6): ADC top-k over the
    compressed corpus.  adist_e6 = sum over subspaces of
    floor(1e6 * ||q_sub - centroid[code]||^2 + 0.5) — an int64, so the
    sum is exact and order-independent.  Per-partition top-k inside
    mapInPandas, then one global window over O(partitions*nq*k) rows.

    The query side is CHUNKED (`query_batch`): queries are processed
    in fixed-size batches, each batch shipping only its own query
    VECTORS in the scan closure (batch * D doubles, ~1 MiB at
    batch=1024, D=128); the integerized [m, ksub, batch] LUT is built
    INSIDE each task (once, at scan start, with _batch_lut — the
    bit-exact vectorized form of the sequential per-pair distance),
    and the per-batch partial top-k frames are unioned before the one
    global rank window.  Batches partition the query set and each
    (query, neighbor) pair is scored in exactly one batch with the
    batch-independent integer distance, so the union is equal to the
    single-LUT result for any batch size (pinned by
    test_pq::test_search_adc_chunked_equality).  Memory bound: the
    driver holds only the query vectors (nq * D doubles); each task
    holds one m * ksub * min(nq, query_batch) * 8-byte LUT (m=16,
    ksub=256, batch=1024 -> 32 MiB) — nothing anywhere scales as
    m * ksub * nq.  The corpus scan is repeated ceil(nq / query_batch)
    times, each over the 32x-compressed code column."""
    m, ksub, dsub = books.shape
    qrows = queries.orderBy(id_col).select(id_col, vec_col).collect()
    all_qids = np.asarray([r[id_col] for r in qrows], dtype="i8")
    all_qvecs = np.asarray([np.asarray(r[vec_col], dtype="f8") for r in qrows])
    if query_batch <= 0:
        raise ValueError("query_batch must be positive")

    def _batch_scan(qids: np.ndarray, qvecs: np.ndarray):
        def scan(batches):
            nq = len(qids)
            lut = _batch_lut(books, qvecs)  # built per task, not shipped
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf[id_col].to_numpy()
                codes = np.stack([np.asarray(c, dtype="i8") for c in pdf["codes"]])
                acc = np.zeros((len(ids), nq), dtype="i8")
                for mi in range(m):
                    acc += lut[mi][codes[:, mi], :]
                topn = min(k + 1, len(ids))  # +1 absorbs the self-match
                out_q, out_n, out_d = [], [], []
                for qi in range(nq):
                    col = acc[:, qi]
                    # full (adist, id) order, not argpartition: PQ codes
                    # tie often and the global rank tie-breaks on id, so
                    # the partition cut must use the same total order
                    part = np.lexsort((ids, col))[:topn]
                    out_q.append(np.full(topn, qids[qi], dtype="i8"))
                    out_n.append(ids[part])
                    out_d.append(col[part])
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "adist_e6": np.concatenate(out_d),
                    }
                )

        return codes_df.mapInPandas(
            scan, "query_id long, neighbor_id long, adist_e6 long"
        )

    parts = [
        _batch_scan(all_qids[lo : lo + query_batch], all_qvecs[lo : lo + query_batch])
        for lo in range(0, len(all_qids), query_batch)
    ]
    if not parts:
        return codes_df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, adist_e6 long"
        )
    partial = parts[0]
    for p in parts[1:]:
        partial = partial.unionByName(p)
    partial = partial.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_e6"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist_e6")
    )


# ------------------------------------------------------------------ IVF-PQ
# The composed configuration (FAISS's "IVFADC", Jegou 2011 §V): a
# coarse quantizer limits the scan to nprobe cells, PQ codes encode
# the RESIDUAL vector - cell_centroid (residuals concentrate near 0,
# so the same ksub codes quantize much finer than on raw vectors).
# At planet scale the index is partitioned by cell id, so a probe
# touches nprobe/nlist of the corpus AND reads only M-byte codes.


def train_ivfpq(
    corpus: DataFrame,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 256,
    coarse_iters: int = 5,
    pq_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (coarse centroids [nlist, D], residual codebooks
    [m, ksub, D/m]).  The coarse stage reuses ivf.train_kmeans; the
    PQ stage trains on the residual frame (one extra column, never
    materialized to the driver)."""
    from osm2pgsql_spark.operators import ivf

    cents = ivf.train_kmeans(
        corpus, nlist=nlist, iters=coarse_iters,
        id_col=id_col, vec_col=vec_col, round_decimals=round_decimals,
    )
    res = _residual_frame(corpus, cents, id_col, vec_col)
    books = train_pq(
        res, m=m, ksub=ksub, iters=pq_iters,
        id_col=id_col, vec_col="residual", round_decimals=round_decimals,
    )
    return cents, books


def _residual_frame(
    corpus: DataFrame, cents: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    from osm2pgsql_spark.operators.ivf import _assign_udf

    c = cents.copy()

    def residual_kernel(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        r = x - c[clusters.to_numpy()]
        return pd.Series(list(r))

    res = pandas_udf(residual_kernel, "array<double>")
    assign = _assign_udf(cents)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        assign(F.col(vec_col)).alias("cluster"),
    ).withColumn("residual", res(F.col(vec_col), F.col("cluster")))


def encode_ivfpq(
    corpus: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, codes): the persisted index — partition/bucket by
    `cluster` for repeated searches."""
    res = _residual_frame(corpus, cents, id_col, vec_col)
    enc = _encode_kernel(books)
    return res.select(
        F.col(id_col), F.col("cluster"), enc(F.col("residual")).alias("codes")
    )


def search_ivfpq(
    index: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, adist_e6): probe the nprobe
    nearest cells (cosine, like ivf.search), ADC on the residual
    codes inside them.  The candidate join is keyed on cluster —
    exactly the shuffle ivf.search pays — but the corpus side carries
    M-byte codes instead of the float vectors."""
    from osm2pgsql_spark.operators.ivf import _assign_udf  # noqa: F401 (parity)

    m, ksub, dsub = books.shape
    nc = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def probe_kernel(vecs: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype="f8") for v in vecs])
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = xn @ nc.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int64").tolist() for row in order])

    probe = pandas_udf(probe_kernel, "array<bigint>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cluster"),
    )
    cand = index.select(
        F.col(id_col).alias("neighbor_id"), "cluster", "codes"
    )

    cb = books.copy()
    cc = cents.copy()

    def adist_kernel(
        qvs: pd.Series, clusters: pd.Series, codes: pd.Series
    ) -> pd.Series:
        qx = np.asarray([np.asarray(v, dtype="f8") for v in qvs])
        cl = clusters.to_numpy()
        cd = np.stack([np.asarray(c, dtype="i8") for c in codes])
        r = (qx - cc[cl]).reshape(len(qx), m, dsub)
        acc = np.zeros(len(qx), dtype="i8")
        for mi in range(m):
            d = ((r[:, mi, :] - cb[mi][cd[:, mi]]) ** 2).sum(-1)
            acc += np.floor(d * 1e6 + 0.5).astype("i8")
        return pd.Series(acc)

    adist = pandas_udf(adist_kernel, "long")
    scored = (
        F.broadcast(q).join(cand, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adist_e6", adist(F.col("qv"), F.col("cluster"), F.col("codes")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_e6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adist_e6")
    )
