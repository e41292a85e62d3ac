"""SemDeDup-style semantic deduplication over an embedding column.

Public method (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
k-means cluster the embeddings, then WITHIN each cluster drop items
whose pairwise cosine similarity to an earlier-kept item exceeds a
threshold — semantic near-duplicates that survive lexical dedup
(MinHash/SimHash catch surface overlap, this catches paraphrases).

Spark shape (100-TB plan):
- centroids from the existing distributed Lloyd trainer
  (operators/ivf.train_kmeans) — the only driver-side object is the
  [nlist, dim] centroid array (broadcast via closure);
- cluster assignment is an Arrow kernel over the corpus (one scan);
- the quadratic part runs per cluster inside applyInPandas: SemDeDup's
  own cost model — clusters are size-bounded by nlist choice
  (the paper uses ~50k clusters for ~an epsilon of the corpus each),
  so the per-group O(c^2/2) cosine matrix is the intended bounded
  work unit, shuffled only on the cluster id (no all-pairs join);
- keep rule: ascending id order within a cluster, an item is dropped
  if it is within `threshold` cosine of ANY earlier kept item
  (deterministic greedy — layout-independent because the group is
  sorted before the scan, so results don't depend on partitioning).

Cross-engine determinism (the repo's integerization discipline, cf.
operators/pq.py ADC): unit vectors are quantized to a 1e-6 grid
(floor(u * 1e6 + 0.5) as int64) and the pairwise similarity is the
exact int64 dot of the quantized units, compared against
floor(threshold * 1e12 + 0.5).  Integer arithmetic is
order-independent, so the greedy cascade — where one flipped
comparison would propagate — reproduces bit-for-bit in the DuckDB
oracle (queries.py::semdedup_decisions).  The quantization moves the
effective threshold by < 1e-5 cosine, far below any semantic meaning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.ivf import build_index, train_kmeans


def _dedup_group_kernel(threshold: float, id_col: str, vec_col: str):
    """applyInPandas kernel: one cluster's rows -> (id, keep,
    dup_of).  Greedy scan in ascending id order: O(kept * c) dot
    products, vectorized against the kept block."""

    thr_int = int(np.floor(threshold * 1e12 + 0.5))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        vecs = np.stack([np.asarray(v, dtype="f8") for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        # 1e-6-grid quantization -> exact int64 similarity (module doc)
        uq = np.floor(unit * 1e6 + 0.5).astype("i8")
        kept_rows: list[int] = []
        keep = np.ones(len(ids), dtype=bool)
        dup_of = np.full(len(ids), -1, dtype="i8")
        for i in range(len(ids)):
            if kept_rows:
                sims = uq[kept_rows] @ uq[i]
                j = int(np.argmax(sims))  # first max = lowest kept id
                if sims[j] >= thr_int:
                    keep[i] = False
                    dup_of[i] = ids[kept_rows[j]]
                    continue
            kept_rows.append(i)
        return pd.DataFrame({
            id_col: ids, "keep": keep, "dup_of": dup_of,
        })

    return kernel


def semantic_dedup(
    corpus: DataFrame,
    *,
    nlist: int = 16,
    iters: int = 5,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """-> (id, cluster, keep, dup_of) keep-decisions for every row.

    dup_of: the id of the earlier-kept item that shadowed this one,
    -1 for kept rows.  Pass pre-trained ``centroids`` to skip
    training (e.g. reuse one model across corpus shards)."""
    if centroids is None:
        centroids = train_kmeans(
            corpus, nlist=nlist, iters=iters,
            id_col=id_col, vec_col=vec_col, round_decimals=6,
        )
    index = build_index(corpus, centroids, id_col=id_col, vec_col=vec_col)
    out = index.groupBy("cluster").applyInPandas(
        _with_cluster(_dedup_group_kernel(threshold, id_col, vec_col)),
        f"{id_col} long, cluster int, keep boolean, dup_of long",
    )
    return out


def _with_cluster(kernel):
    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        res = kernel(pdf)
        res.insert(1, "cluster", int(pdf["cluster"].iloc[0]))
        return res

    return wrapped
