"""Product quantization (operators/pq.py): exactness vs a pure-numpy
twin, layout independence, and the compression contract.

The driver gate (ann_pq_topk) proves cross-engine parity against a
DuckDB-unrolled training oracle; these tests pin the operator against
an independent in-process twin on crafted data where the right answer
is obvious."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import pq


def _clustered_vectors(n=96, dim=16, groups=4, seed=7):
    """Vectors in `groups` tight balls so PQ top-k == exact top-k."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(groups, dim)) * 10.0
    vecs = centers[np.arange(n) % groups] + rng.normal(size=(n, dim)) * 0.01
    return vecs.astype("f8")


def _twin_train(vecs, m, ksub, iters, round_decimals=6):
    """Sequential numpy re-implementation of train_pq (same seeds,
    same tie-breaks, same round-6 means, same empty-cell rule)."""
    n, dim = vecs.shape
    dsub = dim // m
    books = vecs[:ksub].reshape(ksub, m, dsub).transpose(1, 0, 2).copy()
    scale = 10.0**round_decimals
    for _ in range(iters):
        xs = vecs.reshape(n, m, dsub)
        new = books.copy()
        for mi in range(m):
            d = ((xs[:, mi, None, :] - books[mi][None, :, :]) ** 2).sum(-1)
            code = np.argmin(d, axis=1)
            for c in range(ksub):
                sel = xs[code == c, mi, :]
                if len(sel):
                    mean = sel.mean(axis=0)
                    new[mi, c] = np.floor(mean * scale + 0.5) / scale
        books = new
    return books


def _twin_topk(vecs, books, qids, k):
    n = len(vecs)
    m, ksub, dsub = books.shape
    xs = vecs.reshape(n, m, dsub)
    codes = np.stack(
        [
            np.argmin(((xs[:, mi, None, :] - books[mi][None, :, :]) ** 2).sum(-1), axis=1)
            for mi in range(m)
        ],
        axis=1,
    )
    out = []
    for q in qids:
        lut = np.empty((m, ksub), dtype="i8")
        for mi in range(m):
            for c in range(ksub):
                lut[mi, c] = int(
                    np.floor(pq._seq_sq_l2(xs[q, mi], books[mi, c]) * 1e6 + 0.5)
                )
        dist = np.zeros(n, dtype="i8")
        for mi in range(m):
            dist += lut[mi][codes[:, mi]]
        order = [i for i in np.lexsort((np.arange(n), dist)) if i != q][:k]
        out += [(q, int(i), r + 1, int(dist[i])) for r, i in enumerate(order)]
    return set(out)


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _clustered_vectors()
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return vecs, df


M, KSUB, ITERS, K = 4, 8, 2, 3


def test_train_matches_numpy_twin(corpus):
    vecs, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS, round_decimals=6)
    want = _twin_train(vecs, M, KSUB, ITERS)
    np.testing.assert_array_equal(books, want)


def test_adc_topk_matches_twin_and_layout_independent(corpus):
    vecs, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS, round_decimals=6)
    codes = pq.encode(df, books)
    queries = df.where(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["adist_e6"])
        for r in pq.search_adc(codes, queries, books, k=K).collect()
    }
    assert got == _twin_topk(vecs, books, range(5), K)
    rep = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["adist_e6"])
        for r in pq.search_adc(codes.repartition(7), queries, books, k=K).collect()
    }
    assert rep == got


def test_batch_lut_matches_sequential_pairs(corpus):
    """_batch_lut (vectorized over pairs, sequential over dims) must
    be bit-identical to the per-pair left-to-right _seq_sq_l2 loop —
    the property that keeps the task-built LUT oracle-exact."""
    vecs, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS, round_decimals=6)
    qvecs = np.asarray(vecs[:7], dtype="f8")
    got = pq._batch_lut(books, qvecs)
    m, ksub, dsub = books.shape
    for mi in range(m):
        qs = qvecs[:, mi * dsub:(mi + 1) * dsub]
        for c in range(ksub):
            for qi in range(len(qvecs)):
                d = pq._seq_sq_l2(qs[qi], books[mi, c])
                assert got[mi, c, qi] == int(np.floor(d * 1e6 + 0.5))


def test_search_adc_chunked_equality(corpus):
    """The query-side LUT chunking is result-invariant: forcing one
    query per batch (query_batch=1, 8 corpus scans) and an
    odd-size batch must both equal the single-LUT answer — batches
    partition the query set and the integer distances are
    batch-independent, so the unioned partial top-k is identical."""
    vecs, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS, round_decimals=6)
    codes = pq.encode(df, books)
    queries = df.where(F.col("vec_id") < 8)

    def run(batch):
        return {
            (r["query_id"], r["neighbor_id"], r["rank"], r["adist_e6"])
            for r in pq.search_adc(
                codes, queries, books, k=K, query_batch=batch
            ).collect()
        }

    single = run(10_000)  # one LUT covers all 8 queries
    assert run(1) == single
    assert run(3) == single


def test_adc_finds_true_cluster_neighbors(corpus):
    """On tight clusters the compressed-domain top-k must agree with
    exact L2: every returned neighbor is in the query's ball."""
    vecs, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS, round_decimals=6)
    codes = pq.encode(df, books)
    queries = df.where(F.col("vec_id") < 8)
    for r in pq.search_adc(codes, queries, books, k=K).collect():
        assert r["neighbor_id"] % 4 == r["query_id"] % 4


def test_codes_are_narrow(corpus):
    _, df = corpus
    books = pq.train_pq(df, m=M, ksub=KSUB, iters=ITERS)
    row = pq.encode(df, books).first()
    assert len(row["codes"]) == M
    assert all(0 <= c < KSUB for c in row["codes"])


def test_dim_not_divisible_raises(corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="not divisible"):
        pq.train_pq(df, m=5, ksub=KSUB, iters=1)


class TestIvfPq:
    """Composed IVF + residual-PQ (FAISS IVFADC shape): cell-limited
    candidate join over M-byte codes."""

    NLIST, NPROBE = 4, 2

    def _fit(self, corpus):
        vecs, df = corpus
        cents, books = pq.train_ivfpq(
            df, nlist=self.NLIST, m=M, ksub=KSUB,
            coarse_iters=3, pq_iters=2, round_decimals=6,
        )
        return df, cents, books

    def test_recall_on_tight_clusters(self, corpus):
        df, cents, books = self._fit(corpus)
        index = pq.encode_ivfpq(df, cents, books)
        queries = df.where(F.col("vec_id") < 8)
        rows = pq.search_ivfpq(
            index, queries, cents, books, k=K, nprobe=self.NPROBE
        ).collect()
        assert len(rows) == 8 * K
        for r in rows:
            assert r["neighbor_id"] % 4 == r["query_id"] % 4

    def test_layout_independent(self, corpus):
        df, cents, books = self._fit(corpus)
        index = pq.encode_ivfpq(df, cents, books)
        queries = df.where(F.col("vec_id") < 5)

        def run(ix):
            return {
                (r["query_id"], r["neighbor_id"], r["rank"], r["adist_e6"])
                for r in pq.search_ivfpq(
                    ix, queries, cents, books, k=K, nprobe=self.NPROBE
                ).collect()
            }

        assert run(index) == run(index.repartition(9))

    def test_residual_codes_reconstruct_better_than_raw(self, corpus):
        """The point of residual encoding: quantization error through
        (centroid + codebook) is below raw-vector PQ at equal M/ksub."""
        vecs, df = corpus
        cents, books = pq.train_ivfpq(
            df, nlist=self.NLIST, m=M, ksub=KSUB,
            coarse_iters=3, pq_iters=2, round_decimals=6,
        )
        raw_books = pq.train_pq(df, m=M, ksub=KSUB, iters=2, round_decimals=6)

        ix = pq.encode_ivfpq(df, cents, books).orderBy("vec_id").collect()
        raw = pq.encode(df, raw_books).orderBy("vec_id").collect()
        dsub = vecs.shape[1] // M

        def recon_err(codes_rows, books_, base_of):
            err = 0.0
            for i, r in enumerate(codes_rows):
                rec = base_of(r).copy()
                for mi, c in enumerate(r["codes"]):
                    rec[mi * dsub : (mi + 1) * dsub] += books_[mi, c]
                err += float(((vecs[i] - rec) ** 2).sum())
            return err

        err_ivf = recon_err(ix, books, lambda r: cents[r["cluster"]])
        err_raw = recon_err(raw, raw_books, lambda r: np.zeros(vecs.shape[1]))
        assert err_ivf < err_raw
