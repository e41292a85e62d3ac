"""DSIR importance resampling (operators/dsir.py): scores match a
pure-Python twin, selection prefers target-like documents, and the
pre-cut top-k is layout-independent.  The driver gate
(dsir_selection) proves cross-engine parity against the DuckDB
oracle; these pin the semantics on crafted corpora."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import dsir


def _twin_scores(source_docs, target_docs):
    """dict doc_id -> score_e6, recomputed sequentially."""

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:2]

    def counts(docs):
        c = {}
        for _, text in docs:
            for g in grams(text):
                b = bucket(g)
                c[b] = c.get(b, 0) + 1
        return c

    tc, sc = counts(target_docs), counts(source_docs)
    t_tot, s_tot = sum(tc.values()), sum(sc.values())
    lr = {}
    for b in set(tc) | set(sc):
        pt = (tc.get(b, 0) + dsir.ALPHA) / (t_tot + dsir.ALPHA * dsir.N_BUCKETS)
        ps = (sc.get(b, 0) + dsir.ALPHA) / (s_tot + dsir.ALPHA * dsir.N_BUCKETS)
        lr[b] = int(math.floor((math.log(pt) - math.log(ps)) * 1e6 + 0.5))
    out = {}
    for did, text in source_docs:
        out[did] = sum(lr[bucket(g)] for g in grams(text))
    return out


TARGET = [(100 + i, "alpha beta gamma delta " * 3) for i in range(4)]
SOURCE = (
    [(i, "alpha beta gamma epsilon " + "zeta eta " * i) for i in range(3)]
    + [(10 + i, "qq ww ee rr tt yy uu ii " * 2) for i in range(5)]
)


@pytest.fixture(scope="module")
def frames(spark):
    schema = "doc_id bigint, text string"
    return (
        spark.createDataFrame(SOURCE, schema),
        spark.createDataFrame(TARGET, schema),
    )


def test_scores_match_python_twin(frames):
    src, tgt = frames
    got = {
        r["doc_id"]: r["score_e6"]
        for r in dsir.importance_scores(
            src, dsir.bucket_counts(tgt), dsir.bucket_counts(src)
        ).collect()
    }
    assert got == _twin_scores(SOURCE, TARGET)


def test_selection_prefers_target_like_docs(frames):
    src, tgt = frames
    top = dsir.dsir_select(src, tgt, top_k=3).collect()
    # the three alpha/beta/gamma docs outscore the qq/ww noise docs
    assert {r["doc_id"] for r in top} == {0, 1, 2}
    ranks = {r["rank"] for r in top}
    assert ranks == {1, 2, 3}


def test_topk_layout_independent(frames):
    src, tgt = frames

    def run(s):
        return [
            (r["doc_id"], r["score_e6"], r["rank"])
            for r in dsir.dsir_select(s, tgt, top_k=4)
            .orderBy("rank")
            .collect()
        ]

    assert run(src) == run(src.repartition(7))


def test_no_python_stage(frames):
    src, tgt = frames
    plan = (
        dsir.dsir_select(src, tgt, top_k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
