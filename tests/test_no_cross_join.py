"""The gated similarity plans must not contain a cross join.

Round-1 verdict: simhash_hamming_pairs and embedding_near_dups gated
O(n^2) nested-loop plans.  Both are now bucketed (pigeonhole bands /
random-projection bands); these tests pin the physical-plan shape so a
regression back to all-pairs fails CI, and verify the pigeonhole
banding is lossless vs the brute-force answer.
"""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import ann, dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _pinned_join_confs(spark):
    """Plan-shape assertions must not depend on conf state leaked by
    other tests (e.g. a broadcast threshold left at -1 would replan
    small-side joins and can surface BroadcastNestedLoopJoin where the
    suite normally sees a BroadcastHashJoin)."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _broadcast_exchange_columns(df) -> list[list[str]]:
    """Column-name lists of every BroadcastExchange input in the plan."""
    import re

    lines = _formatted_plan(df).splitlines()
    out = []
    for i, ln in enumerate(lines):
        if not re.match(r"\(\d+\) BroadcastExchange", ln.strip()):
            continue
        for follow in lines[i + 1 : i + 6]:
            m = re.match(r"Input \[\d+\]: \[(.*)\]", follow.strip())
            if m:
                cols = [c.strip().split("#")[0] for c in m.group(1).split(",")]
                out.append(cols)
                break
    return out


def test_simhash_hamming_pairs_plan_has_no_cross_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = dedup.simhash_table(docs)
    out = dedup.simhash_hamming_pairs(sh, max_hamming=6)
    plan = _physical_plan(out)
    for op in _FORBIDDEN:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_simhash_banding_is_lossless(spark):
    """Pigeonhole banding finds EXACTLY the all-pairs answer."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = dedup.simhash_table(docs).persist()
    banded = dedup.simhash_hamming_pairs(sh, max_hamming=6)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= 6)
    )
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, brute.collect()))
    sh.unpersist()


def test_embedding_near_dups_plan_has_no_cross_join(spark):
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ann.rp_near_dup_pairs(vecs, threshold=0.3, n_bands=4, bits_per_band=4)
    plan = _physical_plan(out)
    for op in _FORBIDDEN:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_rp_near_dups_subset_of_brute_force_with_high_precision(spark):
    """Every banded pair is a true pair (precision 1.0 — verification
    is exact); recall < 1 is allowed and expected."""
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    banded = ann.rp_near_dup_pairs(vecs, threshold=0.3, n_bands=4, bits_per_band=4)
    got = {(r.id_a, r.id_b) for r in banded.collect()}
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    from osm2pgsql_spark.functions.similarity import cosine_similarity

    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_similarity(F.col("va"), F.col("vb")))
        .where(F.col("sim") >= 0.3)
    )
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got <= want
    assert len(got) > 0


def test_minhash_verify_broadcasts_carry_no_payload(spark):
    """Round-2 verdict: the verify joins must broadcast BARE id pairs
    only — a broadcast relation carrying shingle arrays is
    O(candidates x doc length) and OOMs on a dup-heavy corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup.verified_near_dups(docs)
    allowed = {"doc_a", "doc_b", "band", "sig", "doc_id"}
    bcasts = _broadcast_exchange_columns(out)
    assert bcasts, "expected at least one broadcast of the candidate ids"
    for cols in bcasts:
        assert set(cols) <= allowed, f"payload column in broadcast: {cols}"


def test_embedding_verify_broadcasts_carry_no_payload(spark):
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ann.rp_near_dup_pairs(vecs, threshold=0.3, n_bands=4, bits_per_band=4)
    allowed = {"id_a", "id_b", "band", "sig", "vec_id"}
    bcasts = _broadcast_exchange_columns(out)
    assert bcasts, "expected at least one broadcast of the candidate ids"
    for cols in bcasts:
        assert set(cols) <= allowed, f"payload column in broadcast: {cols}"


def test_isolation_grid_plan_has_no_bnlj(spark):
    """Round-2 verdict: grid()'s residue fallback was a non-equi LEFT
    join against the full point set (BroadcastNestedLoopJoin).  The
    escalating-radius form must keep every round a bounded equi-join."""
    import inspect

    from osm2pgsql_spark.operators import isolation

    # the theta-join helper is exact()'s plan only — grid must not use it
    assert "_min_dist_to_higher" not in inspect.getsource(isolation.grid)
    assert "_min_dist_to_higher" not in inspect.getsource(isolation._neighborhood_min)

    points = spark.range(0, 500).select(
        F.col("id"),
        ((F.col("id") * 131) % 1000 / 10.0).alias("x"),
        ((F.col("id") * 197) % 1000 / 10.0).alias("y"),
        ((F.col("id") * 73) % 577).cast("double").alias("importance"),
    )
    probe = isolation._probe_side(points, "id", "x", "y", "importance")
    cand = isolation._cand_side(points, "id", "x", "y", "importance")
    round_plan = _physical_plan(isolation._neighborhood_min(probe, cand, 10.0))
    for op in _FORBIDDEN:
        assert op not in round_plan, f"{op} in round plan:\n{round_plan}"
    # end-to-end: the final assembled plan (post-checkpoint union) too
    out = isolation.grid(points, cell=10.0)
    plan = _physical_plan(out)
    for op in _FORBIDDEN:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_width_from_areas_grid_plan_has_no_cross_join(spark):
    """With grid_cell set, width_from_areas pairs candidates through a
    grid-key equi-join; the cross-join fallback must not appear."""
    from osm2pgsql_spark import queries as Q

    out = Q.queries()["river_width_from_areas"](spark, SF_DIR)
    plan = _physical_plan(out)
    for op in _FORBIDDEN:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_relation_polygon_parts_plan_is_scalar_arrow(spark):
    """The split-parts kernel must stay a SCALAR Arrow eval
    (ArrowEvalPython/BatchEvalPython over collect_list), never a
    grouped-map FlatMapGroupsInPandas: per-group pandas frame overhead
    turned 5k tiny relations into 15s at sf0.1 (PERF_NOTES round-5
    note), and no cross join may appear in the assembly either."""
    from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA
    from osm2pgsql_spark.operators.relations import relation_polygon_parts

    nodes = spark.createDataFrame(
        [(i, 50.0 + 0.1 * (i % 2), 9.0 + 0.1 * (i // 2), {},
          None, None, None, None, None, None) for i in range(1, 5)],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(10, [1, 2, 4, 3, 1], {}, None, None, None, None, None, None)],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [(100, [("w", 10, "outer")], {"type": "multipolygon"},
          None, None, None, None, None, None)],
        RELATION_SCHEMA,
    )
    df = relation_polygon_parts(rels, ways, nodes)
    plan = _physical_plan(df)
    assert "FlatMapGroupsInPandas" not in plan
    assert ("ArrowEvalPython" in plan) or ("BatchEvalPython" in plan)
    for op in _FORBIDDEN:
        assert op not in plan


def test_pq_and_ivfpq_plans_have_no_cross_join(spark):
    """Round-8 compressed-domain ANN paths: search_adc is a pure
    mapInPandas scan + bounded top-k window (no join at all);
    search_ivfpq's candidate join must stay a hash join on cluster."""
    from osm2pgsql_spark.operators import pq
    from osm2pgsql_spark.sources.testdata import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    books = pq.train_pq(e, m=4, ksub=8, iters=1, round_decimals=6)
    codes = pq.encode(e, books)
    q = e.where(F.col("vec_id") < 5)
    plan = _physical_plan(pq.search_adc(codes, q, books, k=3))
    for op in _FORBIDDEN:
        assert op not in plan

    cents, rbooks = pq.train_ivfpq(
        e, nlist=4, m=4, ksub=8, coarse_iters=1, pq_iters=1,
        round_decimals=6)
    ix = pq.encode_ivfpq(e, cents, rbooks)
    plan = _physical_plan(pq.search_ivfpq(ix, q, cents, rbooks, k=3, nprobe=2))
    for op in _FORBIDDEN:
        assert op not in plan


def test_dsir_plan_no_cross_join_and_no_python(spark):
    """DSIR scoring is pure Catalyst: the log-ratio table rides a
    broadcast hash join, nothing evaluates Python row-wise."""
    from osm2pgsql_spark.operators import dsir
    from osm2pgsql_spark.sources.testdata import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tgt = docs.where(F.col("source").isin("src0", "src1"))
    src = docs.where(~F.col("source").isin("src0", "src1"))
    plan = _physical_plan(dsir.dsir_select(src, tgt, top_k=5))
    for op in _FORBIDDEN + ("BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan


def test_embedding_candidate_pipeline_runs_once(spark):
    """r14: rp_near_dup_pairs materializes the candidate set once
    (localCheckpoint) before its two broadcast subtrees — otherwise the
    signature kernel + band self-join + distinct execute twice per
    action (measured 2x CPU on the sf0.1 gate).  The final plan must
    carry NO Python signature evaluation (it ran inside the checkpoint)
    and both broadcasts must read the checkpointed RDD."""
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ann.rp_near_dup_pairs(vecs, threshold=0.3, n_bands=4, bits_per_band=4)
    plan = _physical_plan(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "ExistingRDD" in plan, plan
