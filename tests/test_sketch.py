"""Portable HyperLogLog (operators/sketch.py): merge property,
accuracy envelope, small-range branch, determinism."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import sketch


@pytest.fixture(scope="module")
def values(spark):
    # 5000 rows, 1000 distinct
    return spark.range(5000).select((F.col("id") % 1000).alias("v")).cache()


def test_registers_merge_by_max(spark, values):
    """sketch(A ∪ B) == element-wise max of sketch(A), sketch(B) —
    the property that makes per-shard sketches combinable without
    touching raw values again."""
    a = values.where(F.col("v") < 600)
    b = values.where(F.col("v") >= 400)
    merged = (
        sketch.hll_registers(a, "v")
        .unionByName(sketch.hll_registers(b, "v"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    whole = sketch.hll_registers(values, "v")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    est_m = sketch.hll_estimate(merged).first()["hll_estimate"]
    est_w = sketch.hll_estimate(whole).first()["hll_estimate"]
    assert est_m == est_w


def test_accuracy_envelope(spark, values):
    """p=8 (256 registers): standard error 1.04/sqrt(m) ~ 6.5%; the
    estimate of 1000 distinct must land within a generous 4-sigma."""
    est = sketch.hll_distinct(values, "v").first()["hll_estimate"]
    assert abs(est - 1000) / 1000 < 0.26


def test_small_range_branch(spark):
    df = spark.range(40).select((F.col("id") % 7).alias("v"))
    est = sketch.hll_distinct(df, "v").first()["hll_estimate"]
    # linear counting is near-exact at tiny cardinalities
    assert abs(est - 7) < 1.0


def test_deterministic_and_layout_independent(spark, values):
    a = sketch.hll_distinct(values, "v").first()
    b = sketch.hll_distinct(values.repartition(13), "v").first()
    assert a["hll_estimate"] == b["hll_estimate"]
    assert a["n_registers_set"] == b["n_registers_set"]


def test_empty_input_estimates_zero(spark, values):
    empty = values.where(F.lit(False))
    row = sketch.hll_distinct(empty, "v").first()
    assert row["n_registers_set"] == 0
    assert row["hll_estimate"] == 0.0


def test_p_range_validated(spark, values):
    with pytest.raises(ValueError, match="p must be"):
        sketch.hll_registers(values, "v", p=2)


# --------------------------------------------------------------- bloom

@pytest.fixture(scope="module")
def keys(spark):
    # 300 string keys; build the filter on the first 200
    return spark.range(300).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s"),
        (F.col("id") < 200).alias("in_build"),
    ).cache()


M, K = 1 << 12, 4


def _bloom_positions(s: str, k: int, m_bits: int):
    import hashlib

    return [
        int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16) % m_bits
        for i in range(k)
    ]


def test_bloom_registers_match_python_twin(spark, keys):
    want = {}
    for r in keys.where("in_build").collect():
        for p in _bloom_positions(r["s"], K, M):
            want[p >> 5] = want.get(p >> 5, 0) | (1 << (p % 32))
    got = {
        r["word"]: r["bits"]
        for r in sketch.bloom_registers(
            keys.where("in_build"), "s", M, K
        ).collect()
    }
    assert got == want


def test_bloom_no_false_negatives(spark, keys):
    reg = sketch.bloom_registers(keys.where("in_build"), "s", M, K)
    res = {
        r["s"]: r["maybe_member"]
        for r in sketch.bloom_contains(reg, keys, "s", ["s"], M, K).collect()
    }
    for r in keys.collect():
        if r["in_build"]:
            assert res[r["s"]], r["s"]


def test_bloom_null_probe_is_never_seen(spark, keys):
    """A NULL probe value answers maybe_member = False (NULL is never
    inserted — bloom_registers filters it), NOT NULL: downstream
    dedup's where(~maybe_member) must pass the row through, not
    silently drop it (r10 ADVICE)."""
    reg = sketch.bloom_registers(keys.where("in_build"), "s", M, K)
    probe = spark.createDataFrame(
        [("key-1", 1), (None, 2), (None, 3)], "s string, pid int"
    )
    res = {r["pid"]: r["maybe_member"] for r in
           sketch.bloom_contains(reg, probe, "s", ["pid"], M, K).collect()}
    assert res[1] is True
    assert res[2] is False and res[3] is False


def test_bloom_merge_by_bit_or(spark, keys):
    """filter(A ∪ B) == per-word bit-OR of filter(A), filter(B) — the
    property that makes per-shard / per-batch filters combinable."""
    a = keys.where("in_build AND s < 'key-2'")
    b = keys.where("in_build AND s >= 'key-2'")
    merged = (
        sketch.bloom_registers(a, "s", M, K)
        .unionByName(sketch.bloom_registers(b, "s", M, K))
        .groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    whole = sketch.bloom_registers(keys.where("in_build"), "s", M, K)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_bloom_layout_independent(spark, keys):
    build = keys.where("in_build")
    a = sketch.bloom_contains(
        sketch.bloom_registers(build, "s", M, K), keys, "s", ["s"], M, K)
    b = sketch.bloom_contains(
        sketch.bloom_registers(build.repartition(13), "s", M, K),
        keys.repartition(7), "s", ["s"], M, K)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_bloom_undersized_filter_false_positives_deterministic(spark, keys):
    """A deliberately tiny filter MUST produce false positives (they
    are the designed trade-off, not a bug) and they must reproduce."""
    reg = sketch.bloom_registers(keys.where("in_build"), "s", 128, 2)
    res = sketch.bloom_contains(reg, keys, "s", ["s"], 128, 2)
    n = res.where("maybe_member").count()
    assert n > 200  # all 200 members + some of the 100 non-members
    assert n == sketch.bloom_contains(
        reg, keys, "s", ["s"], 128, 2).where("maybe_member").count()


def test_bloom_register_side_is_broadcast(spark, keys):
    reg = sketch.bloom_registers(keys.where("in_build"), "s", M, K)
    plan = sketch.bloom_contains(
        reg, keys, "s", ["s"], M, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_params_validated(spark, keys):
    with pytest.raises(ValueError, match="m_bits"):
        sketch.bloom_registers(keys, "s", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        sketch.bloom_registers(keys, "s", k=0)


# ----------------------------------------------------------- count-min

@pytest.fixture(scope="module")
def freq_values(spark):
    # value v appears v+1 times, v in [0, 50): known exact frequencies
    return spark.range(50).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("rep"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    ).select("v").cache()


def test_cms_never_underestimates(spark, freq_values):
    reg = sketch.cms_registers(freq_values, "v", depth=3, width=64)
    est = {r["v"]: r["cms_count"] for r in sketch.cms_estimate(
        reg, freq_values, "v", depth=3, width=64).collect()}
    for i in range(50):
        assert est[f"v{i}"] >= i + 1, i


def test_cms_exact_when_wide(spark, freq_values):
    reg = sketch.cms_registers(freq_values, "v", depth=4, width=1 << 14)
    est = {r["v"]: r["cms_count"] for r in sketch.cms_estimate(
        reg, freq_values, "v", depth=4, width=1 << 14).collect()}
    assert est == {f"v{i}": i + 1 for i in range(50)}


def test_cms_merge_by_sum(spark, freq_values):
    """sketch(A ⊎ B) == per-cell SUM of sketch(A), sketch(B)."""
    a = freq_values.where("v < 'v3'")
    b = freq_values.where("v >= 'v3'")
    merged = (
        sketch.cms_registers(a, "v", 3, 64)
        .unionByName(sketch.cms_registers(b, "v", 3, 64))
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketch.cms_registers(freq_values, "v", 3, 64)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_matches_python_twin(spark, freq_values):
    import hashlib

    D, W = 2, 16
    cells = {}
    truth = {}
    for i in range(50):
        truth[f"v{i}"] = i + 1
    for v, n in truth.items():
        for i in range(D):
            c = int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:8],
                    16) % W
            cells[(i, c)] = cells.get((i, c), 0) + n
    want_reg = cells
    got_reg = {(r["row"], r["col"]): r["cnt"] for r in
               sketch.cms_registers(freq_values, "v", D, W).collect()}
    assert got_reg == want_reg
    est = {r["v"]: r["cms_count"] for r in sketch.cms_estimate(
        sketch.cms_registers(freq_values, "v", D, W),
        freq_values, "v", D, W).collect()}
    for v, n in truth.items():
        want = min(
            cells[(i, int(hashlib.md5(f"{v}:{i}".encode())
                          .hexdigest()[:8], 16) % W)]
            for i in range(D)
        )
        assert est[v] == want, v


def test_cms_layout_independent(spark, freq_values):
    a = sketch.cms_estimate(
        sketch.cms_registers(freq_values, "v", 3, 64),
        freq_values, "v", 3, 64)
    b = sketch.cms_estimate(
        sketch.cms_registers(freq_values.repartition(13), "v", 3, 64),
        freq_values.repartition(7), "v", 3, 64)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_cms_params_validated(spark, freq_values):
    with pytest.raises(ValueError, match="depth and width"):
        sketch.cms_registers(freq_values, "v", depth=0)


def test_bloom_duplicate_probe_keys(spark, keys):
    """A probe key appearing on multiple rows must answer the same as
    a single occurrence (min-of-hits, not sum == k)."""
    reg = sketch.bloom_registers(keys.where("in_build"), "s", M, K)
    dup_probe = keys.unionByName(keys)  # every key twice
    a = {tuple(r) for r in sketch.bloom_contains(
        reg, dup_probe, "s", ["s"], M, K).collect()}
    b = {tuple(r) for r in sketch.bloom_contains(
        reg, keys, "s", ["s"], M, K).collect()}
    assert a == b
