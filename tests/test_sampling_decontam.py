"""Decontamination spans + deterministic/stratified sampling."""

import pytest
from pyspark.sql import functions as F


def test_contaminated_spans_flags_benchmark_overlap(spark):
    from osm2pgsql_spark.operators.dedup import (
        contaminated_spans,
        strip_duplicated_spans,
    )

    bench_q = "what is the capital of france and when was it founded exactly"
    docs = spark.createDataFrame(
        [
            (1, f"intro text {bench_q} trailing words"),
            (2, "completely unrelated content with no overlap at all here today"),
            (3, "tiny"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_q)], "doc_id bigint, text string"
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in contaminated_spans(docs, bench, k=8).collect()
    }
    # bench_q = 12 tokens at positions 3..14 of doc 1
    assert spans == {(1, 3, 14)}

    cleaned = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(
            docs, contaminated_spans(docs, bench, k=8)
        ).collect()
    }
    assert cleaned[1] == "intro text trailing words"
    assert cleaned[2].startswith("completely")


def test_deterministic_sample_layout_independent(spark):
    from osm2pgsql_spark.operators.dedup import deterministic_sample

    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    # different partition layout -> identical sample (the property
    # df.sample() does NOT have)
    kept2 = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(7), 0.3, "doc_id").collect()
    }
    assert kept1 == kept2
    assert 0.27 < len(kept1) / 10_000 < 0.33
    # independent draw under a different salt
    kept3 = {
        r["doc_id"]
        for r in deterministic_sample(df, 0.3, "doc_id", salt="v2").collect()
    }
    assert kept3 != kept1
    overlap = len(kept1 & kept3) / len(kept1)
    assert 0.2 < overlap < 0.4  # ~rate, as independent draws should

    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5, "doc_id")


def test_stratified_sample_rates_per_group(spark):
    from osm2pgsql_spark.operators.dedup import stratified_sample

    df = spark.range(0, 9_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("wiki"), F.lit("web"), F.lit("spam")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
    )
    kept = stratified_sample(
        df, {"wiki": 1.0, "web": 0.2}, "source", "doc_id"
    )
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["wiki"] == 3000  # keep all
    assert 450 < counts["web"] < 750  # ~20%
    assert "spam" not in counts  # default_rate=0 drops


class TestTokenBudgetMixture:
    """token_budget_mixture: two-phase bucketed prefix selection vs a
    single-window Python twin using Spark's own xxhash64 values."""

    N_BUCKETS = 16  # small so several docs share buckets

    def _docs(self, spark):
        rows = []
        for i in range(40):
            rows.append((i, "A", 100 + (i % 7)))
        for i in range(40, 60):
            rows.append((i, "B", 50))
        for i in range(60, 66):
            rows.append((i, "C", 10))
        return spark.createDataFrame(
            rows, "doc_id bigint, source string, n_tokens bigint")

    def _twin(self, spark, docs, budgets):
        hashed = docs.withColumn(
            "h", F.xxhash64(F.col("doc_id").cast("string"), F.lit("")))
        rows = sorted(
            hashed.collect(),
            key=lambda r: (r["source"], r["h"] % self.N_BUCKETS,
                           r["h"], r["doc_id"]))
        keep, cum = set(), {}
        for r in rows:
            b = budgets.get(r["source"], 0)
            prev = cum.get(r["source"], 0)
            if b > 0 and prev < b:
                keep.add(r["doc_id"])
            cum[r["source"]] = prev + r["n_tokens"]
        return keep

    def test_matches_single_window_twin(self, spark):
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        docs = self._docs(spark)
        budgets = {"A": 2000, "B": 10_000_000}  # C absent -> dropped
        got = {r["doc_id"] for r in token_budget_mixture(
            docs, budgets, n_buckets=self.N_BUCKETS).collect()}
        assert got == self._twin(spark, docs, budgets)

    def test_budget_met_not_undershot(self, spark):
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        docs = self._docs(spark)
        out = token_budget_mixture(
            docs, {"A": 2000}, n_buckets=self.N_BUCKETS)
        tot = out.agg(F.sum("n_tokens")).collect()[0][0]
        # crossing doc kept: budget reached, overshoot < one max doc
        assert 2000 <= tot < 2000 + 107

    def test_oversupplied_budget_keeps_everything(self, spark):
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        docs = self._docs(spark)
        out = token_budget_mixture(
            docs, {"B": 10_000_000}, n_buckets=self.N_BUCKETS)
        assert out.where("source = 'B'").count() == 20
        assert out.where("source <> 'B'").count() == 0

    def test_layout_independent(self, spark):
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        docs = self._docs(spark)
        budgets = {"A": 1500, "B": 600}
        a = {r["doc_id"] for r in token_budget_mixture(
            docs, budgets, n_buckets=self.N_BUCKETS).collect()}
        b = {r["doc_id"] for r in token_budget_mixture(
            docs.repartition(13), budgets,
            n_buckets=self.N_BUCKETS).collect()}
        assert a == b


class TestPortableHashMode:
    """portable=True swaps xxhash64 for the md5 hex string so any
    engine with md5 (the DuckDB oracle, PostgreSQL, Trino) reproduces
    every keep decision bit-for-bit — gates stratified_sample /
    token_budget_mix."""

    def test_hex_threshold_edges(self):
        from osm2pgsql_spark.operators.dedup import _hex_threshold

        assert _hex_threshold(0.0) == "0" * 32
        assert _hex_threshold(1.0) == "g"  # > every hex digit
        assert _hex_threshold(0.5) == "8" + "0" * 31
        # any 32-char md5 compares below the rate-1.0 sentinel
        assert "f" * 32 < _hex_threshold(1.0)

    def test_md5_matches_duckdb(self, spark):
        import duckdb

        got = spark.sql(
            "SELECT md5(concat(cast(42 AS string), 's8')) AS h"
        ).collect()[0]["h"]
        want = duckdb.connect().execute("SELECT md5('42s8')").fetchone()[0]
        assert got == want

    def test_deterministic_sample_rate_monotone(self, spark):
        from osm2pgsql_spark.operators.dedup import deterministic_sample

        df = spark.range(0, 500).withColumnRenamed("id", "k")
        small = {r["k"] for r in
                 deterministic_sample(df, 0.2, "k", portable=True).collect()}
        big = {r["k"] for r in
               deterministic_sample(df, 0.6, "k", portable=True).collect()}
        assert small <= big  # threshold-based: samples nest
        assert len(small) == pytest.approx(100, abs=40)
        assert len(big) == pytest.approx(300, abs=60)
        everything = deterministic_sample(df, 1.0, "k", portable=True)
        assert everything.count() == 500

    def test_token_budget_portable_matches_twin(self, spark):
        """Portable two-phase result == single-window twin ordered by
        (md5, key) — the exact DuckDB oracle the driver gate runs."""
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        rows = [(i, "A" if i % 3 else "B", 40 + (i * 7) % 23)
                for i in range(120)]
        docs = spark.createDataFrame(
            rows, "doc_id bigint, source string, n_tokens bigint")
        budgets = {"A": 1200, "B": 700}

        hashed = docs.withColumn(
            "h", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(""))))
        order = sorted(hashed.collect(),
                       key=lambda r: (r["source"], r["h"], r["doc_id"]))
        keep, cum = set(), {}
        for r in order:
            b = budgets.get(r["source"], 0)
            prev = cum.get(r["source"], 0)
            if b > 0 and prev < b:
                keep.add(r["doc_id"])
            cum[r["source"]] = prev + r["n_tokens"]

        got = {r["doc_id"] for r in token_budget_mixture(
            docs, budgets, portable=True).collect()}
        assert got == keep
        rep = {r["doc_id"] for r in token_budget_mixture(
            docs.repartition(11), budgets, portable=True).collect()}
        assert rep == keep


class TestBucketWidthInvariance:
    """r9 directive: the md5-prefix bucket is a prefix of the portable
    order at ANY width, so widths 1/2/3 must produce identical keeps
    (token_budget_mixture) and identical offsets (pack_sequences)."""

    def _docs(self, spark):
        rows = [(i, "A", 100 + (i % 7)) for i in range(60)]
        rows += [(100 + i, "B", 55) for i in range(30)]
        return spark.createDataFrame(
            rows, "doc_id bigint, source string, n_tokens bigint")

    def test_token_budget_width_invariant(self, spark):
        from osm2pgsql_spark.operators.dedup import token_budget_mixture

        docs = self._docs(spark)
        budgets = {"A": 2500, "B": 800}
        keeps = [
            {r["doc_id"] for r in token_budget_mixture(
                docs, budgets, portable=True,
                bucket_hex_width=p).collect()}
            for p in (1, 2, 3)
        ]
        assert keeps[0] == keeps[1] == keeps[2]

    def test_pack_sequences_width_invariant(self, spark):
        from osm2pgsql_spark.operators.curation import pack_sequences

        docs = self._docs(spark)
        packs = [
            {(r["doc_id"], r["offset"], r["pack_id"], r["pack_offset"])
             for r in pack_sequences(
                 docs, 512, bucket_hex_width=p).collect()}
            for p in (1, 2, 3)
        ]
        assert packs[0] == packs[1] == packs[2]
