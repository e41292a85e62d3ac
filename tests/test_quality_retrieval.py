"""Gopher repetition/shape signals (operators/quality.py) and BM25
retrieval scoring (operators/retrieval.py): Spark plan vs the DuckDB
oracle CTEs on crafted edge cases, plus closed-form expectations.

The text_stats gate runs the same twins over the driver's documents
table; these tests cover what the synthetic corpus can't — multi-line
docs, duplicate lines, bullets/ellipses, repeated 5-grams, empty and
whitespace-only text.
"""

import duckdb
import pytest

from osm2pgsql_spark.operators.quality import (
    gopher_oracle_ctes, gopher_signals)
from osm2pgsql_spark.operators.retrieval import (
    bm25_oracle_ctes, bm25_scores)

DOCS = [
    # (doc_id, text)
    (1, "alpha beta\nalpha beta\ngamma delta\n"),          # dup lines
    (2, "- first bullet\n- second bullet\nplain line"),    # bullets
    (3, "to be continued...\nand then…\nthe end"),         # ellipses
    (4, "a b c d e f a b c d e f x y z"),                  # dup 5-grams
    (5, "spark join window spark spark"),                  # bm25 hits
    (6, ""),                                               # empty
    (7, "   \n   \n"),                                     # whitespace only
    (8, "123 456 !!! ??? #tag"),                           # no alpha words
    (9, "one two one two one two"),                        # dominant 2-gram
]

GCOLS = [
    "dup_line_frac", "dup_line_char_frac", "bullet_line_frac",
    "ellipsis_line_frac", "mean_word_len", "alpha_word_frac",
    "top2gram_char_frac", "dup5gram_char_frac",
]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(4)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return sdf, con


def _by_id(rows):
    return {int(r["doc_id"]): r for r in rows}


class TestGopherSignals:
    def test_matches_oracle(self, frames):
        sdf, con = frames
        got = _by_id(gopher_signals(sdf).collect())
        want = _by_id(con.execute(
            f"WITH {gopher_oracle_ctes()} SELECT * FROM gq").fetchdf()
            .to_dict("records"))
        assert set(got) == set(want)
        for did in got:
            for c in GCOLS:
                assert got[did][c] == pytest.approx(
                    want[did][c], abs=1e-9), (did, c)

    def test_closed_forms(self, frames):
        sdf, _ = frames
        g = _by_id(gopher_signals(sdf).collect())
        # doc 1: 3 line instances, 'alpha beta' twice -> 1/3 dup
        assert g[1]["dup_line_frac"] == pytest.approx(1 / 3)
        # all three lines are 10/10/11 chars; 10 dup chars of 31
        assert g[1]["dup_line_char_frac"] == pytest.approx(10 / 31)
        # doc 2: 2 of 3 lines bulleted
        assert g[2]["bullet_line_frac"] == pytest.approx(2 / 3)
        # doc 3: 2 of 3 lines end in an ellipsis (ASCII + unicode)
        assert g[3]["ellipsis_line_frac"] == pytest.approx(2 / 3)
        # doc 4: 'a b c d e' and 'b c d e f' each occur twice ->
        # (2 + 2 occurrences) * 9 chars over 29 text chars, capped at 1
        assert g[4]["dup5gram_char_frac"] == pytest.approx(
            min(1.0, (2 * 9 + 2 * 9) / 29))
        # doc 8: no token contains a letter... except '#tag'
        assert g[8]["alpha_word_frac"] == pytest.approx(1 / 5)
        # doc 9: 'one two' appears 3x in 23 chars -> 3*7/23
        assert g[9]["top2gram_char_frac"] == pytest.approx(3 * 7 / 23)
        # empty + whitespace docs: all signals zero, rows present
        for did in (6, 7):
            for c in GCOLS:
                assert g[did][c] == 0.0, (did, c)

    def test_plan_has_no_python_stage(self, frames):
        sdf, _ = frames
        plan = gopher_signals(sdf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestBM25:
    TERMS = ["spark", "join", "window"]

    def test_matches_oracle(self, frames):
        sdf, con = frames
        got = _by_id(bm25_scores(sdf, self.TERMS).collect())
        want = _by_id(con.execute(
            f"WITH {bm25_oracle_ctes(self.TERMS)} SELECT * FROM bq")
            .fetchdf().to_dict("records"))
        assert set(got) == set(want)
        for did in got:
            assert got[did]["bm25"] == pytest.approx(
                want[did]["bm25"], abs=1e-9), did

    def test_only_matching_docs_score(self, frames):
        sdf, _ = frames
        got = _by_id(bm25_scores(sdf, self.TERMS).collect())
        assert got[5]["bm25"] > 0
        for did in (1, 2, 3, 4, 6, 7, 8, 9):
            assert got[did]["bm25"] == 0.0, did

    def test_tf_saturation(self, frames):
        # doc 5 has tf(spark)=3: score must be below the tf->inf
        # asymptote idf*(k1+1) yet above the tf=1 value — pin the
        # Robertson saturation shape rather than exact constants
        sdf, _ = frames
        import math

        got = _by_id(bm25_scores(sdf, ["spark"]).collect())
        n_docs, df = 7, 1  # N counts docs with >=1 token (6, 7 are empty)
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1)
        assert 0 < got[5]["bm25"] < idf * (1.2 + 1)

    def test_no_cross_join_of_corpus(self, frames):
        # the only cartesian is the 1-row corpus-stats broadcast; the
        # postings never cross-join
        sdf, _ = frames
        plan = (bm25_scores(sdf, self.TERMS)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
