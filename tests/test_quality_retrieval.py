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


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        from osm2pgsql_spark.operators.pii import pii_scrub

        docs = spark.createDataFrame(
            [
                (1, "mail a.b+c@ex-am.ple.org and 10.0.3.1 "
                    "call 555-123-4567 or 555 1234 5678"),
                (2, "no pii here"),
                (3, None),
                (4, "edge 1.2.3.4.5 and x@y.io"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
        r1 = rows[1]
        assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (1, 1, 2)
        assert "<EMAIL>" in r1["redacted"] and "<IP>" in r1["redacted"]
        assert r1["redacted"].count("<PHONE>") == 2
        assert "@" not in r1["redacted"]
        r2 = rows[2]
        assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
        assert r2["redacted"] == "no pii here"
        r3 = rows[3]
        assert (r3["n_email"], r3["n_ipv4"], r3["n_phone"]) == (0, 0, 0)
        assert r3["redacted"] is None
        # dotted run longer than an IPv4: the first 4 octets match
        # (\b holds between digit and dot) — pinned cross-engine
        assert rows[4]["n_ipv4"] == 1
        assert rows[4]["redacted"].startswith("edge <IP>.5")

    def test_cross_engine_parity(self, spark):
        """Counts and redacted text agree with DuckDB on adversarial
        inputs (boundary cases of \\b and the RE2/Java common
        subset)."""
        import duckdb

        from osm2pgsql_spark.operators.pii import (
            pii_counts_sql, pii_redact_sql, pii_scrub,
        )

        texts = [
            "a@b.co c@d.museum 999.999.999.999 000-000-0000",
            "x55-123-4567 1234-567-8901 .10.0.0.1. v1.2.3",
            "mail@sub.domain.example.co.uk, (555-123-4567)",
            "@nope.com no@tld 10.0.0 10.0.0.1.2.3 555 12345 6789",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        got = {r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"],
                             r["redacted"])
               for r in pii_scrub(docs).collect()}
        con = duckdb.connect()
        counts = ", ".join(pii_counts_sql("t"))
        for i, t in enumerate(texts):
            row = con.execute(
                f"SELECT {counts}, {pii_redact_sql('t')} "
                f"FROM (SELECT ? AS t)", [t]).fetchone()
            assert got[i] == row, (i, got[i], row)


class TestUrlFilter:
    def test_domain_subdomain_pattern_and_edge(self, spark):
        from osm2pgsql_spark.operators.url_filter import url_filter

        docs = spark.createDataFrame(
            [
                (1, "https://ads.example.com/banner"),     # exact domain
                (2, "https://a.b.tracker.net/pixel"),      # deep subdomain
                (3, "https://nottracker.net/x"),           # suffix NON-match
                (4, "https://good.org/file.exe?download"), # pattern
                (5, "no scheme here"),                     # hostless: keep
                (6, None),                                 # NULL url: keep
                (7, "https://Example.COM/ok"),             # case-folded host
            ],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r for r in url_filter(
            docs, ["ads.example.com", "tracker.net"],
            [r"\.exe(\?|$)"]).collect()}
        assert out[1]["blocked_domain"] == "ads.example.com"
        assert out[2]["blocked_domain"] == "tracker.net"
        assert not out[1]["is_kept"] and not out[2]["is_kept"]
        # 'nottracker.net' must NOT suffix-match 'tracker.net'
        assert out[3]["blocked_domain"] is None and out[3]["is_kept"]
        assert out[4]["blocked_pattern"] and not out[4]["is_kept"]
        assert out[5]["host"] == "" and out[5]["is_kept"]
        assert out[6]["is_kept"]
        assert out[7]["host"] == "example.com" and out[7]["is_kept"]

    def test_blocklist_broadcasts(self, spark):
        from osm2pgsql_spark.operators.url_filter import url_filter

        docs = spark.createDataFrame(
            [(i, f"https://h{i}.org/") for i in range(50)],
            "doc_id long, url string")
        plan = url_filter(docs, ["x.com"], [])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    def test_sql_twin_empty_and_quoted_blocklist(self, spark):
        """The DuckDB twin must not emit a bare `VALUES ` for an empty
        blocklist, and quoted entries must be escaped as literals —
        both engines agree on keep decisions either way."""
        import duckdb

        from osm2pgsql_spark.operators.url_filter import (
            url_filter, url_filter_sql)

        rows = [
            (1, "https://o'brien.example/x"),
            (2, "https://keep.org/page"),
            (3, None),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, url string")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, " + ("NULL" if u is None
                             else "'" + u.replace("'", "''") + "'") + ")"
                for i, u in rows)
            + ") AS t(doc_id, url)")
        for doms, pats in [([], []),
                           (["o'brien.example"], ["pa'ge"]),
                           ([], [r"keep\.org"])]:
            got = {r["doc_id"]: (r["blocked_domain"], r["is_kept"])
                   for r in url_filter(docs, doms, pats).collect()}
            want = {r[0]: (r[3], r[5]) for r in con.execute(
                url_filter_sql(doms, pats)).fetchall()}
            assert got == want, (doms, pats, got, want)
        # empty blocklist keeps everything
        out = url_filter(docs, [], []).collect()
        assert all(r["is_kept"] for r in out) and len(out) == 3
