"""Near-dup clustering: connected components + keep decisions."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.dedup import cluster_pairs, dedup_decisions


def test_cluster_pairs_chain(spark):
    # chain 1-2, 2-3 and isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_decisions(spark):
    docs = spark.range(1, 7).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "doc_a bigint, doc_b bigint")
    rows = {r["doc_id"]: (r["keep"], r["cluster_id"]) for r in dedup_decisions(docs, pairs).collect()}
    assert rows[1] == (True, 1)
    assert rows[2] == (True, 2)   # cluster head
    assert rows[4] == (False, 2)
    assert rows[5] == (False, 2)
    assert rows[3] == (True, 3) and rows[6] == (True, 6)
    assert sum(1 for k, (keep, _) in rows.items() if keep) == 4


def test_duplicated_spans_semantics(spark):
    from osm2pgsql_spark.operators.dedup import duplicated_spans, strip_duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} omega"),
            (3, "solo text with no overlap anywhere at all kept intact"),
            (4, "short doc"),  # shorter than k -> no grams
            # within-doc-only repetition: k-grams repeat inside doc 5 but
            # appear in no other doc -> not a cross-doc span
            (5, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in duplicated_spans(docs, k=8).collect()
    }
    # doc1: shared occupies tokens 3..12; duplicated 8-grams at
    # positions 3..5 -> span tokens 3..12.  doc2: positions 1..3 ->
    # tokens 1..10.
    assert spans == {(1, 3, 12, 10), (2, 1, 10, 10)}

    cleaned = {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(docs, duplicated_spans(docs, k=8)).collect()
    }
    assert cleaned[1] == "alpha beta gamma delta"
    assert cleaned[2] == "omega"
    assert cleaned[3] == "solo text with no overlap anywhere at all kept intact"
    assert cleaned[5].startswith("x1")  # untouched


def test_duplicated_spans_merges_overlaps(spark):
    from osm2pgsql_spark.operators.dedup import duplicated_spans

    # two docs sharing one long run -> one maximal span each, not one
    # span per duplicated k-gram
    run = " ".join(f"t{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, f"a b {run}"), (2, f"{run} z")], "doc_id bigint, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, k=8).collect()
    )
    assert got == [(1, 3, 32), (2, 1, 30)]


def test_line_dedup_semantics(spark):
    """C4-style line dedup: global first occurrence by (doc_id, pos)
    wins, short lines are never deduplicated, documents rebuild in
    order, a fully-boilerplate doc survives as an empty row."""
    from osm2pgsql_spark.operators.dedup import line_dedup

    boiler = "accept our cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha\n{boiler}\n--\nunique beta"),
            (2, f"{boiler}\nunique gamma\n--"),
            (3, boiler),            # fully boilerplate
            (4, ""),                # empty
            (5, None),              # NULL
            (6, f"--\n{boiler}"),   # only short + duplicate lines
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_chars=4).collect()}
    assert len(out) == 6  # rows preserved 1:1
    # doc 1 holds the first occurrence of the boilerplate line
    assert out[1]["text"] == f"unique alpha\n{boiler}\n--\nunique beta"
    assert out[1]["n_lines"] == 4 and out[1]["n_kept_lines"] == 4
    # later occurrences drop; short '--' separators always survive
    assert out[2]["text"] == "unique gamma\n--"
    assert out[2]["n_kept_lines"] == 2
    assert out[3]["text"] == "" and out[3]["n_kept_lines"] == 0
    # empty / NULL text: one empty line, short, kept
    assert out[4]["text"] == "" and out[4]["n_kept_lines"] == 1
    assert out[5]["text"] == "" and out[5]["n_lines"] == 1
    assert out[6]["text"] == "--"


def test_line_dedup_skew_robust_plan(spark):
    """The winners aggregation must be a partial-agg'd hash groupBy
    (map-side combine before the shuffle), NOT a Window over the
    corpus — a boilerplate line repeated 10^9 times would serialize
    through a single window partition otherwise."""
    from osm2pgsql_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, f"line a\nline b{i}") for i in range(30)],
        "doc_id long, text string")
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_line_dedup_decisions_shuffle_text_does_not(spark):
    """r12 VERDICT #2 pin: the dedup decision path is text-free —
    every shuffle Exchange except the final one-row-per-doc join of
    drop lists back to `docs` must carry only ids/positions/16-byte
    hashes, never a line or document text column.  A boilerplate line
    repeated 10^9 times must never drag its text through the skewed
    md5-key join."""
    from osm2pgsql_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, f"line a\nline b{i}") for i in range(30)],
        "doc_id long, text string")

    def exchange_outputs(node, acc):
        if "ShuffleExchange" in node.getClass().getSimpleName():
            out = node.output()
            acc.append([out.apply(i).name() for i in range(out.size())])
        ch = node.children()
        for i in range(ch.size()):
            exchange_outputs(ch.apply(i), acc)
        return acc

    jplan = line_dedup(docs)._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in jplan.getClass().getSimpleName():
        jplan = jplan.initialPlan()  # sparkPlan() predates EnsureRequirements
    shuffles = exchange_outputs(jplan, [])
    assert len(shuffles) >= 3  # winners agg, drops agg, final doc join
    texty = [cols for cols in shuffles
             if any(c in ("line", "text") for c in cols)]
    # exactly one text-bearing shuffle: docs into the final id join
    assert len(texty) == 1 and "text" in texty[0], shuffles


def test_line_dedup_null_text_matches_duckdb_twin(spark):
    """r12 ADVICE: NULL source/text must give identical results on
    both engines.  The gate corpus carries no NULLs, so this pins the
    latent case directly: a NULL-bearing frame through line_dedup vs
    line_dedup_sql on the same rows in DuckDB."""
    import duckdb

    from osm2pgsql_spark.operators.dedup import line_dedup, line_dedup_sql

    rows = [
        (1, "shared header line\nunique one"),
        (2, None),
        (3, "shared header line\nunique three"),
        (4, ""),
        (5, "unique five\nshared header line"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["text"], r["n_lines"], r["n_kept_lines"])
        for r in line_dedup(docs, min_chars=4).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        line_dedup_sql(min_chars=4)).fetchall()))
    assert got == want
    # and the NULL doc specifically: one empty (short, kept) line
    by_id = dict((t[0], t) for t in got)
    assert by_id[2] == (2, "", 1, 1)
