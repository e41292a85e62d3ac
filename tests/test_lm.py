"""Char-trigram LM perplexity operators (CCNet-style quality signal)."""

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_perplexity_orders_repetitive_below_diverse(spark):
    from osm2pgsql_spark.operators.lm import perplexity3

    # corpus: c3(aaa)=3, c3(aab)=1, context aa: c2=4
    # doc1 = aaaa: both trigrams aaa -> ppl = 4/3
    # doc2 = aaab: aaa + rare aab -> ppl = sqrt(16/3)
    docs = _docs(
        spark,
        [
            (1, "aaaa"),
            (2, "aaab"),
            (3, "ab"),  # shorter than a trigram
        ],
    )
    got = {r["doc_id"]: r for r in perplexity3(docs).collect()}
    assert got[3]["n_tri"] == 0 and got[3]["ppl3"] is None
    assert got[1]["n_tri"] == 2
    assert got[1]["ppl3"] == pytest.approx(4.0 / 3.0)
    assert got[2]["ppl3"] == pytest.approx(math.sqrt(16.0 / 3.0))
    assert got[1]["ppl3"] < got[2]["ppl3"]  # repetitive scores better


def test_perplexity_exact_hand_computation(spark):
    from osm2pgsql_spark.operators.lm import perplexity3

    # corpus: "aab" and "aac" -> trigrams: aab, aac
    # model: c3(aab)=1, c3(aac)=1; context aa: c2=2
    # each doc: 1 trigram, lp = ln(1/2), ppl = 2
    docs = _docs(spark, [(1, "aab"), (2, "aac")])
    got = {r["doc_id"]: r["ppl3"] for r in perplexity3(docs).collect()}
    assert got[1] == pytest.approx(2.0)
    assert got[2] == pytest.approx(2.0)


def test_score_against_reference_corpus(spark):
    from osm2pgsql_spark.operators.lm import score_against

    ref = _docs(spark, [(100, "the cat sat on the mat " * 5)])
    docs = _docs(
        spark,
        [
            (1, "the cat sat on the mat"),  # in-distribution
            (2, "zzqx vvkw jjpy qqrr zz"),  # all grams unseen
        ],
    )
    got = {r["doc_id"]: r for r in score_against(docs, ref).collect()}
    assert got[1]["ppl3"] < got[2]["ppl3"]
    assert got[1]["ppl3"] > 1.0  # smoothing keeps probs < 1
    assert math.isfinite(got[2]["ppl3"])  # unseen grams smoothed, not inf
