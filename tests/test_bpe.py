"""Distributed BPE tokenizer (operators/bpe.py): the Spark-trained
merges must equal a reference pure-python trainer on the same corpus,
and encoding must reproduce the trained symbol segmentation."""

import collections

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import bpe


def _reference_train(word_counts: dict[str, int], num_merges: int,
                     min_pair_count: int = 2):
    """Sennrich-style reference trainer (driver-side oracle)."""
    syms = {w: list(w) + [bpe.END] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        counts: collections.Counter = collections.Counter()
        for w, cnt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += cnt
        if not counts:
            break
        # max count, ties by (a, b) ascending — same as the Spark sort
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w in syms:
            s = syms[w]
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=12)
    wc = collections.Counter(
        w for line in CORPUS for w in line.lower().split()
    )
    expected, _ = _reference_train(dict(wc), 12)
    assert merges == expected
    # the classic example: 'est' forms early from newest/widest
    joined = ["".join(p) for p in merges]
    assert any("est" in t for t in joined)


def test_encode_matches_training_segmentation(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=12)
    wc = collections.Counter(w for line in CORPUS for w in line.lower().split())
    _, ref_syms = _reference_train(dict(wc), 12)

    enc = bpe.encode(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    for i, line in enumerate(CORPUS):
        expected = [t for w in line.lower().split() for t in ref_syms[w]]
        assert rows[i]["tokens"] == expected
        assert rows[i]["n_tokens"] == len(expected)


def test_overlapping_pair_merges_leftmost_first(spark):
    """'aaa' under merge (a,a): leftmost-first gives [aa, a], never
    [a, aa] or a double merge."""
    docs = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id long, text string")
    merges = bpe.train_bpe(docs, num_merges=1)
    assert merges == [("a", "a")]
    enc = bpe.encode(docs, merges).collect()[0]
    assert enc["tokens"] == ["aa", "a", bpe.END] * 3 or enc["tokens"] == [
        "aa", "a" + bpe.END
    ] * 3


def test_unknown_chars_and_vocab(spark):
    docs = spark.createDataFrame(
        [(0, "abc abc zq")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=4)
    enc = bpe.encode(
        spark.createDataFrame([(1, "xyz abc")], "doc_id long, text string"),
        merges,
    ).collect()[0]
    # unseen word falls back to characters + end marker
    assert enc["tokens"][:4] == ["x", "y", "z", bpe.END] or enc["tokens"][0] == "x"
    v = bpe.vocab(merges, docs)
    assert bpe.END in v and all("".join(p) in v for p in merges)


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges = bpe.train_bpe(docs, num_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once
