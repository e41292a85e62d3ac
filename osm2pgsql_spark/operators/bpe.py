"""Distributed byte-pair-encoding tokenizer: training + encoding.

The standard training-data-pipeline tokenizer (Sennrich et al. 2016,
the GPT-2/RoBERTa vocab construction), Spark-first:

- **Training runs on the word-frequency table, not the corpus.**  The
  first (and only corpus-sized) job is a word count; by Zipf's law
  the distinct-word table is orders of magnitude smaller than 100 TB
  of text, and every merge round after that is a bounded job over it.
- **Each merge round is pure Catalyst**: adjacent-pair extraction via
  transform(sequence(...)), weighted pair counts via groupBy().sum(),
  and the merge itself via the aggregate() higher-order function — a
  left-to-right fold that replaces adjacent (a, b) with ab exactly
  like the reference BPE merge (leftmost-first, non-overlapping).
  No Python touches the data during training; the only driver-side
  value per round is the single best (pair, count) row.
- **Lineage discipline**: one withColumn per round would grow the
  plan linearly; the symbol table is re-checkpointed (stats-stripped,
  operators/iterate.checkpoint) every few rounds.
- **Encoding** is an Arrow-batched pandas UDF applying the learned
  merge ranks with the classic greedy-lowest-rank loop; the merge
  list (vocab-size-bounded, a few MB at most) ships to executors via
  closure capture — the same "small model, big data" shape as the
  IVF centroids.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt

END = "▁"  # end-of-word marker (SentencePiece-style visible space)

_CKPT_EVERY = 8


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) frequency table — the one corpus-sized job."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_expr(syms: Column, a: Column, b: Column) -> Column:
    """aggregate() fold replacing each adjacent (a, b) with a||b,
    leftmost-first: after a merge the accumulator's tail is the merged
    token, so overlapping occurrences (e.g. 'aaa' under (a,a)) do not
    double-merge — reference BPE semantics."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...] — the tokenizer model."""
    wc = _words(docs, text_col)
    syms = wc.select(
        "cnt",
        F.concat(
            F.filter(F.split("w", ""), lambda x: x != ""),
            F.array(F.lit(END)),
        ).alias("syms"),
    )
    syms = _ckpt(syms)

    merges: list[tuple[str, str]] = []
    for rnd in range(num_merges):
        # guard: sequence(1, 0) would count DOWN for fully-merged
        # single-symbol words and index past the array
        pairs = syms.where(F.size("syms") > 1).select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", (i + 1).cast("int")).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        syms = syms.withColumn(
            "syms", _merge_expr(F.col("syms"), F.lit(a), F.lit(b))
        )
        if (rnd + 1) % _CKPT_EVERY == 0:
            syms = _ckpt(syms)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    parts = list(word) + [END]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) per document — greedy
    lowest-rank application of the learned merges (the reference BPE
    encode loop), Arrow-batched with a per-batch word cache."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks: list[str] = []
            for word in t.lower().split():
                got = cache.get(word)
                if got is None:
                    got = _encode_word(word, ranks)
                    cache[word] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out, dtype=object)

    return docs.select(
        F.col(id_col),
        tok(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def vocab(merges: list[tuple[str, str]], docs: DataFrame | None = None,
          text_col: str = "text") -> list[str]:
    """Token vocabulary implied by the merges: single characters (from
    the corpus when given), the end marker, and every merge product in
    rank order."""
    base: list[str] = [END]
    if docs is not None:
        chars = (
            docs.select(
                F.explode(
                    F.filter(F.split(F.lower(F.col(text_col)), ""), lambda x: x != "")
                ).alias("c")
            )
            .where(~F.col("c").rlike(r"\s"))
            .distinct()
            .orderBy("c")
            .collect()
        )
        base += [r["c"] for r in chars]
    return base + [a + b for a, b in merges]
