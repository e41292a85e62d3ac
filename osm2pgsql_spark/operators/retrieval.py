"""BM25 retrieval scoring over the documents table (Robertson &
Spärck Jones probabilistic relevance; the Lucene/Okapi BM25 variant
with the +1 idf floor so scores stay non-negative).

score(d, Q) = Σ_{t∈Q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
              · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·dl_d/avgdl))

Spark-first shape — the classic inverted-index scoring expressed as
relational algebra:

- one explode of the shared dedup tokenizer's token array gives the
  postings list; document length and the corpus stats (N, avgdl,
  df_t) are aggregations over it;
- the query is a tiny literal dimension: term filtering happens with
  an `isin` BEFORE the tf groupBy, so only postings matching query
  terms shuffle — at 100 TB the shuffle is O(matching postings), not
  O(corpus);
- corpus scalars (N, avgdl) and the per-term df ride a broadcast
  join; nothing collects to the driver.

The identical math has a DuckDB oracle (bm25_oracle_ctes) wired into
the text_stats gate as the ``bm25`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import similarity as S

K1 = 1.2
B = 0.75


def bm25_scores(docs: DataFrame, terms: list[str], id_col: str = "doc_id",
                text_col: str = "text", k1: float = K1,
                b: float = B) -> DataFrame:
    """(doc_id, bm25) for every input doc; docs matching no query term
    score 0.0."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(S.tokens(F.col(text_col)),
                           lambda t: t != F.lit(""))).alias("w"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n_docs"),
                    F.avg("dl").alias("avgdl"))

    tf = (toks.where(F.col("w").isin(terms))
          .groupBy("doc_id", "w").agg(F.count("*").alias("tf")))
    df_t = tf.groupBy("w").agg(F.count("*").alias("df"))

    scored = (tf.join(F.broadcast(df_t), "w")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .select(
                  "doc_id",
                  (F.log((F.col("n_docs") - F.col("df") + 0.5)
                         / (F.col("df") + 0.5) + 1.0)
                   * F.col("tf") * (k1 + 1)
                   / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                          / F.col("avgdl"))))
                  .alias("part"))
              .groupBy("doc_id").agg(F.sum("part").alias("bm25")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(scored, "doc_id", "left")
            .fillna(0.0, subset=["bm25"]))


def bm25_oracle_ctes(terms: list[str], table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text",
                     k1: float = K1, b: float = B) -> str:
    """DuckDB CTE chain; the final CTE is ``bq(doc_id, bm25)``."""
    toks = f"list_filter({S.tokens_sql(text_col)}, x -> x <> '')"
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    # e-notation so DuckDB parses DOUBLE, not DECIMAL (see PERF_NOTES)
    k1, b = f"{float(k1)}e0", f"{float(b)}e0"
    return f"""
    bt AS (SELECT {id_col} AS doc_id, unnest({toks}) AS w FROM {table}),
    bdl AS (SELECT doc_id, count(*) AS dl FROM bt GROUP BY doc_id),
    bcorp AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM bdl),
    btf AS (SELECT doc_id, w, count(*) AS tf FROM bt
            WHERE w IN ({term_list}) GROUP BY doc_id, w),
    bdf AS (SELECT w, count(*) AS df FROM btf GROUP BY w),
    bsc AS (SELECT doc_id,
                   sum(ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
                       * tf * ({k1} + 1)
                       / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)))
                       AS bm25
            FROM btf JOIN bdf USING (w) JOIN bdl USING (doc_id), bcorp
            GROUP BY doc_id),
    bq AS (SELECT d.{id_col} AS doc_id, coalesce(bsc.bm25, 0.0e0) AS bm25
           FROM {table} d LEFT JOIN bsc USING (doc_id))
    """
