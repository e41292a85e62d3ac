"""Scale-curve harness: measure the shuffle-bound queries one decade
past sf0.1 (a ~sf1-equivalent synthetic corpus, 100x the sf0.01 gate
data) and report the growth exponent.

The corpus is derived, not copied: the TPC-H-ish key tables (part,
lineitem) are replicated N times with key offsets — osm_synth's
modulo-arithmetic lon/lat/tag formulas map the shifted keys onto fresh
coordinates, so ways/nodes keep the real distribution at N-fold row
count — and embeddings are regenerated at N-fold size from a seeded
per-row kernel with a planted near-duplicate fraction (pure
replication would make every copy a near-dup of its sibling and turn
the near-dup queries output-bound).

Usage:
  python tools/scale_curve.py [--copies 10] [--out /tmp/sf1eq]
      [--runs 3] [--queries embedding_near_dups,...]

Prints one JSON line: per-query medians at sf0.1 and at the synthetic
decade, the ratio, and the log10 exponent (1.0 == linear in data).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "embedding_near_dups",
    "flex_generic_lines",
    "ann_cosine_topk",
    "way_polygon_area",
]

SF01 = "/root/testdata/sf0.1"


def build_corpus(spark, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    # --- key tables, replicated with offset keys ---------------------
    part = spark.read.parquet(os.path.join(SF01, "part.parquet"))
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    pmax = part.agg(F.max("p_partkey")).collect()[0][0]
    omax = li.agg(F.max("l_orderkey")).collect()[0][0]

    cdf = spark.range(copies).withColumnRenamed("id", "copy")
    part_n = (
        part.crossJoin(F.broadcast(cdf))
        .withColumn("p_partkey", F.col("p_partkey") + F.col("copy") * (pmax + 1))
        .drop("copy")
    )
    li_n = (
        li.crossJoin(F.broadcast(cdf))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * (omax + 1))
        .withColumn("l_partkey", F.col("l_partkey") + F.col("copy") * (pmax + 1))
        .drop("copy")
    )
    part_n.write.mode("overwrite").parquet(os.path.join(out_dir, "part.parquet"))
    li_n.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))

    # --- orders + customer, replicated with offset keys ---------------
    # the rivers operators derive their edge lists from orders (each
    # customer's orders form one waterway chain), so scaling them
    # needs N-fold CHAINS (same diameter, 10x rows — exactly the shape
    # pointer-jumping must survive); o_orderkey shares lineitem's
    # offset so order joins stay consistent, o_custkey/c_custkey share
    # theirs for the customer joins
    od = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    cu = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    cmax = cu.agg(F.max("c_custkey")).collect()[0][0]
    od_n = (
        od.crossJoin(F.broadcast(cdf))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * (omax + 1))
        .withColumn("o_custkey", F.col("o_custkey") + F.col("copy") * (cmax + 1))
        .drop("copy")
    )
    cu_n = (
        cu.crossJoin(F.broadcast(cdf))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("copy") * (cmax + 1))
        .drop("copy")
    )
    od_n.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    cu_n.write.mode("overwrite").parquet(os.path.join(out_dir, "customer.parquet"))

    # --- embeddings, regenerated at N-fold size ----------------------
    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    n_base = emb.count()
    dim = len(emb.select("embedding").first()[0])
    n_total = n_base * copies

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_vecs = []
            labels = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                v = rng.standard_normal(dim)
                # planted near-dup fraction ~10%: jitter the vector of
                # the id one below (same structure the generated
                # corpus has at sf0.1)
                if i % 10 == 9 and i > 0:
                    rng2 = np.random.RandomState(int(i - 1) % (2**31))
                    v = rng2.standard_normal(dim) + 0.05 * v
                v = v / np.linalg.norm(v)
                out_vecs.append(v.astype("float32"))
                labels.append(int(i % 7))
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": out_vecs,
                "label": pd.array(labels, dtype="int32"),
            })

    spark.range(n_total).repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # --- documents, replicated with offset doc_ids --------------------
    # (text reused verbatim: the scaled queries — packing, classifier,
    # rank, sketch, token stats — are content-agnostic per row, unlike
    # the near-dup family, which measures on embeddings above)
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    dmax = docs.agg(F.max("doc_id")).collect()[0][0]
    docs_n = (
        docs.crossJoin(F.broadcast(cdf))
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * (dmax + 1))
        .drop("copy")
    )
    docs_n.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))

    # small lookup tables some loaders touch — pass through unchanged
    for t in ("region", "nation", "supplier", "events"):
        src = os.path.join(SF01, t + ".parquet")
        if os.path.exists(src):
            dst = os.path.join(out_dir, t + ".parquet")
            if not os.path.exists(dst):
                os.symlink(src, dst)


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1eq")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as E
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("scale-curve")
    if not args.skip_build:
        build_corpus(spark, args.out, args.copies)

    qs = E.queries()
    import math

    report = {}
    for name in args.queries.split(","):
        fn = qs[name]
        t_small = time_query(spark, fn, SF01, args.runs)
        t_big = time_query(spark, fn, args.out, args.runs)
        ratio = t_big / t_small
        report[name] = {
            "sf0.1_sec": round(t_small, 2),
            "decade_sec": round(t_big, 2),
            "ratio": round(ratio, 2),
            "exponent": round(math.log10(max(ratio, 1e-9)), 2),
        }
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
              f"(x{ratio:.2f}, exp {report[name]['exponent']})",
              file=sys.stderr)
    print(json.dumps({"copies": args.copies, "queries": report}))


if __name__ == "__main__":
    main()
