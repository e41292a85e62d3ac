"""Replication driver — Spark port of scripts/osm2pgsql-replication.

Reference: the ~1000-line Python script polls an OSM diff server,
tracks the sequence number in the osm2pgsql_properties table and
invokes append mode per diff.  Here the state lives in a Properties
JSON, diffs are .osc(.gz) files in a directory (a download step can
be added where network is available), and each diff is applied with
the batch-incremental machinery in streaming.append.

Usage:
  python tools/replication.py init  STATE.json --seq N
  python tools/replication.py apply STATE.json BASE_DIR DIFF_DIR
      # BASE_DIR holds nodes/ways/relations parquet snapshots;
      # DIFF_DIR holds NNN.osc(.gz) files named by sequence number.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_init(args) -> None:
    from osm2pgsql_spark.streaming.properties import Properties

    p = Properties(args.state)
    p.set("output", "flex")
    p.update_replication_state(args.seq, args.timestamp or "")
    print(f"initialized {args.state} at sequence {args.seq}")


def cmd_apply(args) -> None:
    from pyspark.sql import functions as F

    from osm2pgsql_spark.session import get_spark
    from osm2pgsql_spark.sources.osm_xml import read_osc_xml
    from osm2pgsql_spark.streaming.append import affected_ids, apply_diff, ways_to_recompute
    from osm2pgsql_spark.streaming.properties import Properties

    props = Properties(args.state)
    seq = int(props.get("replication_sequence_number", "0"))

    # pending diffs: files named <seq>.osc or <seq>.osc.gz with seq
    # greater than the stored state, in order
    pending = []
    for fn in os.listdir(args.diff_dir):
        m = re.match(r"^(\d+)\.osc(\.gz)?$", fn)
        if m and int(m.group(1)) > seq:
            pending.append((int(m.group(1)), os.path.join(args.diff_dir, fn)))
    pending.sort()
    if not pending:
        print(f"up to date at sequence {seq}")
        return

    spark = get_spark("osm2pgsql-replication")
    spark.sparkContext.setLogLevel("ERROR")

    def load(name):
        return spark.read.parquet(os.path.join(args.base_dir, f"{name}.parquet"))

    nodes, ways, rels = load("nodes"), load("ways"), load("relations")

    for new_seq, path in pending:
        node_diff, way_diff, rel_diff = read_osc_xml(spark, path)
        nodes = apply_diff(nodes, node_diff)
        ways = apply_diff(ways, way_diff)
        rels = apply_diff(rels, rel_diff)
        sets = affected_ids(node_diff, way_diff, rel_diff, ways, rels)
        n_pending = ways_to_recompute(sets).count()
        print(f"applied seq {new_seq}: {n_pending} ways to recompute")
        seq = new_seq

    # atomic-ish snapshot swap, then state update (crash between the
    # two re-applies idempotent diffs: apply_diff is a keyed MERGE)
    for name, df in (("nodes", nodes), ("ways", ways), ("relations", rels)):
        tmp = os.path.join(args.base_dir, f"{name}.parquet.new")
        df.write.mode("overwrite").parquet(tmp)
        final = os.path.join(args.base_dir, f"{name}.parquet")
        back = spark.read.parquet(tmp)
        back.write.mode("overwrite").parquet(final)
    props.update_replication_state(seq, "")
    print(f"state now at sequence {seq}")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_init = sub.add_parser("init")
    p_init.add_argument("state")
    p_init.add_argument("--seq", type=int, required=True)
    p_init.add_argument("--timestamp", default="")
    p_init.set_defaults(fn=cmd_init)
    p_apply = sub.add_parser("apply")
    p_apply.add_argument("state")
    p_apply.add_argument("base_dir")
    p_apply.add_argument("diff_dir")
    p_apply.set_defaults(fn=cmd_apply)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
