"""Scan-efficiency plan shapes: predicate pushdown + column pruning.

At 100 TB the parquet scan is the dominant cost; these tests pin that
the declarative plans actually reach the scan with PushedFilters and
pruned ReadSchema — the properties PERF_NOTES relies on.  A regression
(e.g. a UDF wrapping a filter column, or a select * sneaking into an
operator) fails here before it shows up as a 100x scan at scale.
"""

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_sections(plan: str) -> list[str]:
    """Each parquet-scan node's detail block from a formatted plan."""
    blocks = []
    for part in plan.split("\n\n"):
        if "Scan parquet" in part or "Format: Parquet" in part:
            blocks.append(part)
    return blocks


def test_bbox_filter_prunes_to_key_column(spark):
    """lon/lat are derived expressions in the synthetic corpus, so the
    range predicate cannot reach parquet — but the scan must still
    read ONLY the key column and keep the filter inside whole-stage
    codegen (no row-at-a-time Python in the path)."""
    df = E.queries()["bbox_filter"](spark, SF_DIR)
    plan = _formatted(df)
    scans = _scan_sections(plan)
    assert scans, plan
    assert any("ReadSchema: struct<p_partkey:bigint>" in s for s in scans), plan
    assert "Filter [codegen" in plan, plan


def test_raw_column_filter_reaches_parquet(spark):
    """A predicate on a STORED column must appear in PushedFilters —
    the property every ingest-time filter relies on at 100 TB."""
    from osm2pgsql_spark.sources.testdata import load_table

    df = load_table(spark, SF_DIR, "documents").where("n_chars > 100").select(
        "doc_id", "n_chars"
    )
    plan = _formatted(df)
    scans = _scan_sections(plan)
    assert scans, plan
    assert any(
        "PushedFilters" in s and "GreaterThan(n_chars,100)" in s for s in scans
    ), plan


def test_way_node_join_prunes_columns(spark):
    """The assembly join needs node locations + way refs — it must
    not drag tag/metadata columns through the shuffle."""
    df = E.queries()["way_node_join"](spark, SF_DIR)
    plan = _formatted(df)
    # lineitem stands in for way_nodes; the scan must not read
    # comment-ish wide columns
    for s in _scan_sections(plan):
        assert "l_comment" not in s, s


def test_media_stats_skips_payload(spark, tmp_path):
    """Metadata-only aggregation over a media table must leave the
    binary payload column out of ReadSchema entirely."""
    from osm2pgsql_spark.operators.multimodal import media_stats, synthesize_media

    path = str(tmp_path / "media.parquet")
    synthesize_media(spark, n=16).write.mode("overwrite").parquet(path)
    df = media_stats(spark.read.parquet(path))
    plan = _formatted(df)
    schemas = [ln for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert schemas, plan
    for ln in schemas:
        assert "payload" not in ln and "binary" not in ln, ln
        assert "meta" in ln, ln


def test_text_stats_reads_only_needed_columns(spark):
    df = E.queries()["text_stats"](spark, SF_DIR)
    plan = _formatted(df)
    for s in _scan_sections(plan):
        # documents has lang/source metadata the gate never touches
        assert "source" not in s, s


def test_events_hourly_pushdown_and_pruning(spark):
    df = E.queries()["events_hourly"](spark, SF_DIR)
    plan = _formatted(df)
    scans = _scan_sections(plan)
    assert scans, plan
    for s in scans:
        assert "payload" not in s and "session_id" not in s or "Schema" not in s, s
