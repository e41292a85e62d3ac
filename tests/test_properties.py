"""Properties store tests (reference osm2pgsql_properties semantics)."""

from osm2pgsql_spark.streaming.properties import Properties


def test_roundtrip_and_atomic_save(tmp_path):
    p = Properties(str(tmp_path / "props.json"))
    p.set("attributes", "false")
    p.set("output", "flex")
    p.update_replication_state(4213, "2024-01-01T00:00:00Z")

    p2 = Properties(str(tmp_path / "props.json"))
    assert p2.get("output") == "flex"
    assert p2.get("replication_sequence_number") == "4213"


def test_compat_check(tmp_path):
    p = Properties(str(tmp_path / "props.json"))
    p.set("output", "flex")
    p.save()
    p2 = Properties(str(tmp_path / "props.json"))
    assert p2.check_compatible(output="flex") == []
    bad = p2.check_compatible(output="pgsql")
    assert len(bad) == 1 and "output" in bad[0]
    # unknown keys are not a mismatch (fresh import sets them later)
    assert p2.check_compatible(flat_node_file="/x") == []
