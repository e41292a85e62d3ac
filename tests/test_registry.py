"""Driver-window discipline (queries.py): the external driver
samples the FIRST 50 registered gates, so the window must be a
deliberate, fully-triaged choice — every registered gate is either
in the round's window or in its documented tail with the in-window
gate that keeps its family covered (r11 VERDICT #4 / ADVICE).

r13 VERDICT #1: rotation is MECHANICAL — the window derives from the
round number's parity via _WINDOW_SLOTS + _ROTATING_PAIRS, so every
gate is driver-checked at least every other round without hand-edits.
"""

import os

import pytest

from osm2pgsql_spark import queries as Q

# the r12 hand-edited tail set (r12 VERDICT #1: all must be in-window
# on round 13)
R12_TAIL = {
    "pricing_summary", "way_node_join", "tag_filter_json",
    "tile_expiry_rollup", "text_stats", "minhash_near_dups",
    "simhash_hamming_pairs", "ann_lsh_topk", "ann_ivf_topk",
    "sessionize", "importance_rank", "ccnet_ppl_buckets",
    "sequence_packing", "flex_generic_lines", "relation_multiline_merge",
    "decontam_spans", "line_dedup",
}

# the r12 hand-edited window, kept as the even-parity reference
R12_WINDOW = [
    "way_length", "bbox_filter", "merge_dedup", "z_order",
    "way_polygon_area", "wildcard_tag_filter", "quadkey_buckets",
    "reverse_deps", "locator_all_intersecting", "dedup_exact_fingerprint",
    "url_filter_decisions", "text_quality_signals", "quality_classifier",
    "doc_chunks", "sketch_suite", "unimax_mixture",
    "exact_quantiles", "ngram_jaccard", "ann_cosine_topk",
    "events_hourly", "discrete_isolation", "relation_member_join",
    "topk_per_group", "pii_scrub", "flex_casts",
    "user_table", "expire_line_tiles", "stratified_sample",
    "two_stage_refs", "flex_route_relations", "ann_pq_suite",
    "embedding_near_dups", "input_validation", "dedup_decisions",
    "token_budget_mix", "river_width_propagation", "dsir_selection",
    "bpe_encode", "semdedup_decisions", "relation_multipolygon_rings",
    "relation_collect_suite", "append_diff_fold", "river_width_from_areas",
    "pgsql_legacy_suite", "river_contraction", "epsg_registry_tail",
    "geom_suite", "vector_tile_cut", "copy_encoding", "polylabel",
]


@pytest.mark.parametrize("round_no", [12, 13, 14, 15])
def test_window_is_exactly_fifty_known_gates(round_no):
    window, tail = Q._window_for_round(round_no)
    assert len(window) == 50
    assert len(set(window)) == 50
    unknown = [n for n in window if n not in Q._QUERIES]
    assert not unknown, unknown


@pytest.mark.parametrize("round_no", [12, 13])
def test_every_gate_triaged_window_or_tail(round_no):
    window, tail = Q._window_for_round(round_no)
    wset, tset = set(window), set(tail)
    assert not wset & tset, wset & tset
    registered = set(Q._QUERIES)
    assert wset | tset == registered, {
        "untriaged": sorted(registered - wset - tset),
        "stale": sorted((wset | tset) - registered),
    }
    # every tail gate's family representative is actually in-window
    bad = {t: rep for t, rep in tail.items() if rep not in wset}
    assert not bad, bad


def test_parity_rotation_covers_every_gate_across_two_rounds():
    w13, _ = Q._window_for_round(13)
    w14, _ = Q._window_for_round(14)
    assert set(w13) | set(w14) == set(Q._QUERIES)
    # parity is the only input: same-parity rounds share a window
    assert Q._window_for_round(15) == Q._window_for_round(13)
    assert Q._window_for_round(12) == Q._window_for_round(14)


def test_round13_window_contains_the_entire_r12_tail():
    # r12 VERDICT #1: CORRECTNESS_r13.json must contain >=15 of the
    # r12 tail set; the mechanical layout puts in all 17
    window, tail = Q._window_for_round(13)
    assert R12_TAIL <= set(window), R12_TAIL - set(window)
    # and the even layout is exactly the r12 hand-edited window, so
    # flipping back loses nothing
    assert Q._window_for_round(12)[0] == R12_WINDOW


def test_current_round_detection(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "14")
    assert Q._current_round() == 14
    monkeypatch.delenv("SPARK_GRAFT_ROUND")
    # with the real repo root present, round = newest CORRECTNESS + 1
    root = os.path.dirname(os.path.dirname(os.path.abspath(Q.__file__)))
    import re
    best = 0
    for fn in os.listdir(root):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            best = max(best, int(m.group(1)))
    if best:
        assert Q._current_round() == best + 1


def test_window_order_is_applied():
    window, _ = Q._driver_layout()
    qs = list(Q.queries())
    assert qs[:50] == window
    assert list(Q.oracle_sql())[:50] == [
        n for n in window if n in Q._ORACLES]


def test_untriaged_gate_raises():
    Q._QUERIES["__phantom_gate__"] = lambda s, d: None
    try:
        with pytest.raises(KeyError, match="__phantom_gate__"):
            Q.queries()
    finally:
        del Q._QUERIES["__phantom_gate__"]
