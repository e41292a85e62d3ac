"""Driver-window discipline (queries.py): the external driver
samples the FIRST 50 registered gates, so the window must be a
deliberate, fully-triaged choice — every registered gate is either
in _DRIVER_WINDOW or documented in _DRIVER_TAIL with the in-window
gate that keeps its family covered (r11 VERDICT #4 / ADVICE)."""

from osm2pgsql_spark import queries as Q


def test_window_is_exactly_fifty_known_gates():
    assert len(Q._DRIVER_WINDOW) == 50
    assert len(set(Q._DRIVER_WINDOW)) == 50
    unknown = [n for n in Q._DRIVER_WINDOW if n not in Q._QUERIES]
    assert not unknown, unknown


def test_every_gate_triaged_window_or_tail():
    window = set(Q._DRIVER_WINDOW)
    tail = set(Q._DRIVER_TAIL)
    assert not window & tail, window & tail
    registered = set(Q._QUERIES)
    assert window | tail == registered, {
        "untriaged": sorted(registered - window - tail),
        "stale": sorted((window | tail) - registered),
    }
    # every tail gate's family representative is actually in-window
    bad = {t: rep for t, rep in Q._DRIVER_TAIL.items()
           if rep not in window}
    assert not bad, bad


def test_window_order_is_applied():
    qs = list(Q.queries())
    assert qs[:50] == Q._DRIVER_WINDOW
    assert list(Q.oracle_sql())[:50] == [
        n for n in Q._DRIVER_WINDOW if n in Q._ORACLES]


def test_untriaged_gate_raises():
    import pytest

    Q._QUERIES["__phantom_gate__"] = lambda s, d: None
    try:
        with pytest.raises(KeyError, match="__phantom_gate__"):
            Q.queries()
    finally:
        del Q._QUERIES["__phantom_gate__"]
