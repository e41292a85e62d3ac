"""Polylabel tests — expected values ported from
/root/reference/tests/test-geom-pole-of-inaccessibility.cpp."""

import numpy as np
import pytest

from osm2pgsql_spark.functions.polylabel import pole_of_inaccessibility


def ring(*pts):
    return np.asarray(pts, dtype="f8")


def test_empty_returns_none():
    assert pole_of_inaccessibility([]) is None
    assert pole_of_inaccessibility([ring((0, 0), (1, 1))]) is None


def test_unit_square_center():
    r = ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0))
    p = pole_of_inaccessibility([r], precision=0.01)
    assert p[0] == pytest.approx(0.5, abs=0.01)
    assert p[1] == pytest.approx(0.5, abs=0.01)


def test_unit_square_reverse_winding():
    r = ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))
    p = pole_of_inaccessibility([r], precision=0.01)
    assert p[0] == pytest.approx(0.5, abs=0.01)
    assert p[1] == pytest.approx(0.5, abs=0.01)


def test_polygon_with_hole():
    # reference: middle.x ~ 3.0, 1.0 <= middle.y <= 2.0
    outer = ring((0, 0), (0, 3), (4, 3), (4, 0), (0, 0))
    inner = ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))
    p = pole_of_inaccessibility([outer, inner], precision=0.00001)
    assert p[0] == pytest.approx(3.0, abs=0.01)
    assert 1.0 <= p[1] <= 2.0


def test_stretch_factor():
    # reference: L-shaped polygon, stretch=2 -> (1.0, 0.5)
    r = ring((0, 0), (0, 3), (1, 3), (1, 1), (2, 1), (2, 0), (0, 0))
    p = pole_of_inaccessibility([r], precision=0.01, stretch=2)
    assert p[0] == pytest.approx(1.0, abs=0.05)
    assert p[1] == pytest.approx(0.5, abs=0.05)
