"""CostFunction / GapAffineCostTable utility semantics
(costs/cost_function.rs:36-153 parity + engine-support helpers)."""

import numpy as np
import pytest

from tsalign_tpu.costs import INF, POS_INF_INPUT, CostFunction


def _cf(points):
    return CostFunction(list(points))


def test_evaluate_step_semantics():
    f = _cf([(-5, INF), (0, 3), (4, 1), (10, INF)])
    with pytest.raises(ValueError):
        f.evaluate(-6)
    assert f.evaluate(-5) == INF
    assert f.evaluate(-1) == INF
    assert f.evaluate(0) == 3
    assert f.evaluate(3) == 3
    assert f.evaluate(4) == 1
    assert f.evaluate(9) == 1
    assert f.evaluate(10**9) == INF


def test_min_in_and_min_from():
    f = _cf([(-5, INF), (0, 3), (4, 1), (10, INF)])
    assert f.min_in(0, 4) == 3
    assert f.min_in(0, 5) == 1
    assert f.min_in(-5, 0) == INF
    assert f.min_in(5, 5) is None
    assert f.min_from(4) == 1
    assert f.min_from(10) == INF


def test_finite_bounds_and_window():
    f = _cf([(-5, INF), (0, 3), (4, 1), (10, INF)])
    assert f.minimum_finite_input() == 0
    assert f.maximum_finite_input() == 9
    assert f.finite_window() == (0, 9)
    # unbounded-above finite domain -> None / POS_INF_INPUT
    g = _cf([(0, 2)])
    assert g.maximum_finite_input() is None
    assert g.finite_window() == (0, POS_INF_INPUT)
    h = _cf([(0, INF)])
    assert h.finite_window() is None


def test_scale_saturates_inf():
    f = _cf([(-1, INF), (0, 3)])
    s = f.scale(1000)
    assert s.evaluate(0) == 3000
    assert s.evaluate(-1) == INF


def test_to_dense_matches_evaluate():
    f = _cf([(-2, 5), (1, 0), (3, INF)])
    d = f.to_dense(-2, 4)
    assert d.tolist() == [f.evaluate(x) for x in range(-2, 5)]
    assert d.dtype == np.int64


def test_v_shape():
    assert _cf([(-3, 4), (-1, 2), (0, 0), (2, 5)]).is_v_shaped()
    assert not _cf([(-3, 1), (-1, 2), (0, 0)]).is_v_shaped()
    assert not _cf([(0, 3), (1, 2)]).is_v_shaped()
