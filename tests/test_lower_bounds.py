"""Tests for the TSLB-style remaining-cost lower bound (lower_bounds.py).

The reference precomputes whole-TSM lower-bound matrices to prune its A*
frontier (lib_tsalign/src/a_star_aligner/lower_bounds/template_switch.rs:75-284);
our counterpart is the relaxed-graph backward field B and the one-TSM entry
bound S.  Exactness of the engines' lb-based stopping is covered by the
randomized oracle-equality suites (test_engine.py, test_jax_engine.py);
here we pin the bound's own contracts:

  * windowed_min against brute force (the sliding-min workhorse);
  * admissibility: B[i, j] never exceeds the true optimal cost of aligning
    the suffix pair (ref[i:], qry[j:]) — the engine's remaining cost from a
    fresh Primary state at (i, j);
  * the point of the exercise: the round loop on a planted one-TSM case
    stops without confirmation-round churn.
"""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.costs import INF
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.lower_bounds import compute_remaining_bound, windowed_min

from util import random_config, related_pair


def _brute_windowed_min(arr, a, b, axis):
    x = np.moveaxis(arr, axis, -1)
    n = x.shape[-1]
    out = np.full_like(x, INF)
    for t in range(n):
        lo, hi = t + a, t + b
        lo2, hi2 = max(0, lo), min(n - 1, hi)
        if lo2 <= hi2:
            out[..., t] = x[..., lo2 : hi2 + 1].min(axis=-1)
    return np.moveaxis(out, -1, axis)


@pytest.mark.parametrize("seed", range(6))
def test_windowed_min_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(1, 9)) for _ in range(2))
    arr = rng.integers(0, 50, size=shape).astype(np.int64)
    arr[rng.random(shape) < 0.2] = INF
    for axis in (0, 1):
        a = int(rng.integers(-6, 4))
        b = a + int(rng.integers(0, 7))
        got = windowed_min(arr, a, b, axis=axis)
        want = _brute_windowed_min(arr, a, b, axis)
        assert np.array_equal(got, want), (shape, axis, a, b)


def test_windowed_min_empty_window():
    arr = np.arange(12, dtype=np.int64).reshape(3, 4)
    assert (windowed_min(arr, 2, 1, axis=1) == INF).all()


@pytest.mark.parametrize("seed", range(8))
def test_remaining_bound_admissible_vs_suffix_alignment(seed):
    """B[i, j] <= optimal cost of aligning (ref[i:], qry[j:]): the relaxed
    graph only removes constraints, so its shortest-path field must lower
    bound the true engine's remaining cost from any Primary cell."""
    rng = np.random.default_rng(100 + seed)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=bool(seed % 2))
    ref, qry = related_pair(rng, al, max_len=10)
    n_r, n_q = len(ref), len(qry)
    lb = compute_remaining_bound(cfg, ref, qry, n_r, n_q)
    if lb is None:
        pytest.skip("relaxed value iteration did not converge for this config")
    cells = [(i, j) for i in range(n_r + 1) for j in range(n_q + 1)]
    rng.shuffle(cells)
    for i, j in cells[:12]:
        true_cost = DenseAligner(cfg, ref[i:], qry[j:]).align().cost
        assert lb.B[i, j] <= true_cost, (
            f"cell ({i},{j}): bound {lb.B[i, j]} > true {true_cost}"
        )


def test_remaining_bound_no_ts_kinds_is_exact_gap_affine():
    """With every TSM kind infeasible (all base costs INF), S is all-INF and
    B is the exact gap-affine remaining field of the relaxed tables."""
    rng = np.random.default_rng(7)
    al = get_alphabet("dna")
    cfg = random_config(rng, al)
    from dataclasses import replace

    cfg = replace(cfg, base_cost={k: INF for k in cfg.base_cost})
    ref, qry = related_pair(rng, al, max_len=8)
    lb = compute_remaining_bound(cfg, ref, qry, len(ref), len(qry))
    assert lb is not None
    assert (lb.S >= INF).all()
    assert lb.B[len(ref), len(qry)] == 0


def test_planted_tsm_round_loop_stops_early():
    """The lb stop ends the round loop right after the improving round: a
    single planted TSM needs round 1 to find it and round 2 to confirm the
    pruned entry field is stable — no rounds-3/4 churn (the VERDICT perf
    item this module exists for)."""
    al = get_alphabet("dna")
    cfg_rng = np.random.default_rng(3)
    cfg = random_config(cfg_rng, al)
    rng = np.random.default_rng(5)
    n = 40
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    lo = 12
    hi = lo + max(3, cfg.template_switch_min_length + 1)
    if hi <= n:
        qry[lo:hi] = [comp[c] for c in qry[lo:hi]][::-1]
    res = DenseAligner(cfg, ref, qry).align()
    assert res.cost < INF
    assert res.rounds <= 3, f"round loop churned: {res.rounds} rounds"
