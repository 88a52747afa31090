"""JAX device engine vs numpy executable spec: exact cost equality."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.jax_engine import JaxAligner

from util import random_config, related_pair


def test_jax_engine_matches_numpy_randomized():
    rng = np.random.default_rng(42)
    al = get_alphabet("dna")
    for trial in range(6):
        cfg = random_config(rng, al, flanks=(trial % 2 == 0))
        ref, qry = related_pair(rng, al, max_len=10)
        mts = [None, 1, 2][trial % 3]
        nc = DenseAligner(cfg, ref, qry, max_template_switches=mts).align().cost
        jc = (
            JaxAligner(
                cfg, ref, qry, max_template_switches=mts, chunk=8, keep_fields=False
            )
            .align()
            .cost
        )
        assert nc == jc, f"trial={trial} mts={mts} numpy={nc} jax={jc}"


def test_jax_engine_planted_two_tsms_default_config():
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(5)
    n = 40
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    qry[8:16] = [comp[c] for c in qry[8:16]][::-1]
    qry[25:34] = [comp[c] for c in qry[25:34]][::-1]
    nc = DenseAligner(cfg, ref, qry).align().cost
    jc = JaxAligner(cfg, ref, qry, chunk=16, keep_fields=False).align().cost
    assert nc == jc


def test_batched_ts_matches_single_pair():
    """Batched multi-pair TS engine (vmapped kernels over a poison bucket)
    equals the single-pair engine on every pair."""
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

    rng = np.random.default_rng(12)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    pairs = [related_pair(rng, al, max_len=12) for _ in range(4)]
    got = BatchedTSAligner(cfg, pairs, chunk=8).costs()
    for i, (r, q) in enumerate(pairs):
        exp = DenseAligner(cfg, r, q).align().cost
        g = int(got[i])
        from tsalign_tpu.costs import INF

        assert (g if g < INF else INF) == exp


def test_jax_engine_ranged_overshoot_and_return():
    """Regression: under NoPrune a path may overshoot an interior target
    limit and template-switch back via a negative anti-gap, so beyond-limit
    entry cells must not be unconditionally masked (oracle=numpy=0, old
    jax=3 on this seed)."""
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.oracle import OracleAligner

    al = get_alphabet("dna")
    rng = np.random.default_rng(9053)
    cfg = random_config(rng, al, flanks=False)
    ref, qry = related_pair(rng, al, max_len=12)
    rng_obj = AlignmentRange(0, 0, 5, 2)
    oc = OracleAligner(cfg, ref, qry, range_=rng_obj, max_template_switches=2).align()
    ocost = oc[0] if isinstance(oc, tuple) else oc
    nc = DenseAligner(cfg, ref, qry, range_=rng_obj, max_template_switches=2).align().cost
    jc = (
        JaxAligner(
            cfg, ref, qry, range_=rng_obj, max_template_switches=2, chunk=8,
            keep_fields=False,
        )
        .align()
        .cost
    )
    assert ocost == nc == jc, (ocost, nc, jc)


def test_jax_engine_ranged_interior_limits_randomized():
    """Oracle == numpy == jax with random interior target limits (both the
    overshoot-and-return and plain ranged semantics)."""
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.oracle import OracleAligner

    al = get_alphabet("dna")
    for seed in range(10):
        rng = np.random.default_rng(9000 + seed)
        cfg = random_config(rng, al, flanks=False)
        ref, qry = related_pair(rng, al, max_len=11)
        n_r, n_q = len(ref), len(qry)
        if n_r < 4 or n_q < 4:
            continue
        rl = int(rng.integers(2, n_r + 1))
        ql = int(rng.integers(2, n_q + 1))
        rng_obj = AlignmentRange(0, 0, rl, ql)
        mts = [None, 2][seed % 2]
        oc = OracleAligner(
            cfg, ref, qry, range_=rng_obj, max_template_switches=mts
        ).align()
        ocost = oc[0] if isinstance(oc, tuple) else oc
        nc = DenseAligner(
            cfg, ref, qry, range_=rng_obj, max_template_switches=mts
        ).align().cost
        jc = (
            JaxAligner(
                cfg, ref, qry, range_=rng_obj, max_template_switches=mts,
                chunk=8, keep_fields=False,
            )
            .align()
            .cost
        )
        assert ocost == nc == jc, (seed, ocost, nc, jc)


def test_pallas_compile_failure_falls_back_to_xla(monkeypatch):
    """A Mosaic compile rejection of the Pallas module kernel (or the
    primary-sweep kernels) must downgrade to the XLA scan path and still
    produce the exact cost (ops/jax_primary._disable_pallas,
    jax_engine._module_pallas_fallback)."""
    import tsalign_tpu.ops.jax_modules as jm
    import tsalign_tpu.ops.pallas_module as pm
    import tsalign_tpu.ops.pallas_sweep as ps

    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(7)
    ref, qry = related_pair(rng, al, max_len=10)
    expect = DenseAligner(cfg, ref, qry).align().cost

    def boom(*a, **k):
        raise RuntimeError("Ran out of memory in vmem (simulated)")

    # Pretend we are on a TPU backend so the Pallas paths are selected,
    # then make every kernel fail at compile time.
    monkeypatch.setattr(jm, "_pallas_default", lambda: True)
    monkeypatch.setattr(pm, "module_scan_pallas", boom)
    monkeypatch.setattr(ps, "sweep_pallas_flankless", boom)
    monkeypatch.setattr(ps, "sweep_pallas_flanked", boom)
    # the kind-module memo may hold Pallas-enabled statics from other tests
    from tsalign_tpu.jax_engine import _KINDS_MEMO

    _KINDS_MEMO.clear()

    eng = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False)
    res = eng.align()
    assert res.cost == expect
    _KINDS_MEMO.clear()  # drop downgraded statics
