"""Mesh-sharded execution paths on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.ops.jax_primary import JaxPrimarySweep
from tsalign_tpu.ops.jaxcommon import DEV_INF
from tsalign_tpu.parallel.sp_sweep import sp_sweep_flankless

from util import random_config


@pytest.mark.parametrize("n_q", [5, 17, 64])
def test_sp_sweep_matches_single_device(n_q):
    """The sequence-parallel sharded sweep (ppermute boundary exchange +
    all-gather chain carry) equals the single-device XLA sweep exactly."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("sp",))

    rng = np.random.default_rng(n_q)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    n_r = int(rng.integers(3, 40))
    ref = rng.integers(0, 4, size=n_r).astype(np.int8)
    qry = rng.integers(0, 4, size=n_q).astype(np.int8)

    sweep = JaxPrimarySweep(cfg, ref, qry)
    seeds = np.full((1, 3, n_r + 1, n_q + 1), int(DEV_INF), np.int32)
    seeds[0, 0, 0, 0] = 0
    # a few extra seeds to exercise mid-field entry (reentry-style)
    for _ in range(3):
        r = int(rng.integers(0, n_r + 1))
        q = int(rng.integers(0, n_q + 1))
        seeds[0, 0, r, q] = int(rng.integers(0, 9))

    expect = np.asarray(sweep.sweep(np.asarray(seeds)))[0]
    got = np.asarray(sp_sweep_flankless(sweep, seeds[0], mesh))
    assert np.array_equal(got, expect)


def test_batched_ts_traceback_reprices():
    """Batched traceback: every pair's alignment re-prices exactly to the
    single-pair optimum (the exactness-chain property, batched)."""
    from tsalign_tpu.engine import DenseAligner
    from tsalign_tpu.costs import INF
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner
    from tsalign_tpu.pricing import price_alignment
    from util import related_pair

    rng = np.random.default_rng(77)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    pairs = [related_pair(rng, al, max_len=12) for _ in range(5)]
    bt = BatchedTSAligner(cfg, pairs, chunk=8, keep_fields=True)
    traced = bt.align_with_traceback()
    for (r, q), (cost, aln) in zip(pairs, traced):
        exp = DenseAligner(cfg, r, q).align().cost
        assert cost == exp
        if cost < INF:
            assert price_alignment(cfg, r, q, aln) == cost


def test_batched_align_pairs_records():
    """align_pairs: the full batched record pipeline (tie-break, ECR, TOML)
    matches the single-pair Aligner facade costs; alignments re-price to
    the optimum under the raw config."""
    from tsalign_tpu.aligner import Aligner
    from tsalign_tpu.parallel.batch_ts import align_pairs
    from tsalign_tpu.pricing import price_alignment
    from tsalign_tpu.result import AlignmentResult

    rng = np.random.default_rng(78)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    letters = "ACGT"
    pairs = []
    for _ in range(4):
        n = int(rng.integers(6, 14))
        r = "".join(letters[c] for c in rng.integers(0, 4, size=n))
        q = list(r)
        if len(q) > 4:
            q[3] = letters[int(rng.integers(0, 4))]
        pairs.append((r, "".join(q)))

    records = align_pairs(cfg, pairs, names=[("R", "Q")] * len(pairs))
    a = Aligner(costs=cfg, engine="numpy")
    for (r, q), rec in zip(pairs, records):
        single = a.align(r, q, "R", "Q").result
        assert rec.has_target == single.has_target
        if rec.has_target:
            assert rec.result.cost == single.result.cost
            aln = rec.alignment
            ra = al.encode(r)
            qa = al.encode(q)
            assert price_alignment(cfg, ra, qa, aln) == rec.result.cost
        # the TOML round-trips through the reference schema
        assert AlignmentResult.from_toml(rec.to_toml()) == rec


def test_sp_reentry_matches_unsharded():
    """Sequence-parallel module sweeps: the chunk-sharded reentry field
    (parallel/sp_reentry.py, pmin over the mesh axis) equals the
    single-device chunked route for every kind."""
    import jax
    import jax.numpy as jnp

    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.jax_engine import JaxAligner
    from tsalign_tpu.ops.jax_modules import _kind_all_chunks, _same_module_jit
    from tsalign_tpu.ops.jaxcommon import DEV_INF, to_device_costs
    from tsalign_tpu.parallel.sp_reentry import sp_reentry
    from util import related_pair_scaled

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("sp",))

    rng = np.random.default_rng(9)
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    ref, qry = related_pair_scaled(rng, al, 70, 8)
    ja = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False)
    root = np.asarray(to_device_costs(ja._root_seeds_host()))
    M = ja._sweep_host(root, True)
    best = ja._target_cost(M) + 40  # loose: keep all kinds/chunks live
    ja._last_budget = ja._sdel_budget(best)
    kinds = ja._build_kinds(ja._last_budget)
    assert kinds, "default config must keep kinds active"
    A = ja._pruned_entry(M, best)

    # Unsharded chunked route, all chunks live.
    expect = np.full((ja.n_r + 1, ja.n_q + 1), int(DEV_INF), np.int32)
    for km in kinds:
        spec = km.spec
        A_mod = A if spec.pk == 0 else A.T
        n_e = spec.n_anti + 1
        C = km.chunk
        if A_mod.shape[1] < C:
            A_mod = np.pad(
                A_mod, ((0, 0), (0, C - A_mod.shape[1])),
                constant_values=int(DEV_INF),
            )
        if spec.same_seq:
            if getattr(km, "_b_pre_cache", None) is None:
                km._b_pre_cache = _same_module_jit(km._fixed, st=km._static)
            B_pre = km._b_pre_cache
        else:
            B_pre = jnp.zeros((1, 1), jnp.int32)
        PAD = max(0, -km.s_lo)
        width = PAD + n_e + max(0, C - 1 + km.s_hi)
        bases = [
            np.int32(min(e0, n_e - C) if n_e >= C else 0)
            for e0 in range(0, n_e, C)
        ]
        Rk = np.array(
            _kind_all_chunks(
                jnp.asarray(np.ascontiguousarray(A_mod)),
                jnp.full((spec.n_p + 1, width), DEV_INF, jnp.int32),
                km._fixed,
                jnp.asarray(bases, jnp.int32),
                B_pre,
                st=km._static,
                PAD=PAD,
            )
        )[:, PAD : PAD + n_e]
        Rk[:, spec.n_anti] = int(DEV_INF)
        if spec.pk == 1:
            Rk = Rk.T
        np.minimum(expect, Rk, out=expect)

    got = sp_reentry(ja, A, kinds, mesh)
    np.testing.assert_array_equal(got, expect)


def test_sp_sweep_flanked_matches_single_device():
    """Flank-layered sequence-parallel sweep == numpy spec on random
    flanked configs with random extra seeds."""
    from tsalign_tpu.ops.jaxcommon import from_device_costs, to_device_costs
    from tsalign_tpu.ops.jax_primary import JaxPrimarySweep
    from tsalign_tpu.ops.primary_sweep import PrimarySweep
    from tsalign_tpu.parallel.sp_sweep import sp_sweep_flanked
    from util import random_pair

    import jax

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("sp",))

    INF = 2**62
    rng = np.random.default_rng(321)
    al = get_alphabet("dna")
    for trial in range(2):
        cfg = random_config(rng, al, flanks=True)
        cfg.left_flank_length = int(rng.integers(1, 3))
        cfg.right_flank_length = int(rng.integers(0, 3))
        F = cfg.left_flank_length + cfg.right_flank_length + 1
        ref, qry = random_pair(rng, al, max_len=14, min_len=5)
        sw = PrimarySweep(cfg, ref, qry)
        jw = JaxPrimarySweep(cfg, ref, qry)
        seeds = np.full((F, 3, len(ref) + 1, len(qry) + 1), INF, np.int64)
        seeds[F - 1, 0, 0, 0] = 0
        for _ in range(4):
            f = int(rng.integers(0, F))
            g = int(rng.integers(0, 3))
            i = int(rng.integers(0, len(ref) + 1))
            j = int(rng.integers(0, len(qry) + 1))
            seeds[f, g, i, j] = int(rng.integers(0, 9))
        expect = sw.sweep(seeds)
        got = sp_sweep_flanked(jw, to_device_costs(seeds), mesh)
        np.testing.assert_array_equal(from_device_costs(got), expect)


def test_align_pairs_multi_bucket():
    """Pairs whose lengths land in different power-of-two buckets are
    grouped per bucket (short pairs don't pay the longest pair's padded
    grid) and records come back in input order with single-pair costs."""
    from tsalign_tpu.aligner import Aligner
    from tsalign_tpu.parallel.batch_ts import align_pairs

    rng = np.random.default_rng(31)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    letters = "ACGT"

    def mk(n):
        r = "".join(letters[c] for c in rng.integers(0, 4, size=n))
        q = list(r)
        q[n // 2] = letters[int(rng.integers(0, 4))]
        return r, "".join(q)

    # bucket 64 (short) and bucket 128 (long), interleaved
    pairs = [mk(10), mk(70), mk(12), mk(90)]
    records = align_pairs(cfg, pairs, names=[("R", "Q")] * len(pairs))
    a = Aligner(costs=cfg, engine="numpy")
    for (r, q), rec in zip(pairs, records):
        single = a.align(r, q, "R", "Q").result
        assert rec.has_target == single.has_target
        if rec.has_target:
            assert rec.result.cost == single.result.cost
