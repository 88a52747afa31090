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
