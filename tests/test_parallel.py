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
