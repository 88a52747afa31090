"""Pallas sweep kernels vs the numpy PrimarySweep spec (interpret mode).

The TPU routes flankless and flanked primary sweeps through the on-chip
Pallas kernels (ops/pallas_sweep.py); CPU runs route through the XLA scan,
so this pins the kernels themselves via pallas interpret mode against the
exact numpy spec (ops/primary_sweep.py, context.rs:164-354 semantics).
"""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.costs import INF
from tsalign_tpu.geometry import AlignmentRange
from tsalign_tpu.ops.jax_primary import JaxPrimarySweep
from tsalign_tpu.ops.jaxcommon import from_device_costs, to_device_costs
from tsalign_tpu.ops.primary_sweep import PrimarySweep

from util import random_config, random_pair


def _random_seeds(rng, F, n_r, n_q):
    seeds = np.full((F, 3, n_r + 1, n_q + 1), INF, dtype=np.int64)
    seeds[F - 1, 0, 0, 0] = 0
    # a few random finite extra seeds (reentry-like)
    for _ in range(4):
        f = int(rng.integers(0, F))
        g = int(rng.integers(0, 3))
        i = int(rng.integers(0, n_r + 1))
        j = int(rng.integers(0, n_q + 1))
        seeds[f, g, i, j] = int(rng.integers(0, 9))
    return seeds


@pytest.mark.parametrize("seed", range(3))
def test_pallas_flankless_matches_numpy_spec(seed):
    import jax.numpy as jnp

    from tsalign_tpu.ops.pallas_sweep import sweep_pallas_flankless

    rng = np.random.default_rng(500 + seed)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    ref, qry = random_pair(rng, al, max_len=12, min_len=3)
    sw = PrimarySweep(cfg, ref, qry)
    jw = JaxPrimarySweep(cfg, ref, qry)
    seeds = _random_seeds(rng, 1, len(ref), len(qry))
    expect = sw.sweep(seeds)

    sub_rows, dd, io, ie = jw.flankless_inputs()
    M = np.asarray(
        sweep_pallas_flankless(
            jnp.asarray(sub_rows),
            jnp.asarray(dd),
            jnp.asarray(to_device_costs(seeds))[0].transpose(1, 0, 2),
            jnp.asarray(io),
            jnp.asarray(ie),
            interpret=True,
        )
    ).transpose(1, 0, 2)[None]
    np.testing.assert_array_equal(from_device_costs(M), expect)


@pytest.mark.parametrize("seed,climb", [(0, True), (1, True), (2, False)])
def test_pallas_flanked_matches_numpy_spec(seed, climb):
    import jax.numpy as jnp

    from tsalign_tpu.ops.pallas_sweep import sweep_pallas_flanked

    rng = np.random.default_rng(600 + seed)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=True)
    cfg.left_flank_length = int(rng.integers(1, 4))
    cfg.right_flank_length = int(rng.integers(0, 4))
    F = cfg.left_flank_length + cfg.right_flank_length + 1
    ref, qry = random_pair(rng, al, max_len=11, min_len=3)
    rng_obj = None
    if seed == 1:
        rng_obj = AlignmentRange(1, 1, len(ref), len(qry))
    sw = PrimarySweep(cfg, ref, qry, range_=rng_obj, allow_flank_climb=climb)
    jw = JaxPrimarySweep(cfg, ref, qry, range_=rng_obj, allow_flank_climb=climb)
    seeds = _random_seeds(rng, F, len(ref), len(qry))
    expect = sw.sweep(seeds)

    subs, dd, io, ie = jw.flanked_inputs()
    n_rows, Wq = len(ref) + 1, len(qry) + 1
    seeds_dev = jnp.asarray(to_device_costs(seeds))
    seeds_r = seeds_dev.reshape(F * 3, n_rows, Wq).transpose(1, 0, 2)
    M = np.asarray(
        sweep_pallas_flanked(
            jnp.asarray(subs),
            jnp.asarray(dd),
            seeds_r,
            jnp.asarray(io),
            jnp.asarray(ie),
            L=cfg.left_flank_length,
            R=cfg.right_flank_length,
            climb=climb,
            interpret=True,
        )
    ).transpose(1, 0, 2).reshape(F, 3, n_rows, Wq)
    np.testing.assert_array_equal(from_device_costs(M), expect)


@pytest.mark.parametrize("seed", range(3))
def test_pallas_flankless_tiled_matches_numpy_spec(seed):
    """Row-tiled variant (grid over row blocks, wavefront carried in VMEM
    scratch across sequential grid steps) == the numpy spec.  TB=8 on a
    ~30-row problem exercises multiple grid steps and the row padding."""
    import jax.numpy as jnp

    from tsalign_tpu.ops.pallas_sweep import sweep_pallas_flankless_tiled

    rng = np.random.default_rng(700 + seed)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    ref, qry = random_pair(rng, al, max_len=30, min_len=18)
    sw = PrimarySweep(cfg, ref, qry)
    jw = JaxPrimarySweep(cfg, ref, qry)
    seeds = _random_seeds(rng, 1, len(ref), len(qry))
    expect = sw.sweep(seeds)

    sub_rows, dd, io, ie = jw.flankless_inputs()
    M = np.asarray(
        sweep_pallas_flankless_tiled(
            jnp.asarray(sub_rows),
            jnp.asarray(dd),
            jnp.asarray(to_device_costs(seeds))[0].transpose(1, 0, 2),
            jnp.asarray(io),
            jnp.asarray(ie),
            TB=8,
            interpret=True,
        )
    )
    got = from_device_costs(M.transpose(1, 0, 2)[None])
    np.testing.assert_array_equal(got, expect)
