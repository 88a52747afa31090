"""Sequence-parallel TSM module sweeps (the reentry step).

The per-kind module launches are embarrassingly parallel along the entry
axis: every e-chunk's secondary-alignment scan is independent, and the
per-chunk slabs only meet in the min-fold into the reentry field.  So the
sharded design keeps the single-device chunk pipeline (_kind_all_chunks)
unchanged and shards the *chunk offset list* across `mesh[axis]`: each
device scans its subset of chunks into a full-width partial field (folds use
global offsets, so no index remapping), and one `pmin` over ICI combines
the partials.  The entry field and the per-entry tables are replicated —
sized by the module window, which the config's finite cost windows bound.

This fills the SURVEY §2.8 "long-sequence sharded DP" row for the module
sweeps (round 1 sharded only the flankless primary sweep; the reference —
sebschmi/template-switch-aligner — is single-threaded and has no
counterpart).  Exactness: equals jax_engine's unsharded reentry;
tests/test_parallel.py asserts it on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.jax_modules import _kind_all_chunks, _same_module_jit
from ..ops.jaxcommon import DEV_INF


def _sp_kind_kernel(A_mod, Rk_pad0, e_bases_l, B_pre, fixed, *, st, PAD, axis):
    """Per-device body under shard_map: scan the local chunk offsets
    (global values; -1 = skip) and min-combine the partial fields."""
    # The accumulator must be device-varying: each device folds a different
    # chunk subset before the pmin combine.
    Rk0 = jax.lax.pcast(Rk_pad0, (axis,), to="varying")
    Rk = _kind_all_chunks(A_mod, Rk0, fixed, e_bases_l, B_pre, st=st, PAD=PAD)
    return jax.lax.pmin(Rk, axis)


def sp_reentry_kind(km, A_mod: np.ndarray, mesh: Mesh, axis: str = "sp",
                    B_pre=None):
    """One kind's reentry slab, module chunks sharded over `mesh[axis]`.

    A_mod: (n_p+1, >=n_e) int32 device-cost entry field in the kind's
    module orientation.  Returns the padded reentry field (n_p+1, width)
    as a host array (same layout as the unsharded chunked route).
    """
    spec = km.spec
    st = km._static
    C = km.chunk
    n_e = spec.n_anti + 1
    D = mesh.shape[axis]

    if A_mod.shape[1] < C:
        A_mod = np.pad(
            A_mod, ((0, 0), (0, C - A_mod.shape[1])),
            constant_values=int(DEV_INF),
        )

    # Global chunk offsets, padded with -1 sentinels to a multiple of D so
    # every device scans the same trip count (-1 chunks are skipped inside
    # _kind_all_chunks).
    bases = [
        np.int32(min(e0, n_e - C) if n_e >= C else 0)
        for e0 in range(0, n_e, C)
    ]
    per_dev = -(-len(bases) // D)
    bases += [np.int32(-1)] * (D * per_dev - len(bases))
    e_bases = np.asarray(bases, np.int32)

    if B_pre is None:
        if spec.same_seq:
            if getattr(km, "_b_pre_cache", None) is None:
                km._b_pre_cache = _same_module_jit(km._fixed, st=st)
            B_pre = km._b_pre_cache
        else:
            B_pre = jnp.zeros((1, 1), jnp.int32)

    PAD = max(0, -km.s_lo)
    width = PAD + n_e + max(0, C - 1 + km.s_hi)
    Rk_pad0 = jnp.full((spec.n_p + 1, width), DEV_INF, jnp.int32)

    fn = jax.jit(
        jax.shard_map(
            partial(_sp_kind_kernel, st=st, PAD=PAD, axis=axis),
            mesh=mesh,
            in_specs=(
                P(None, None),  # entry field: replicated
                P(None, None),  # output accumulator: replicated
                P(axis),        # chunk offsets: sharded
                P(*(None,) * getattr(B_pre, "ndim", 2)),
                jax.tree_util.tree_map(
                    lambda x: P(*(None,) * x.ndim), km._fixed
                ),
            ),
            out_specs=P(None, None),
        )
    )
    rep = lambda x: jax.device_put(  # noqa: E731
        jnp.asarray(x), NamedSharding(mesh, P(*(None,) * np.ndim(x)))
    )
    out = fn(
        rep(np.ascontiguousarray(A_mod)),
        rep(Rk_pad0),
        jax.device_put(
            jnp.asarray(e_bases), NamedSharding(mesh, P(axis))
        ),
        rep(B_pre),
        jax.tree_util.tree_map(rep, km._fixed),
    )
    return np.asarray(out)


def sp_reentry(engine, A_cells: np.ndarray, kinds, mesh: Mesh,
               axis: str = "sp") -> np.ndarray:
    """All-kinds sharded reentry field (device costs), the sequence-parallel
    counterpart of JaxAligner._reentry's chunked route."""
    R_cells = np.full(
        (engine.n_r + 1, engine.n_q + 1), int(DEV_INF), np.int32
    )
    for km in kinds:
        spec = km.spec
        A_mod = A_cells if spec.pk == 0 else A_cells.T
        Rk_pad = sp_reentry_kind(km, A_mod, mesh, axis=axis)
        PAD = max(0, -km.s_lo)
        Rk = Rk_pad[:, PAD : PAD + spec.n_anti + 1].copy()
        Rk[:, spec.n_anti] = int(DEV_INF)  # strict reentry: j2 < n_anti
        if spec.pk == 1:
            Rk = Rk.T
        np.minimum(R_cells, Rk, out=R_cells)
    return R_cells
