"""Sequence-parallel (sharded-wavefront) flankless primary sweep.

One long pair's gap-affine wavefront, sharded over the query dimension of a
`jax.sharding.Mesh` axis: each device owns a contiguous block of query
columns and the row recurrence runs in lockstep across devices.  Cross-shard
dependencies per row are tiny and ride ICI:

- the diagonal/insertion-open shifts need one boundary column from the left
  neighbour -> a single `ppermute` of a (3,) vector;
- the within-row insertion min-plus chain is an associative (min,+) scan:
  each device solves its local block (log-depth doubling), then the D
  per-block aggregates (chain value at block end, saturated extension sum)
  are `all_gather`ed and prefix-combined locally, so the incoming carry
  costs O(D) scalar work instead of a serial pass over the row.

This is the TPU-native replacement for scaling one huge pair (SURVEY.md
SS2.8: "shard anti-diagonals across chips, halo exchange of wavefront
boundary via collective permute over ICI") -- the reference
(sebschmi/template-switch-aligner) is single-threaded and has no equivalent.
Exactness: the result equals ops/jax_primary._sweep_jit (itself equal to the
numpy PrimarySweep spec, citing context.rs:164-354); asserted by
tests/test_parallel.py on an 8-virtual-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.jaxcommon import DEV_INF
from ..ops.primary_sweep import GAP_DEL, GAP_INS, GAP_NONE


def _chain_with_prefix(cand, ext):
    """Local min-plus chain D[t] = min(cand[t], D[t-1] + ext[t]) plus the
    inclusive saturated prefix sum of ext (both needed to splice the
    cross-device carry into the block)."""

    def combine(left, right):
        c_l, e_l = left
        c_r, e_r = right
        c = jnp.minimum(c_r, jnp.minimum(c_l + e_r, DEV_INF))
        e = jnp.minimum(e_l + e_r, DEV_INF)
        return c, e

    return jax.lax.associative_scan(combine, (cand, ext), axis=0)


def _sp_kernel(sub_l, dd, seeds_l, io_l, ie_l, *, axis: str, n_devices: int):
    """Per-device body (under shard_map).  Local shapes: sub_l (n_rows, Wd),
    dd (n_rows, 2) replicated, seeds_l (n_rows, 3, Wd), io_l/ie_l (Wd,)."""
    idx = jax.lax.axis_index(axis)
    perm = [(d, d + 1) for d in range(n_devices - 1)]

    def shift_right_many(stack):
        """Shift each row of `stack` (k, Wd) right by one across the global
        row: the incoming column is the left neighbour's last column
        (DEV_INF on device 0)."""
        last = stack[:, -1:]  # (k, 1)
        recv = jax.lax.ppermute(last, axis, perm) if perm else jnp.full_like(
            last, DEV_INF
        )
        recv = jnp.where(idx == 0, DEV_INF, recv)
        return jnp.concatenate([recv, stack[:, :-1]], axis=1)

    ext_into = shift_right_many(ie_l[None])[0]  # edge cost INTO position t

    def body(carry, xs):
        prev_n, prev_i, prev_d = carry
        sub_r, dd_r, seeds_r = xs
        d_open, d_ext = dd_r[0], dd_r[1]

        any_prev = jnp.minimum(jnp.minimum(prev_n, prev_i), prev_d)
        sh = shift_right_many(jnp.stack([any_prev, sub_r]))
        diag = jnp.minimum(sh[0] + sh[1], DEV_INF)
        none_c = jnp.minimum(seeds_r[GAP_NONE], diag)

        del_c = jnp.minimum(
            seeds_r[GAP_DEL],
            jnp.minimum(
                jnp.minimum(jnp.minimum(prev_n, prev_i) + d_open, DEV_INF),
                jnp.minimum(prev_d + d_ext, DEV_INF),
            ),
        )

        open_src = jnp.minimum(none_c, del_c)
        open_c = shift_right_many(
            jnp.minimum(open_src + io_l, DEV_INF)[None]
        )[0]
        cand = jnp.minimum(seeds_r[GAP_INS], open_c)
        c_loc, e_pref = _chain_with_prefix(cand, ext_into)

        # carry the chain across devices: gather per-block aggregates and
        # prefix-combine the blocks left of this one
        agg = jnp.stack([c_loc[-1], e_pref[-1]])  # (2,)
        ce = jax.lax.all_gather(agg, axis)  # (D, 2)

        def fold(d, c):
            tot = jnp.minimum(ce[d, 0], jnp.minimum(c + ce[d, 1], DEV_INF))
            return jnp.where(d < idx, tot, c)

        init_c = jax.lax.pcast(jnp.full((), DEV_INF, jnp.int32), (axis,), to="varying")
        c_in = jax.lax.fori_loop(0, n_devices, fold, init_c)
        ins_c = jnp.minimum(c_loc, jnp.minimum(c_in + e_pref, DEV_INF))

        out = jnp.stack([none_c, ins_c, del_c])
        return (none_c, ins_c, del_c), out

    Wd = sub_l.shape[1]
    init = tuple(
        jax.lax.pcast(
            jnp.full((Wd,), DEV_INF, jnp.int32), (axis,), to="varying"
        )
        for _ in range(3)
    )
    _, M = jax.lax.scan(body, init, (sub_l, dd, seeds_l))
    return M  # (n_rows, 3, Wd)


def sp_sweep_flankless(sweep, seeds, mesh: Mesh, axis: str = "sp"):
    """Run a JaxPrimarySweep's flankless sweep sequence-parallel over
    `mesh[axis]`.  `seeds`: (3, n_rows, Wq) int32 device costs (the F == 1
    slice of the engine's seed field).  Returns M (3, n_rows, Wq)."""
    sub_rows, dd, io, ie = sweep.flankless_inputs()
    n_rows, Wq = sub_rows.shape
    D = mesh.shape[axis]
    Wp = -(-Wq // D) * D
    padc = Wp - Wq

    seeds_r = np.asarray(seeds).transpose(1, 0, 2)  # (n_rows, 3, Wq)
    if padc:
        sub_rows = np.pad(sub_rows, ((0, 0), (0, padc)), constant_values=DEV_INF)
        seeds_r = np.pad(
            seeds_r, ((0, 0), (0, 0), (0, padc)), constant_values=DEV_INF
        )
        io = np.pad(io, (0, padc), constant_values=DEV_INF)
        ie = np.pad(ie, (0, padc), constant_values=DEV_INF)

    fn = jax.jit(
        jax.shard_map(
            partial(_sp_kernel, axis=axis, n_devices=D),
            mesh=mesh,
            in_specs=(
                P(None, axis),
                P(None, None),
                P(None, None, axis),
                P(axis),
                P(axis),
            ),
            out_specs=P(None, None, axis),
        )
    )
    dev = lambda x, spec: jax.device_put(  # noqa: E731
        jnp.asarray(x), NamedSharding(mesh, spec)
    )
    M = fn(
        dev(sub_rows.astype(np.int32), P(None, axis)),
        dev(dd.astype(np.int32), P(None, None)),
        dev(seeds_r.astype(np.int32), P(None, None, axis)),
        dev(io.astype(np.int32), P(axis)),
        dev(ie.astype(np.int32), P(axis)),
    )
    return jnp.transpose(M, (1, 0, 2))[:, :, :Wq]


def _sp_flanked_kernel(
    subs_l,  # (3, n_rows, Wd) per-table substitution rows (p, l, r)
    dd,  # (n_rows, 6) replicated: p_do p_de l_do l_de r_do r_de
    seeds_l,  # (n_rows, F3, Wd) layer-major seeds
    io_l,  # (3, Wd) insertion-open per table
    ie_l,  # (3, Wd) insertion-extend per table
    *,
    axis: str,
    n_devices: int,
    L: int,
    R: int,
    climb: bool,
):
    """Flank-layered sweep under shard_map (query columns sharded).

    Same structure as the on-chip flanked kernel (ops/pallas_sweep.py
    _flanked_kernel; exact spec ops/primary_sweep.py): layer 0 takes the
    primary edges with the within-row min-plus chain (cross-device carry as
    in _sp_kernel), flank layers receive climb edges only — their one-step
    climb insertion needs a single boundary-column ppermute of the
    already-finalized layer below."""
    F = L + R + 1
    idx = jax.lax.axis_index(axis)
    perm = [(d, d + 1) for d in range(n_devices - 1)]

    def shift_right_many(stack):
        last = stack[:, -1:]
        recv = jax.lax.ppermute(last, axis, perm) if perm else jnp.full_like(
            last, DEV_INF
        )
        recv = jnp.where(idx == 0, DEV_INF, recv)
        return jnp.concatenate([recv, stack[:, :-1]], axis=1)

    ext_into = [shift_right_many(ie_l[t][None])[0] for t in range(3)]

    def body(carry, xs):
        # carry: (F3, Wd) previous row, layer-major.
        subs_r, dd_r, seeds_r = xs  # (3, Wd), (6,), (F3, Wd)

        def diag_from(prev3, t):
            any_prev = jnp.min(prev3, axis=0)
            sh = shift_right_many(jnp.stack([any_prev, subs_r[t]]))
            return jnp.minimum(sh[0] + sh[1], DEV_INF)

        def del_from(prev3, t):
            pn, pi, pd = prev3[GAP_NONE], prev3[GAP_INS], prev3[GAP_DEL]
            return jnp.minimum(
                jnp.minimum(jnp.minimum(pn, pi) + dd_r[2 * t], DEV_INF),
                jnp.minimum(pd + dd_r[2 * t + 1], DEV_INF),
            )

        rows = [None] * F
        for f in range(-R, L + 1):
            fi = f + R
            if (-R < f < 0) or (f == 0 and R > 0):
                climb_src, ct = fi - 1, 2
            elif f > 0 and climb:
                climb_src, ct = fi - 1, 1
            else:
                climb_src, ct = None, None

            prev3 = carry[3 * fi : 3 * fi + 3]
            none_c = seeds_r[3 * fi + GAP_NONE]
            ins_c = seeds_r[3 * fi + GAP_INS]
            del_c = seeds_r[3 * fi + GAP_DEL]

            if f == 0:
                none_c = jnp.minimum(none_c, diag_from(prev3, 0))
                del_c = jnp.minimum(del_c, del_from(prev3, 0))
            if climb_src is not None:
                prev_c = carry[3 * climb_src : 3 * climb_src + 3]
                none_c = jnp.minimum(none_c, diag_from(prev_c, ct))
                del_c = jnp.minimum(del_c, del_from(prev_c, ct))
                sn, si, sd = rows[climb_src]
                o_src = jnp.minimum(
                    jnp.minimum(sn, sd) + io_l[ct], DEV_INF
                )
                e_src = jnp.minimum(si + ie_l[ct], DEV_INF)
                sh = shift_right_many(jnp.stack([o_src, e_src]))
                ins_c = jnp.minimum(ins_c, jnp.minimum(sh[0], sh[1]))

            if f == 0:
                open_src = jnp.minimum(none_c, del_c)
                open_c = shift_right_many(
                    jnp.minimum(open_src + io_l[0], DEV_INF)[None]
                )[0]
                cand = jnp.minimum(ins_c, open_c)
                c_loc, e_pref = _chain_with_prefix(cand, ext_into[0])
                agg = jnp.stack([c_loc[-1], e_pref[-1]])
                ce = jax.lax.all_gather(agg, axis)

                def fold(d, c):
                    tot = jnp.minimum(
                        ce[d, 0], jnp.minimum(c + ce[d, 1], DEV_INF)
                    )
                    return jnp.where(d < idx, tot, c)

                init_c = jax.lax.pcast(
                    jnp.full((), DEV_INF, jnp.int32), (axis,), to="varying"
                )
                c_in = jax.lax.fori_loop(0, n_devices, fold, init_c)
                ins_c = jnp.minimum(
                    c_loc, jnp.minimum(c_in + e_pref, DEV_INF)
                )

            rows[fi] = (none_c, ins_c, del_c)

        flat = []
        for fi in range(F):
            n_, i_, d_ = rows[fi]
            tri = [None, None, None]
            tri[GAP_NONE], tri[GAP_INS], tri[GAP_DEL] = n_, i_, d_
            flat += tri
        out = jnp.stack(flat)
        return out, out

    Wd = subs_l.shape[-1]
    init = jax.lax.pcast(
        jnp.full((3 * F, Wd), DEV_INF, jnp.int32), (axis,), to="varying"
    )
    _, M = jax.lax.scan(
        body, init, (jnp.moveaxis(subs_l, 0, 1), dd, seeds_l)
    )
    return M  # (n_rows, F3, Wd)


def sp_sweep_flanked(sweep, seeds, mesh: Mesh, axis: str = "sp"):
    """Flank-layered primary sweep, query columns sharded over `mesh[axis]`.

    `sweep`: a JaxPrimarySweep (any F); `seeds`: (F, 3, n_rows, Wq) int32
    device costs.  Returns M with the same layout."""
    subs, dd, io, ie = sweep.flanked_inputs()
    F = sweep.F
    n_rows = sweep.n_r + 1
    Wq = sweep.n_q + 1
    D = mesh.shape[axis]
    Wp = -(-Wq // D) * D
    padc = Wp - Wq

    seeds_r = np.asarray(seeds).reshape(F * 3, n_rows, Wq).transpose(1, 0, 2)
    if padc:
        subs = np.pad(
            subs, ((0, 0), (0, 0), (0, padc)), constant_values=int(DEV_INF)
        )
        seeds_r = np.pad(
            seeds_r, ((0, 0), (0, 0), (0, padc)), constant_values=int(DEV_INF)
        )
        io = np.pad(io, ((0, 0), (0, padc)), constant_values=int(DEV_INF))
        ie = np.pad(ie, ((0, 0), (0, padc)), constant_values=int(DEV_INF))

    fn = jax.jit(
        jax.shard_map(
            partial(
                _sp_flanked_kernel,
                axis=axis,
                n_devices=D,
                L=sweep.L,
                R=sweep.R,
                climb=sweep.climb,
            ),
            mesh=mesh,
            in_specs=(
                P(None, None, axis),
                P(None, None),
                P(None, None, axis),
                P(None, axis),
                P(None, axis),
            ),
            out_specs=P(None, None, axis),
        )
    )
    dev = lambda x, spec: jax.device_put(  # noqa: E731
        jnp.asarray(x), NamedSharding(mesh, spec)
    )
    M = fn(
        dev(subs.astype(np.int32), P(None, None, axis)),
        dev(dd.astype(np.int32), P(None, None)),
        dev(seeds_r.astype(np.int32), P(None, None, axis)),
        dev(io.astype(np.int32), P(None, axis)),
        dev(ie.astype(np.int32), P(None, axis)),
    )
    M = np.asarray(M)[:, :, :Wq]
    return M.transpose(1, 0, 2).reshape(F, 3, n_rows, Wq)
