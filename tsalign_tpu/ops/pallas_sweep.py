"""Pallas TPU kernel for the flank-layered primary sweep.

The XLA lax.scan sweep dispatches one tiny step per reference row (a few KB
of state), so it is latency-bound: ~2 ms/row adds up to ~1 s per round at
n ~ 500.  This kernel keeps the whole row state in VMEM and fori-loops the
rows on-chip; per-row inputs (substitution rows, deletion costs, seeds) are
streamed from VMEM blocks, with rows packed 8-per-sublane-block and
selected by an iota mask (Mosaic cannot dynamically index the lane or
sublane dimensions, but dynamic indexing of a leading untiled dimension plus
a masked reduction over the 8-row block is plain vector code).

Supports the flankless case (F == 1), which covers every shipped config;
flanked configs fall back to the XLA sweep.  The numpy PrimarySweep
(ops/primary_sweep.py, citing context.rs:164-354) is the exact spec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jaxcommon import DEV_INF

# Mosaic's scoped-VMEM default is 16 MB; v5e has 128 MB.  Large primary
# fields (e.g. the 1099x1099 ari golden) need the raised ceiling.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)

GAP_NONE, GAP_INS, GAP_DEL = 0, 1, 2


def _shift_right(x, k: int):
    """Shift right along the last axis by k, filling with DEV_INF (lane roll
    + iota mask; Mosaic rejects sub-tile concatenation on 1-sublane data)."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = pltpu.roll(x, k, axis=x.ndim - 1)
    return jnp.where(lane < k, DEV_INF, rolled)


def _minplus_chain_row(cand, ext):
    """D[t] = min(cand[t], D[t-1] + ext[t]) along the last axis, doubling."""
    W = cand.shape[-1]
    c, e = cand, ext
    shift = 1
    while shift < W:
        c_prev = _shift_right(c, shift)
        e_prev = _shift_right(e, shift)
        c = jnp.minimum(c, jnp.minimum(c_prev + e, DEV_INF))
        e = jnp.minimum(e_prev + e, DEV_INF)
        shift *= 2
    return c


def _sweep_kernel(
    sub_ref,  # (nb, 8, Wq) substitution rows (row r at [r//8, r%8])
    dd_ref,  # (nb, 8, 128) del open/extend per row: lanes 0/1 used
    seeds_ref,  # (n_rows, 3, Wq) per-row seeds
    io_ref,  # (1, Wq) insertion open (per query char, masked)
    ie_ref,  # (1, Wq) insertion extend
    out_ref,  # (n_rows, 3, Wq)
    *,
    n_rows: int,
):
    Wq = sub_ref.shape[-1]

    def body(r, carry):
        prev_n, prev_i, prev_d = carry  # previous row planes, each (1, Wq)
        blk = r // 8
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, Wq), 0)
        sel = lane8 == (r % 8)
        sub_row = jnp.sum(
            jnp.where(sel, sub_ref[pl.ds(blk, 1)][0], 0), axis=0, keepdims=True
        )
        sel128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == (r % 8)
        ddrow = jnp.sum(
            jnp.where(sel128, dd_ref[pl.ds(blk, 1)][0], 0),
            axis=0,
        )
        d_open = ddrow[0]
        d_ext = ddrow[1]

        seeds = seeds_ref[pl.ds(r, 1)][0]  # (3, Wq)
        none_c = seeds[GAP_NONE][None]
        del_c = seeds[GAP_DEL][None]
        ins_seed = seeds[GAP_INS][None]

        # diagonal: min over gaps of prev row shifted right by one, + sub
        any_prev = jnp.minimum(jnp.minimum(prev_n, prev_i), prev_d)
        diag = jnp.minimum(
            _shift_right(any_prev, 1) + _shift_right(sub_row, 1), DEV_INF
        )
        none_c = jnp.minimum(none_c, diag)
        # deletion: same column from previous row
        del_new = jnp.minimum(
            jnp.minimum(jnp.minimum(prev_n, prev_i) + d_open, DEV_INF),
            jnp.minimum(prev_d + d_ext, DEV_INF),
        )
        del_c = jnp.minimum(del_c, del_new)
        # insertion chain within the row
        open_src = jnp.minimum(none_c, del_c)
        open_c = _shift_right(
            jnp.minimum(open_src + io_ref[...], DEV_INF), 1
        )
        cand = jnp.minimum(ins_seed, open_c)
        ext_into = _shift_right(ie_ref[...], 1)
        ins_c = _minplus_chain_row(cand, ext_into)

        out_ref[pl.ds(r, 1)] = jnp.stack([none_c[0], ins_c[0], del_c[0]])[None]
        return none_c, ins_c, del_c

    init = (
        jnp.full((1, Wq), DEV_INF, jnp.int32),
        jnp.full((1, Wq), DEV_INF, jnp.int32),
        jnp.full((1, Wq), DEV_INF, jnp.int32),
    )
    jax.lax.fori_loop(0, n_rows, body, init)


def _sweep_kernel_tiled(
    sub_ref,  # (TB/8, 8, Wq) this block's substitution rows
    dd_ref,  # (TB/8, 8, 128) this block's del open/extend rows
    seeds_ref,  # (TB, 3, Wq) this block's seeds
    io_ref,  # (1, Wq)
    ie_ref,  # (1, Wq)
    out_ref,  # (TB, 3, Wq)
    carry_ref,  # VMEM scratch (3, Wq): wavefront row across grid steps
    *,
    TB: int,
):
    """Row-tiled variant of _sweep_kernel: the grid walks row blocks
    SEQUENTIALLY (TPU grid semantics) and the previous block's last row
    persists in VMEM scratch, so VMEM holds one block instead of the whole
    field — this is what admits 1000+-row problems (the whole-state kernel
    runtime-overflows VMEM there, which CRASHES the worker)."""
    Wq = sub_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.full((3, Wq), DEV_INF, jnp.int32)

    def body(r, carry):
        prev_n, prev_i, prev_d = carry
        blk = r // 8
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, Wq), 0)
        sel = lane8 == (r % 8)
        sub_row = jnp.sum(
            jnp.where(sel, sub_ref[pl.ds(blk, 1)][0], 0), axis=0, keepdims=True
        )
        sel128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == (r % 8)
        ddrow = jnp.sum(jnp.where(sel128, dd_ref[pl.ds(blk, 1)][0], 0), axis=0)
        d_open = ddrow[0]
        d_ext = ddrow[1]

        seeds = seeds_ref[pl.ds(r, 1)][0]  # (3, Wq)
        none_c = seeds[GAP_NONE][None]
        del_c = seeds[GAP_DEL][None]
        ins_seed = seeds[GAP_INS][None]

        any_prev = jnp.minimum(jnp.minimum(prev_n, prev_i), prev_d)
        diag = jnp.minimum(
            _shift_right(any_prev, 1) + _shift_right(sub_row, 1), DEV_INF
        )
        none_c = jnp.minimum(none_c, diag)
        del_new = jnp.minimum(
            jnp.minimum(jnp.minimum(prev_n, prev_i) + d_open, DEV_INF),
            jnp.minimum(prev_d + d_ext, DEV_INF),
        )
        del_c = jnp.minimum(del_c, del_new)
        open_src = jnp.minimum(none_c, del_c)
        open_c = _shift_right(
            jnp.minimum(open_src + io_ref[...], DEV_INF), 1
        )
        cand = jnp.minimum(ins_seed, open_c)
        ext_into = _shift_right(ie_ref[...], 1)
        ins_c = _minplus_chain_row(cand, ext_into)

        out_ref[pl.ds(r, 1)] = jnp.stack([none_c[0], ins_c[0], del_c[0]])[None]
        return none_c, ins_c, del_c

    init = (
        carry_ref[pl.ds(GAP_NONE, 1)],
        carry_ref[pl.ds(GAP_INS, 1)],
        carry_ref[pl.ds(GAP_DEL, 1)],
    )
    none_c, ins_c, del_c = jax.lax.fori_loop(0, TB, body, init)
    carry_ref[...] = jnp.concatenate([none_c, ins_c, del_c], axis=0)


@partial(jax.jit, static_argnames=("interpret", "TB"))
def sweep_pallas_flankless_tiled(
    sub_rows, ddrows, seeds, io, ie, *, TB=256, interpret=False
):
    """Row-tiled flankless sweep: O(TB * Wq) VMEM instead of O(n * Wq).

    Same inputs/outputs as sweep_pallas_flankless; rows padded to a
    multiple of TB (padded rows produce all-INF output rows, cropped)."""
    n_rows, Wq = sub_rows.shape
    nblk = -(-n_rows // TB)
    padr = nblk * TB - n_rows
    if padr:
        sub_rows = jnp.pad(
            sub_rows, ((0, padr), (0, 0)), constant_values=DEV_INF
        )
        ddrows = jnp.pad(ddrows, ((0, padr), (0, 0)), constant_values=DEV_INF)
        seeds = jnp.pad(
            seeds, ((0, padr), (0, 0), (0, 0)), constant_values=DEV_INF
        )
    sub_b = sub_rows.reshape(nblk * (TB // 8), 8, Wq)
    dd_b = jnp.pad(
        ddrows, ((0, 0), (0, 126)), constant_values=DEV_INF
    ).reshape(nblk * (TB // 8), 8, 128)
    out = pl.pallas_call(
        partial(_sweep_kernel_tiled, TB=TB),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((TB // 8, 8, Wq), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB // 8, 8, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, 3, Wq), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Wq), lambda i: (0, 0)),
            pl.BlockSpec((1, Wq), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, 3, Wq), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * TB, 3, Wq), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, Wq), jnp.int32)],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(sub_b, dd_b, seeds, io[None], ie[None])
    return out[:n_rows]


@partial(jax.jit, static_argnames=("interpret",))
def sweep_pallas_flankless(sub_rows, ddrows, seeds, io, ie, *, interpret=False):
    """Flankless primary sweep on-chip.

    sub_rows: (n_rows, Wq) per-row substitution costs (row 0 = all INF);
    ddrows: (n_rows, 2) del open/extend per row; seeds: (n_rows, 3, Wq);
    io/ie: (Wq,).  Returns M (n_rows, 3, Wq).
    """
    n_rows, Wq = sub_rows.shape
    nb = -(-n_rows // 8)
    padr = nb * 8 - n_rows
    if padr:
        sub_rows = jnp.pad(sub_rows, ((0, padr), (0, 0)), constant_values=DEV_INF)
        ddrows = jnp.pad(ddrows, ((0, padr), (0, 0)), constant_values=DEV_INF)
    sub_b = sub_rows.reshape(nb, 8, Wq)
    dd_b = jnp.pad(ddrows, ((0, 0), (0, 126)), constant_values=DEV_INF).reshape(
        nb, 8, 128
    )
    out = pl.pallas_call(
        partial(_sweep_kernel, n_rows=n_rows),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((nb, 8, Wq), lambda i: (0, 0, 0)),
            pl.BlockSpec((nb, 8, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_rows, 3, Wq), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Wq), lambda i: (0, 0)),
            pl.BlockSpec((1, Wq), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_rows, 3, Wq), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 3, Wq), jnp.int32),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(sub_b, dd_b, seeds, io[None], ie[None])
    return out


def _flanked_kernel(
    subs_ref,  # (3, nb, 8, Wq) substitution rows per table (p, l, r)
    dd_ref,  # (nb, 8, 128) del open/ext per row: lanes 0..5 = p_do p_de l_do l_de r_do r_de
    seeds_ref,  # (n_rows, F3, Wq) per-row seeds (layer-major: 3*fi + gap)
    io_ref,  # (3, Wq) insertion-open per table
    ie_ref,  # (3, Wq) insertion-extend per table
    out_ref,  # (n_rows, F3, Wq)
    *,
    n_rows: int,
    L: int,
    R: int,
    climb: bool,
):
    """Flank-layered sweep, layers unrolled bottom-up inside the row loop.

    Exact spec: ops/primary_sweep.py PrimarySweep.sweep (context.rs:164-354
    semantics).  Layer 0 takes primary diag/del/ins with the within-row
    min-plus chain; every other layer only receives climb edges from the
    layer below (right-flank table for f <= 0, left-flank for f > 0, the
    latter gated on `climb`)."""
    F = L + R + 1
    Wq = subs_ref.shape[-1]

    def body(r, carry):
        # carry: tuple of F*3 planes (1, Wq) — previous row, layer-major.
        blk = r // 8
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, Wq), 0)
        sel = lane8 == (r % 8)

        def sub_row(t):
            return jnp.sum(
                jnp.where(sel, subs_ref[t, pl.ds(blk, 1)][0], 0),
                axis=0,
                keepdims=True,
            )

        subs = [sub_row(t) for t in range(3)]  # (1, Wq) each: p, l, r
        sel128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == (r % 8)
        ddrow = jnp.sum(jnp.where(sel128, dd_ref[pl.ds(blk, 1)][0], 0), axis=0)
        dd = [(ddrow[2 * t], ddrow[2 * t + 1]) for t in range(3)]

        seeds = seeds_ref[pl.ds(r, 1)][0]  # (F3, Wq)

        def prev_layer(fi):
            return carry[3 * fi], carry[3 * fi + 1], carry[3 * fi + 2]

        def diag_from(fi, t):
            pn, pi, pd = prev_layer(fi)
            any_prev = jnp.minimum(jnp.minimum(pn, pi), pd)
            return jnp.minimum(
                _shift_right(any_prev, 1) + _shift_right(subs[t], 1), DEV_INF
            )

        def del_from(fi, t):
            pn, pi, pd = prev_layer(fi)
            d_open, d_ext = dd[t]
            return jnp.minimum(
                jnp.minimum(jnp.minimum(pn, pi) + d_open, DEV_INF),
                jnp.minimum(pd + d_ext, DEV_INF),
            )

        rows = [None] * F  # finalized (none, ins, del) per layer, this row
        for f in range(-R, L + 1):
            fi = f + R
            if (-R < f < 0) or (f == 0 and R > 0):
                climb_src, ct = fi - 1, 2  # right-flank table
            elif f > 0 and climb:
                climb_src, ct = fi - 1, 1  # left-flank table
            else:
                climb_src, ct = None, None

            none_c = seeds[3 * fi + GAP_NONE][None]
            ins_c = seeds[3 * fi + GAP_INS][None]
            del_c = seeds[3 * fi + GAP_DEL][None]

            if f == 0:
                none_c = jnp.minimum(none_c, diag_from(fi, 0))
                del_c = jnp.minimum(del_c, del_from(fi, 0))
            if climb_src is not None:
                none_c = jnp.minimum(none_c, diag_from(climb_src, ct))
                del_c = jnp.minimum(del_c, del_from(climb_src, ct))
                # climb insertion: one step from the CURRENT row of the
                # layer below (finalized by the bottom-up order)
                sn, si, sd = rows[climb_src]
                io_t = io_ref[pl.ds(ct, 1)]
                ie_t = ie_ref[pl.ds(ct, 1)]
                o = _shift_right(
                    jnp.minimum(jnp.minimum(sn, sd) + io_t, DEV_INF), 1
                )
                e = _shift_right(jnp.minimum(si + ie_t, DEV_INF), 1)
                ins_c = jnp.minimum(ins_c, jnp.minimum(o, e))

            if f == 0:
                io_p = io_ref[pl.ds(0, 1)]
                ie_p = ie_ref[pl.ds(0, 1)]
                open_src = jnp.minimum(none_c, del_c)
                open_c = _shift_right(
                    jnp.minimum(open_src + io_p, DEV_INF), 1
                )
                cand = jnp.minimum(ins_c, open_c)
                ext_into = _shift_right(ie_p, 1)
                ins_c = _minplus_chain_row(cand, ext_into)

            rows[fi] = (none_c, ins_c, del_c)

        flat = []
        for fi in range(F):
            n_, i_, d_ = rows[fi]
            flat += [n_[0], i_[0], d_[0]]
        out_ref[pl.ds(r, 1)] = jnp.stack(flat)[None]
        return tuple(v for tri in rows for v in tri)

    init = tuple(
        jnp.full((1, Wq), DEV_INF, jnp.int32) for _ in range(3 * F)
    )
    jax.lax.fori_loop(0, n_rows, body, init)


@partial(jax.jit, static_argnames=("L", "R", "climb", "interpret"))
def sweep_pallas_flanked(subs, ddrows, seeds, io, ie, *, L, R, climb,
                         interpret=False):
    """Flank-layered primary sweep on-chip.

    subs: (3, n_rows, Wq) per-table substitution rows (primary, left,
    right; row 0 all-INF); ddrows: (n_rows, 6) del open/ext per table;
    seeds: (n_rows, F*3, Wq) layer-major; io/ie: (3, Wq).
    Returns M (n_rows, F*3, Wq).
    """
    _, n_rows, Wq = subs.shape
    F = L + R + 1
    nb = -(-n_rows // 8)
    padr = nb * 8 - n_rows
    if padr:
        subs = jnp.pad(subs, ((0, 0), (0, padr), (0, 0)), constant_values=DEV_INF)
        ddrows = jnp.pad(ddrows, ((0, padr), (0, 0)), constant_values=DEV_INF)
    subs_b = subs.reshape(3, nb, 8, Wq)
    dd_b = jnp.pad(ddrows, ((0, 0), (0, 122)), constant_values=DEV_INF).reshape(
        nb, 8, 128
    )
    out = pl.pallas_call(
        partial(_flanked_kernel, n_rows=n_rows, L=L, R=R, climb=climb),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, nb, 8, Wq), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((nb, 8, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_rows, 3 * F, Wq), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, Wq), lambda i: (0, 0)),
            pl.BlockSpec((3, Wq), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_rows, 3 * F, Wq), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 3 * F, Wq), jnp.int32),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(subs_b, dd_b, seeds, io, ie)
    return out


def choose_tile(n_rows: int, Wq: int) -> int:
    """Row-block size for the tiled flankless sweep, sized so one block's
    VMEM residency (sub + dd + seeds + out, double-buffered) stays well
    inside the 64 MB ceiling.  Returns 0 when no multiple-of-8 tile fits
    (pathologically wide rows)."""
    budget = 16 * 2**20  # bytes for ~28*TB*Wq of block state
    tb = 512
    while tb >= 8 and 28 * tb * Wq > budget:
        tb //= 2
    if tb < 8:
        return 0
    return min(tb, max(8, -(-n_rows // 8) * 8))
