"""Pallas TPU kernel for the TSM secondary-module scan.

The module scan is the hot loop of the dense TS engine: for each entry cell
it advances a banded gap-affine DP over (gap state, relative secondary
offset r) through `L` secondary-length levels.  The XLA lax.scan version
round-trips the carried state through HBM once per level and pays the
associative-scan's log factor in full-array passes; this kernel keeps the
whole carried state in VMEM for a block of entry rows and runs all levels
on-chip, so HBM traffic collapses to the inputs plus the per-level exit
minima.

Layout (cross-sequence kinds, the expensive case): grid over blocks of
entry rows; each program holds the three gap planes (BP, C, W) in VMEM and
fori-loops l = 0..L with
  - the secondary-deletion (min,+) chain along W as a doubling composition
    of affine maps (log2 W shifts, all elementwise),
  - match/substitution costs selected from the (A, C, W) LUT by the level's
    primary character (a small where-chain over the alphabet),
  - the directional +-1 shift along W, and the in-place insertion plane.

The numpy ModuleSweep (ops/tsm_modules.py, citing context.rs:357-729) is
the exact spec; this kernel
is validated against it in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jaxcommon import DEV_INF

# The Mosaic scoped-VMEM default is 16 MB; v5e has 128 MB of VMEM.  The
# module kernel's working set (14 int32 planes per entry row plus the kind
# LUT) is sized against the budget in JaxKindModule, which assumes this
# raised ceiling.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)

GAP_NONE, GAP_INS, GAP_DEL = 0, 1, 2


def _shift_last(x, k: int, fwd: bool):
    """Shift along the last axis, filling with DEV_INF (k static)."""
    pad = jnp.full(x.shape[:-1] + (k,), DEV_INF, x.dtype)
    if fwd:
        return jnp.concatenate([pad, x[..., :-k]], axis=-1)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def _minplus_chain(cand, ext, fwd: bool):
    """D[t] = min(cand[t], D[t_prev] + ext[t]) along the last axis (prev is
    t-1 for fwd, t+1 for reverse) via doubling composition."""
    W = cand.shape[-1]
    c, e = cand, ext
    shift = 1
    while shift < W:
        c_prev = _shift_last(c, shift, fwd)
        e_prev = _shift_last(e, shift, fwd)
        c = jnp.minimum(c, jnp.minimum(c_prev + e, DEV_INF))
        e = jnp.minimum(e_prev + e, DEV_INF)
        shift *= 2
    return c


def _module_kernel(
    seedT_ref,  # (BP, C, W) level-0 GAP_NONE plane (entry + entrance seeds)
    lut_ref,  # (A, C, W) match/sub cost vs the secondary char at each (e, r)
    sdo_ref,  # (C, W) secondary-deletion open
    sde_ref,  # (C, W) secondary-deletion extend
    pchar_ref,  # (BP, L) per-level primary char (0 if invalid)
    pmask_ref,  # (BP, L) 0 where the level's primary char is valid, INF else
    io_ref,  # (BP, L) secondary-insertion open (pchar keyed, INF-masked)
    ie_ref,  # (BP, L) secondary-insertion extend
    out_ref,  # (L+1, BP, C) per-level exit minima
    *,
    L: int,
    A: int,
    fwd: bool,
    allow_sdel: bool,
):
    BP, C, W = seedT_ref.shape
    Lp = pchar_ref.shape[1]
    sdo = sdo_ref[...][None]
    sde = jnp.broadcast_to(sde_ref[...][None], (BP, C, W))
    lut = lut_ref[...]

    def close(Tn, Ti, Td):
        if not allow_sdel:
            return Td
        open_src = jnp.minimum(Tn, Ti)
        cand = _shift_last(jnp.minimum(open_src + sdo, DEV_INF), 1, fwd)
        ext = _shift_last(sde, 1, fwd)
        cand = jnp.minimum(cand, Td)
        return _minplus_chain(cand, ext, fwd)

    def body(lvl, carry):
        Tn, Ti, Td = carry
        Td = close(Tn, Ti, Td)
        emit = jnp.min(jnp.minimum(jnp.minimum(Tn, Ti), Td), axis=-1)
        out_ref[pl.ds(lvl, 1)] = emit[None]
        # Extract the level's per-row values with an iota-mask reduction:
        # Mosaic cannot dynamically index the lane dimension, but a masked
        # sum over it is plain vector code.
        lane = jax.lax.broadcasted_iota(jnp.int32, (BP, Lp), 1)
        sel = lane == lvl
        pchar = jnp.sum(jnp.where(sel, pchar_ref[...], 0), axis=-1)  # (BP,)
        pmask = jnp.sum(jnp.where(sel, pmask_ref[...], 0), axis=-1)[:, None, None]
        io = jnp.sum(jnp.where(sel, io_ref[...], 0), axis=-1)[:, None, None]
        ie = jnp.sum(jnp.where(sel, ie_ref[...], 0), axis=-1)[:, None, None]
        # select the level's match/sub costs from the LUT by primary char
        sub = jnp.full((BP, C, W), DEV_INF, jnp.int32)
        for a in range(A):
            sub = jnp.where((pchar == a)[:, None, None], lut[a][None], sub)
        sub = jnp.minimum(sub + pmask, DEV_INF)
        src_any = jnp.minimum(jnp.minimum(Tn, Ti), Td)
        diag = jnp.minimum(src_any + sub, DEV_INF)
        Tn_next = _shift_last(diag, 1, fwd)
        Ti_next = jnp.minimum(
            jnp.minimum(jnp.minimum(Tn, Td) + io, DEV_INF),
            jnp.minimum(Ti + ie, DEV_INF),
        )
        Td_next = jnp.full((BP, C, W), DEV_INF, jnp.int32)
        return Tn_next, Ti_next, Td_next

    Tn0 = seedT_ref[...]
    Ti0 = jnp.full((BP, C, W), DEV_INF, jnp.int32)
    Td0 = jnp.full((BP, C, W), DEV_INF, jnp.int32)
    Tn, Ti, Td = jax.lax.fori_loop(0, L, body, (Tn0, Ti0, Td0))
    Td = close(Tn, Ti, Td)
    emit = jnp.min(jnp.minimum(jnp.minimum(Tn, Ti), Td), axis=-1)
    out_ref[pl.ds(L, 1)] = emit[None]


@partial(
    jax.jit,
    static_argnames=("L", "A", "fwd", "allow_sdel", "block_rows", "interpret"),
)
def module_scan_pallas(
    seedT,  # (NB, C, W) level-0 GAP_NONE plane
    lut,  # (A, C, W)
    sdo,  # (C, W)
    sde,  # (C, W)
    pchar,  # (L, NB) int32 (transposed internally for TPU block tiling)
    pmask,  # (L, NB) 0 valid / DEV_INF invalid
    io,  # (L, NB)
    ie,  # (L, NB)
    *,
    L: int,
    A: int,
    fwd: bool,
    allow_sdel: bool,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Returns B (L+1, NB, C): per-level exit minima per entry row."""
    NB, C, W = seedT.shape
    BP = block_rows
    nb = -(-NB // BP)
    pad = nb * BP - NB
    if pad:
        seedT = jnp.pad(seedT, ((0, pad), (0, 0), (0, 0)), constant_values=DEV_INF)
        pchar = jnp.pad(pchar, ((0, 0), (0, pad)))
        pmask = jnp.pad(pmask, ((0, 0), (0, pad)), constant_values=DEV_INF)
        io = jnp.pad(io, ((0, 0), (0, pad)), constant_values=DEV_INF)
        ie = jnp.pad(ie, ((0, 0), (0, pad)), constant_values=DEV_INF)

    out = pl.pallas_call(
        partial(_module_kernel, L=L, A=A, fwd=fwd, allow_sdel=allow_sdel),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BP, C, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((A, C, W), lambda i: (0, 0, 0)),
            pl.BlockSpec((C, W), lambda i: (0, 0)),
            pl.BlockSpec((C, W), lambda i: (0, 0)),
            pl.BlockSpec((BP, L), lambda i: (i, 0)),
            pl.BlockSpec((BP, L), lambda i: (i, 0)),
            pl.BlockSpec((BP, L), lambda i: (i, 0)),
            pl.BlockSpec((BP, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((L + 1, BP, C), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((L + 1, nb * BP, C), jnp.int32),
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(seedT, lut, sdo, sde, pchar.T, pmask.T, io.T, ie.T)
    return out[:, :NB]
