"""Fused batched rounds loop: ALL reentry rounds in ONE device dispatch.

The lockstep batched engine (batch_ts.BatchedTSAligner) runs each round as
~20 separate device dispatches (8 kind pipelines + folds + seeds + sweep +
summary) with host glue between them.  On this environment's remote-relay
TPU every dispatch pays a fixed RPC round trip, and the round-4 bench
showed the warm batched bucket is launch-bound, not compute-bound
(BENCH_r04: batched_sol_frac 6.4e-07 ≈ 6 orders below the HBM bound).

This module compiles the WHOLE rounds loop — per-pair exact stops included
— into a single `lax.while_loop` program: one dispatch per batch instead
of ~20 per round.  Exactness mirrors batch_ts.align() step for step (the
host loop remains as the fallback and as the executable spec):

  * k*delta bound, TSLB improvement stop (the per-pair remaining-cost
    bounds ride in as device tensors), pruned-entry fixpoint, and the
    global no-sweep stop are computed on device with the same algebra;
  * delta-incremental launches: a cell relaunches only when its pruned
    entry value improved since its last launch;
  * per-chunk liveness: a kind chunk launches only when some pair has a
    finite delta entry in it (the e_base = -1 sentinel of
    ops/jax_modules._kind_all_chunks);
  * per-round primary/reentry fields are stored into preallocated device
    buffers (traced round index, plain dynamic_update_slice — the one
    indexing pattern proven safe here) so the record pipeline's traceback
    can fetch tiles from them lazily (device_fields.py).

The reference has no counterpart (one pair per process,
alignment_result.rs:71-81); this is the TPU-native corpus path.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..costs import INF
from ..ops.jax_modules import _kind_all_chunks
from ..ops.jaxcommon import DEV_INF
from ..ops.jax_primary import _sweep_jit
from ..ops.primary_sweep import GAP_NONE

_BIG = int(DEV_INF) // 2  # device-infinite threshold (jaxcommon)


class KindMeta(NamedTuple):
    """Hashable statics of one kind pipeline inside the fused program."""

    st: tuple  # ops.jax_modules._Static
    PAD: int
    n_anti: int
    pk: int
    width: int
    n_p: int
    bases: Tuple[int, ...]  # static chunk offsets (host-clamped)
    pad_cols: int  # right-pad of the entry field when n_e < chunk


class FusedMeta(NamedTuple):
    kinds: Tuple[KindMeta, ...]
    L: int
    R: int
    climb: bool
    delta: int  # min one-TSM cost bound (k*delta stop)
    slack: int  # tie-break discount bound (fallback pruning)
    max_rounds: int
    keep: bool  # store per-round fields for the traceback
    B: int
    F: int
    nr: int
    nq: int
    # Flankless on-chip Pallas sweep inside the loop (the XLA per-row scan
    # is latency-bound; ops/pallas_sweep.py) — downgraded on compile
    # rejection by the caller's retry chain.  sweep_tile > 0 selects the
    # row-tiled kernel (large shapes the whole-state kernel cannot hold).
    pallas_sweep: bool = False
    sweep_tile: int = 0


def _summ(M_b, lr, lq):
    """Entry layers + per-pair target values (masked reduction — the
    batched-gather slice faults this environment's TPU worker; see
    batch_ts._summ_batch_jit)."""
    B, F, G, Rr, Q = M_b.shape
    E = jnp.min(M_b[:, -1], axis=1)
    rmask = jax.lax.broadcasted_iota(jnp.int32, (B, Rr), 1) == lr[:, None]
    qmask = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1) == lq[:, None]
    m = rmask[:, None, None, :, None] & qmask[:, None, None, None, :]
    tv = jnp.min(jnp.where(m, M_b, DEV_INF), axis=(3, 4))
    return E, jnp.min(tv.reshape(B, F * G), axis=1)


def _fold_cells(R_dev, Rk_pad, n_real, *, PAD, n_anti, transpose):
    """jax_modules._fold_kind_cells without the donation decorator (the
    fused program manages its own buffers)."""
    Rk = Rk_pad[:, :, PAD : PAD + n_anti + 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_anti + 1), 2)
    Rk = jnp.where(cols < n_real[:, None, None], Rk, DEV_INF)
    if transpose:
        Rk = Rk.transpose(0, 2, 1)
    return jnp.minimum(R_dev, Rk)


def _pruned(E, S32, has_lb, best, *, slack, delta_pos):
    """Device analog of batch_ts._pruned_entry_pair, batched.

    E, S32: (B, R, Q) int32; has_lb: (B,) bool; best: (B,) int32."""
    bestc = best[:, None, None]
    finiteA = E < _BIG
    finiteS = S32 < _BIG
    ssum = jnp.where(finiteA & finiteS, E + S32, DEV_INF)
    useful = finiteA & finiteS
    useful &= jnp.where(bestc < _BIG, ssum <= bestc, True)
    lb_pruned = jnp.where(useful, E, DEV_INF)
    # Fallback (no remaining bound for this pair): global threshold.
    thresh = best.astype(jnp.int32) + np.int32(slack) - np.int32(delta_pos)
    fb = jnp.where(
        (bestc < _BIG) & (E > thresh[:, None, None]), DEV_INF, E
    )
    return jnp.where(has_lb[:, None, None], lb_pruned, fb)


def _can_improve(E, S32, has_lb, best):
    """Device analog of batch_ts._can_improve_pair, batched -> (B,) bool."""
    bestc = best[:, None, None]
    mask = (E < _BIG) & (S32 < _BIG)
    ssum = jnp.where(mask, E + S32, DEV_INF)
    strict = jnp.any(mask & (ssum < bestc), axis=(1, 2))
    return jnp.where(has_lb & (best < _BIG), strict, True)


def _reentry_all_kinds(A_delta, kind_data, meta: FusedMeta):
    """All kind pipelines over the delta entry fields -> folded (B, R, Q)
    reentry cells (mirrors batch_ts._reentry_batch's chunked route; the
    compact-column gather route is a per-round host decision and is traded
    for the zero-dispatch loop here)."""
    B = meta.B
    R_new = jnp.full((B, meta.nr + 1, meta.nq + 1), DEV_INF, jnp.int32)
    for km, (fixed_b, B_pre, n_reals) in zip(meta.kinds, kind_data):
        st = km.st
        C = st.chunk
        A_mod = A_delta if km.pk == 0 else A_delta.transpose(0, 2, 1)
        if km.pad_cols:
            A_mod = jnp.pad(
                A_mod, ((0, 0), (0, 0), (0, km.pad_cols)),
                constant_values=int(DEV_INF),
            )
        # Per-pair chunk liveness: a chunk with no finite delta entry in any
        # of its columns is skipped via the -1 sentinel.
        eb_cols = []
        for b in km.bases:
            live = (A_mod[:, :, b : b + C] < _BIG).any(axis=(1, 2))
            eb_cols.append(jnp.where(live, np.int32(b), np.int32(-1)))
        eb_b = jnp.stack(eb_cols, axis=1)
        Rk0 = jnp.full((B, km.n_p + 1, km.width), DEV_INF, jnp.int32)
        # lax.map over pairs, NOT vmap (single-pair-sized temps; the
        # vmapped assembly faults this environment's worker — batch_ts).
        Rk = jax.lax.map(
            lambda args: _kind_all_chunks(
                args[0], args[1], args[2], args[4], args[3],
                st=st, PAD=km.PAD,
            ),
            (A_mod, Rk0, fixed_b, B_pre, eb_b),
        )
        R_new = _fold_cells(
            R_new, Rk, n_reals,
            PAD=km.PAD, n_anti=km.n_anti, transpose=km.pk == 1,
        )
    return R_new


@partial(jax.jit, static_argnames=("meta",))
def _fused_loop(data, *, meta: FusedMeta):
    """Rounds 1..max_rounds of the lockstep batch, one dispatch."""
    B = meta.B
    root = data["root"]
    arrays_b = data["arrays"]
    S32 = data["S32"]
    has_lb = data["has_lb"]
    lr, lq = data["lr"], data["lq"]
    kind_data = data["kinds"]
    delta_pos = max(0, meta.delta)

    def sweep(seeds):
        if meta.pallas_sweep:
            from ..ops.pallas_sweep import (
                sweep_pallas_flankless,
                sweep_pallas_flankless_tiled,
            )

            fl_sub, fl_dd, fl_io, fl_ie = data["flankless"]

            def one(args):
                s, subr, dd, io, ie = args
                if meta.sweep_tile:
                    M = sweep_pallas_flankless_tiled(
                        subr, dd, s[0].transpose(1, 0, 2), io, ie,
                        TB=meta.sweep_tile,
                    )
                else:
                    M = sweep_pallas_flankless(
                        subr, dd, s[0].transpose(1, 0, 2), io, ie
                    )
                return M.transpose(1, 0, 2)[None]

            return jax.lax.map(one, (seeds, fl_sub, fl_dd, fl_io, fl_ie))
        return jax.vmap(
            lambda s, a: _sweep_jit(s, a, L=meta.L, R=meta.R, climb=meta.climb)
        )(seeds, arrays_b)

    def body(carry):
        (k, done, best, E, A_launched, R_acc, rounds, np_cnt, nr_cnt,
         M_all, R_all, E_all) = carry

        # Top-of-round exact stops (k*delta bound, TSLB improvement test).
        d1 = (meta.delta > 0) & (k * np.int32(meta.delta) > best)
        improve = _can_improve(E, S32, has_lb, best)
        newly = ~done & (d1 | ~improve)
        rounds = jnp.where(newly, k, rounds)
        done = done | newly

        def skip(args):
            return args

        def work(args):
            (best, E, A_launched, R_acc, rounds, done, np_cnt, nr_cnt,
             M_all, R_all, E_all) = args
            A = _pruned(
                E, S32, has_lb, best, slack=meta.slack, delta_pos=delta_pos
            )
            A = jnp.where(done[:, None, None], DEV_INF, A)
            A_delta = jnp.where(A < A_launched, A, DEV_INF)
            A_launched2 = jnp.minimum(A_launched, A)
            R_new = _reentry_all_kinds(A_delta, kind_data, meta)
            R_acc2 = jnp.minimum(R_acc, R_new)
            # Host parity: the very first launch (k == 1) never counts as
            # "unchanged" (batch_ts: R_acc was None).
            unchanged = (k > np.int32(1)) & jnp.all(R_acc2 == R_acc)
            if meta.keep:
                nr_cnt = nr_cnt + jnp.where(done, 0, 1)
                R_all = jax.lax.dynamic_update_slice(
                    R_all, R_acc2[None], (k - 1, 0, 0, 0)
                )

            def stop(args2):
                (best, E, rounds, done, np_cnt, M_all, E_all) = args2
                rounds = jnp.where(done, rounds, k + 1)
                return (best, E, rounds, jnp.ones_like(done), np_cnt,
                        M_all, E_all)

            def resweep(args2):
                (best, E, rounds, done, np_cnt, M_all, E_all) = args2
                seeds = root.at[:, 0, GAP_NONE].min(R_acc2)
                M = sweep(seeds)
                if meta.keep:
                    np_cnt = np_cnt + jnp.where(done, 0, 1)
                    M_all = jax.lax.dynamic_update_slice(
                        M_all, M[None], (k, 0, 0, 0, 0, 0)
                    )
                E2, t = _summ(M, lr, lq)
                if meta.keep:
                    E_all = jax.lax.dynamic_update_slice(
                        E_all, E2[None], (k, 0, 0, 0)
                    )
                new_best = jnp.minimum(best, t)
                # Pruned-entry fixpoint per pair (batch_ts semantics).
                A_next = _pruned(
                    E2, S32, has_lb, new_best,
                    slack=meta.slack, delta_pos=delta_pos,
                )
                A_cmp_new = _pruned(
                    E, S32, has_lb, new_best,
                    slack=meta.slack, delta_pos=delta_pos,
                )
                A_cmp = jnp.where(
                    (new_best < best)[:, None, None], A_cmp_new, A
                )
                fix = jnp.all(A_next == A_cmp, axis=(1, 2))
                newly2 = ~done & fix
                rounds = jnp.where(newly2, k + 1, rounds)
                return (new_best, E2, rounds, done | newly2, np_cnt,
                        M_all, E_all)

            best, E, rounds, done, np_cnt, M_all, E_all = jax.lax.cond(
                unchanged, stop, resweep,
                (best, E, rounds, done, np_cnt, M_all, E_all),
            )
            return (best, E, A_launched2, R_acc2, rounds, done, np_cnt,
                    nr_cnt, M_all, R_all, E_all)

        (best, E, A_launched, R_acc, rounds, done, np_cnt, nr_cnt,
         M_all, R_all, E_all) = jax.lax.cond(
            jnp.all(done), skip, work,
            (best, E, A_launched, R_acc, rounds, done, np_cnt, nr_cnt,
             M_all, R_all, E_all),
        )
        return (k + 1, done, best, E, A_launched, R_acc, rounds, np_cnt,
                nr_cnt, M_all, R_all, E_all)

    def cond(carry):
        k, done = carry[0], carry[1]
        return (k <= np.int32(meta.max_rounds)) & ~jnp.all(done)

    Rr, Q = meta.nr + 1, meta.nq + 1
    if meta.keep:
        M_all0 = jnp.full(
            (meta.max_rounds + 1, B, meta.F, 3, Rr, Q), DEV_INF, jnp.int32
        )
        M_all0 = M_all0.at[0].set(data["M0"])
        R_all0 = jnp.full((meta.max_rounds, B, Rr, Q), DEV_INF, jnp.int32)
        E_all0 = jnp.full(
            (meta.max_rounds + 1, B, Rr, Q), DEV_INF, jnp.int32
        )
        E_all0 = E_all0.at[0].set(data["E0"])
    else:
        M_all0 = jnp.zeros((), jnp.int32)
        R_all0 = jnp.zeros((), jnp.int32)
        E_all0 = jnp.zeros((), jnp.int32)
    carry0 = (
        jnp.int32(1),
        jnp.zeros((B,), bool),
        data["best0"],
        data["E0"],
        jnp.full((B, Rr, Q), DEV_INF, jnp.int32),
        jnp.full((B, Rr, Q), DEV_INF, jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        M_all0,
        R_all0,
        E_all0,
    )
    (k, done, best, E, _A_l, R_acc, rounds, np_cnt, nr_cnt, M_all,
     R_all, E_all) = jax.lax.while_loop(cond, body, carry0)
    return {
        "done": done,
        "best": best,
        "rounds": rounds,
        "np_cnt": np_cnt,
        "nr_cnt": nr_cnt,
        "M_all": M_all,
        "R_all": R_all,
        "E_all": E_all,
        "iters": k - 1,
    }


def build_meta_and_data(bt, arrays_b, root_dev, M0_dev, E0_dev, best0,
                        keep: bool, pallas_sweep: bool = False,
                        sweep_tile: int = 0):
    """Assemble (meta, data) for the fused loop from a BatchedTSAligner
    whose kind state is built."""
    kinds_meta: List[KindMeta] = []
    kind_data = []
    for km0, fixed_b, B_pre, e_bases in bt._kind_state:
        spec = km0.spec
        C = km0.chunk
        PAD = max(0, -km0.s_lo)
        width = PAD + spec.n_anti + 1 + max(0, C - 1 + km0.s_hi)
        n_e = spec.n_anti + 1
        pad_cols = C - n_e if n_e < C else 0
        bases = tuple(int(b) for b in np.asarray(e_bases))
        kinds_meta.append(
            KindMeta(
                st=km0._static, PAD=PAD, n_anti=spec.n_anti, pk=spec.pk,
                width=width, n_p=spec.n_p, bases=bases, pad_cols=pad_cols,
            )
        )
        n_reals = jnp.asarray(
            [lq if spec.pk == 0 else lr for lr, lq in bt.real], jnp.int32
        )
        kind_data.append((fixed_b, B_pre, n_reals))

    from ..engine import min_tsm_cost_bound

    S32, has_lb = bt._bounds_device()

    F = bt.config.left_flank_length + bt.config.right_flank_length + 1
    meta = FusedMeta(
        kinds=tuple(kinds_meta),
        L=bt.config.left_flank_length,
        R=bt.config.right_flank_length,
        climb=True,
        delta=min_tsm_cost_bound(bt.config),
        slack=bt.config.secondary_length_bonus * (bt.nr + bt.nq),
        max_rounds=bt.max_rounds,
        keep=keep,
        B=bt.n_pairs,
        F=F,
        nr=bt.nr,
        nq=bt.nq,
        pallas_sweep=pallas_sweep,
        sweep_tile=sweep_tile,
    )
    best0_dev = jnp.asarray(
        [min(b, int(DEV_INF)) for b in best0], jnp.int32
    )
    data = {
        "root": root_dev,
        "arrays": arrays_b,
        "S32": S32,
        "has_lb": has_lb,
        "lr": jnp.asarray([r for r, _ in bt.limits], jnp.int32),
        "lq": jnp.asarray([q for _, q in bt.limits], jnp.int32),
        "kinds": kind_data,
        "E0": E0_dev,
        "best0": best0_dev,
    }
    if keep:
        data["M0"] = M0_dev
    if pallas_sweep:
        fl = [sw.flankless_inputs() for sw in bt.sweeps]
        data["flankless"] = tuple(
            jnp.stack([jnp.asarray(f[j]) for f in fl]) for j in range(4)
        )
    return meta, data
