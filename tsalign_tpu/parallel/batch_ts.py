"""Batched template-switch alignment: many pairs per device dispatch.

The corpus-level throughput path (the reference ran one pair per process
and left corpus parallelism to external scripts — alignment_result.rs:71-81,
SURVEY.md §2.8): pairs are padded to one poison-char bucket, their per-pair
tables stacked, and the single-pair jitted kernels (ops/jax_primary,
ops/jax_modules) vmapped over the batch dimension.  The rounds loop runs in
lockstep; each pair terminates by the same exact criteria as the single-pair
engines (k*delta bound, TSLB improvement test, pruned-entry fixpoint), and
the batch stops when every pair has.  Traceback runs on the host per pair
over the kept fields, so the full record pipeline (tie-break, extension,
equal-cost ranges, TOML) is available batched via `align_pairs`.

Chunk-level cost pruning is intentionally skipped here (it is per-pair,
data-dependent): this path trades it for batch parallelism.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TemplateSwitchConfig
from ..costs import INF
from ..engine import min_tsm_cost_bound
from ..geometry import AlignmentRange
from ..jax_engine import JaxEngineResult
from functools import partial

from ..ops.jax_primary import JaxPrimarySweep, _sweep_jit
from ..ops.jax_modules import (
    JaxKindModule,
    _fold_kind_cells,
    _kind_all_chunks,
    _kind_sel_chunks,
    _same_module_jit,
)
from ..ops.jaxcommon import (
    DEV_INF,
    from_device_costs,
    sync_point,
    to_device_costs,
    validate_magnitudes,
)
from ..ops.primary_sweep import GAP_NONE
from ..ops.tsm_modules import make_kind_spec


@jax.jit
def _summ_batch_jit(M_b, lr, lq):
    """Per-pair sweep summary (entry layer + target-cell values at each
    pair's real lengths) computed on device — the full stacked fields stay
    off the relay unless keep_fields needs them.

    The target values are extracted with a masked reduction rather than a
    vmapped dynamic_slice at the traced (lr_i, lq_i): the slice lowers to a
    batched gather, and running THAT program faults this environment's TPU
    worker on the next large dispatch (bisected in round 3 — the batched
    bucket "kernel fault" crash; scripts/bisect_batch_crash.py)."""
    B, F, G, R, Q = M_b.shape
    E = jnp.min(M_b[:, -1], axis=1)
    rmask = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1) == lr[:, None]
    qmask = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1) == lq[:, None]
    m = rmask[:, None, None, :, None] & qmask[:, None, None, None, :]
    tv = jnp.min(jnp.where(m, M_b, DEV_INF), axis=(3, 4))
    return E, tv.reshape(B, F * G)


@jax.jit
def _seeds_batch_jit(root_dev, R_dev):
    """Next-round batched seeds on device (see jax_engine._seeds_jit)."""
    return root_dev.at[:, 0, GAP_NONE].min(R_dev)


# Module-level jitted wrappers for every repeated batch dispatch.  The
# previous per-call closures (fresh jax.vmap / jax.lax.map lambdas built
# inside the rounds loop) were re-traced and re-lowered on EVERY call, and
# over the axon relay each eager lowering pays a remote compile-cache RPC
# (seconds) even when the executable itself is cached server-side: the
# round-3 batched bucket spent ~260 s of its 285 s warm wall on the host
# between dispatches (profile in RESULTS.md round 4).  Hoisting the maps
# into jitted functions keyed on static (st, PAD, ...) makes repeat calls
# hit jit's C++ executable fast path: zero retrace, zero RPC.


@partial(jax.jit, static_argnames=("st",))
def _same_module_batch_jit(fixed_b, *, st):
    return jax.vmap(lambda f: _same_module_jit(f, st=st))(fixed_b)


@partial(jax.jit, static_argnames=("st", "PAD"))
def _kind_map_jit(A_b, Rk_b, fixed_b, B_pre_b, eb_b, *, st, PAD):
    # lax.map (scan over pairs), NOT vmap: the vmapped assembly multiplies
    # the dispatch's temp memory by the batch size (memory_analysis:
    # 0.5-0.7 GB at B=8), and dispatches that large fault this
    # environment's TPU worker once any device->host transfer has run
    # (round-3 bisect, scripts/bisect_batch_crash.py).  Per-pair
    # serialization keeps the temp at the single-pair engine's level; the
    # per-pair assembly is already wide enough to fill the chip.
    return jax.lax.map(
        lambda args: _kind_all_chunks(
            args[0], args[1], args[2], args[4], args[3], st=st, PAD=PAD
        ),
        (A_b, Rk_b, fixed_b, B_pre_b, eb_b),
    )


@partial(jax.jit, static_argnames=("st", "PAD", "OUTW"))
def _kind_sel_map_jit(A_b, es_b, fixed_b, B_pre_b, *, st, PAD, OUTW):
    # lax.map keeps the compact-column gathers unbatched: the exact op
    # pattern the single-pair path already exercises safely on device.
    return jax.lax.map(
        lambda args: _kind_sel_chunks(
            args[0], args[1], args[2], args[3],
            st=st, PAD=PAD, OUTW=OUTW, gather=True,
        ),
        (A_b, es_b, fixed_b, B_pre_b),
    )


@partial(jax.jit, static_argnames=("PAD", "n_anti", "transpose"))
def _fold_batch_jit(R_b, Rk_b, n_reals, *, PAD, n_anti, transpose):
    return jax.vmap(
        lambda r, rk, nr: _fold_kind_cells(
            r, rk, nr, PAD=PAD, n_anti=n_anti, transpose=transpose
        )
    )(R_b, Rk_b, n_reals)


@partial(jax.jit, static_argnames=("L", "R", "climb"))
def _sweep_batch_jit(seeds, arrays, *, L, R, climb):
    return jax.vmap(
        lambda s, a: _sweep_jit(s, a, L=L, R=R, climb=climb)
    )(seeds, arrays)


@jax.jit
def _acc_batch_jit(R_acc, R_new):
    """Fold a round's reentry contributions into the device accumulator and
    report whether anything improved (see jax_engine._acc_jit)."""
    R2 = jnp.minimum(R_acc, R_new)
    return R2, jnp.all(R2 == R_acc)


def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b


# Content-keyed memos across BatchedTSAligner instances (the single-pair
# engine's _KINDS_MEMO/_LB_MEMO reasoning, jax_engine.py): the per-pair
# remaining bounds, the stacked kind state (device-resident _fixed tensors
# + batch module fields) and the stacked sweep arrays are pure functions of
# (config, padded pair bytes, ...), and rebuilding them dominated the warm
# batched wall (a fresh aligner instance per run is the natural API).  Each
# memo keeps a handful of entries, FIFO-evicted (the tensors are ~MBs of
# HBM each; chained-mode probe/traceback batches alternate content).
_BATCH_MEMO_CAP = 6
_BATCH_BOUNDS_MEMO: dict = {}
_BATCH_KINDS_MEMO: dict = {}
_BATCH_ARRAYS_MEMO: dict = {}
_BATCH_ROOT_MEMO: dict = {}
_BATCH_S32_MEMO: dict = {}


def _memo_put(memo: dict, key, value) -> None:
    while len(memo) >= _BATCH_MEMO_CAP:
        memo.pop(next(iter(memo)))
    memo[key] = value


class BatchedTSAligner:
    """Batched TS alignment over equal-bucket pairs (costs + traceback)."""

    def __init__(
        self,
        config: TemplateSwitchConfig,
        pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
        max_rounds: int = 32,
        chunk: int = 64,
        keep_fields: bool = False,
        ranges: Optional[Sequence[AlignmentRange]] = None,
        use_lower_bounds: bool = True,
        bucket: bool = True,
    ):
        """`ranges`: optional per-pair focus ranges (chained-mode segments
        align a focus window inside radius context, chain/driver.py): the
        root seed sits at each pair's (reference_offset, query_offset) and
        the target at its limits; the primary roams the whole padded grid
        (NoPrune semantics, as the single-pair segment path)."""
        self.config = config
        self.use_lower_bounds = use_lower_bounds
        self.n_pairs = len(pairs)
        P = config.alphabet.size
        # bucket=False (single-pair fused delegation): exact shapes — no
        # power-of-two padding overhead when there is nothing to share.
        nr = max(len(r) for r, _ in pairs)
        nq = max(len(q) for _, q in pairs)
        if bucket:
            nr, nq = _bucket(nr), _bucket(nq)
        self.nr, self.nq = nr, nq
        # REAL content lengths, poison-aware: callers may hand in arrays
        # already padded with the poison char (chained-mode buckets), and
        # every structural feasibility (seed walks, strict reentry, exit
        # walk) must derive from the real lengths (CLAUDE.md padded
        # soundness; tests/test_padded_soundness.py).
        from ..ops.tsm_modules import real_seq_length

        self.real = [
            (
                real_seq_length(np.asarray(r), P),
                real_seq_length(np.asarray(q), P),
            )
            for r, q in pairs
        ]
        self.ranges = (
            list(ranges)
            if ranges is not None
            else [AlignmentRange.complete(lr, lq) for lr, lq in self.real]
        )
        self.limits = [
            (rg.reference_limit, rg.query_limit) for rg in self.ranges
        ]
        self.refs = np.full((self.n_pairs, nr), P, dtype=np.int8)
        self.qrys = np.full((self.n_pairs, nq), P, dtype=np.int8)
        for i, (r, q) in enumerate(pairs):
            self.refs[i, : len(r)] = r
            self.qrys[i, : len(q)] = q
        self.max_rounds = max_rounds
        self.chunk = chunk
        self.keep_fields = keep_fields
        self._validate()

        # Per-pair single-pair sweep machinery (host precompute per pair),
        # with identical statics across the batch thanks to the shared
        # bucket.  Kind modules are built lazily (the deletion-drift budget
        # needs round-0 costs, jax_engine._sdel_budget).
        self.sweeps = [
            JaxPrimarySweep(config, self.refs[i], self.qrys[i])
            for i in range(self.n_pairs)
        ]
        self.kind_sets: Optional[List[List[JaxKindModule]]] = None
        self.sdel_budget: Optional[int] = None

    def _validate(self) -> None:
        cfg = self.config
        mx = 0
        for t in (
            cfg.primary_edit_costs,
            cfg.secondary_forward_edit_costs,
            cfg.secondary_reverse_edit_costs,
            cfg.left_flank_edit_costs,
            cfg.right_flank_edit_costs,
        ):
            for arr in (t.substitution, t.gap_open, t.gap_extend):
                finite = arr[arr < INF]
                if finite.size:
                    mx = max(mx, int(finite.max()))
        for fn in (
            cfg.rq_qr_offset_costs,
            cfg.rr_qq_offset_costs,
            cfg.length_costs,
            cfg.length_difference_costs,
            cfg.forward_anti_primary_gap_costs,
            cfg.reverse_anti_primary_gap_costs,
        ):
            finite = [c for _, c in fn.points if c < INF]
            if finite:
                mx = max(mx, max(finite))
        base_fin = [v for v in cfg.base_cost.values() if v < INF]
        if base_fin:
            mx = max(mx, max(base_fin))
        validate_magnitudes(mx, 2 * (self.nr + self.nq + 2))

    # ---- per-pair exact-termination machinery (mirrors jax_engine) ----

    def _bounds(self):
        """Per-pair admissible remaining-cost bounds (lower_bounds.py);
        None entries mean the relaxed iteration does not apply for that
        pair's padded grid."""
        if not self.use_lower_bounds:
            return [None] * self.n_pairs  # see engine.DenseAligner
        if not hasattr(self, "_lb_cache"):
            from ..chain.plan import config_digest
            from ..lower_bounds import compute_remaining_bound

            key = (
                config_digest(self.config),
                self.refs.tobytes(),
                self.qrys.tobytes(),
                tuple(self.real),
                tuple(self.limits),
            )
            if key not in _BATCH_BOUNDS_MEMO:
                bounds = [
                    compute_remaining_bound(
                        self.config, self.refs[i], self.qrys[i], rl, ql
                    )
                    for i, (rl, ql) in enumerate(self.limits)
                ]
                _memo_put(_BATCH_BOUNDS_MEMO, key, bounds)
            self._lb_cache = _BATCH_BOUNDS_MEMO[key]
        return self._lb_cache

    def _pruned_entry_pair(self, i: int, E_i: np.ndarray, best: int) -> np.ndarray:
        """Per-pair pruned entry field in device int32 from the entry layer
        (see jax_engine.JaxAligner._pruned_entry_cells; padded cells beyond
        the pair's real lengths are unreachable through poison moves, so no
        extra slice masking is needed)."""
        A_cells = E_i.astype(np.int32)
        lb = self._bounds()[i]
        if lb is not None:
            A64 = A_cells.astype(np.int64)
            useful = (A64 < int(DEV_INF) // 2) & (lb.S < INF)
            if best < INF:
                useful &= A64 + lb.S <= best
            return np.where(useful, A_cells, np.int32(DEV_INF))
        if best >= INF:
            return A_cells
        slack = self.config.secondary_length_bonus * (self.nr + self.nq)
        thresh = best + slack - max(0, min_tsm_cost_bound(self.config))
        return np.where(
            A_cells.astype(np.int64) > thresh, np.int32(DEV_INF), A_cells
        )

    def _bounds_device(self):
        """Device-resident (S32, has_lb) tensors of the per-pair remaining
        bounds for the fused loop — clamped int32 (finite values stay
        BELOW the device-infinite threshold: a lower bound may only shrink
        — sound; host-INF maps to DEV_INF so the S == INF prune is
        preserved).  Memoized with the same content key as _bounds so
        fresh aligner instances skip the ~MBs host build + upload."""
        from ..chain.plan import config_digest

        key = (
            config_digest(self.config),
            self.refs.tobytes(),
            self.qrys.tobytes(),
            tuple(self.real),
            tuple(self.limits),
            self.use_lower_bounds,
        )
        if key not in _BATCH_S32_MEMO:
            BIG = int(DEV_INF) // 2
            Rr, Q = self.nr + 1, self.nq + 1
            S32 = np.full((self.n_pairs, Rr, Q), int(DEV_INF), np.int32)
            has_lb = np.zeros(self.n_pairs, bool)
            for i, lb in enumerate(self._bounds()):
                if lb is None:
                    continue
                has_lb[i] = True
                S = np.minimum(lb.S, BIG - 1).astype(np.int32)
                S32[i] = np.where(lb.S >= INF, np.int32(DEV_INF), S)
            _memo_put(
                _BATCH_S32_MEMO, key, (jnp.asarray(S32), jnp.asarray(has_lb))
            )
        return _BATCH_S32_MEMO[key]

    def _can_improve_pair(self, i: int, E_i: np.ndarray, best: int) -> bool:
        lb = self._bounds()[i]
        if lb is None or best >= INF:
            return True
        A64 = E_i.astype(np.int64)
        mask = (A64 < int(DEV_INF) // 2) & (lb.S < INF)
        return bool(np.any(mask & (A64 + lb.S < best)))

    def _derive_budget(self, best: List[int]) -> Optional[int]:
        finite = [b for b in best if b < INF]
        if not finite:
            return None
        cfg = self.config
        steps = []
        for d in ("Forward", "Reverse"):
            t = cfg.secondary_edit_costs(d)
            steps.append(min(t.min_gap_open_cost(), t.min_gap_extend_cost()))
        min_step = min(steps)
        if min_step <= 0:
            return None
        budget = max(finite) // min_step
        b = 8
        while b < budget:
            b *= 2
        return b

    def _build_kind_sets(self, budget: Optional[int]) -> None:
        from ..chain.plan import config_digest

        key = (
            config_digest(self.config),
            self.refs.tobytes(),
            self.qrys.tobytes(),
            tuple(self.real),
            self.chunk,
            budget,
        )
        if key in _BATCH_KINDS_MEMO:
            self.sdel_budget = budget
            self.kind_sets, self._kind_state = _BATCH_KINDS_MEMO[key]
            return
        self._build_kind_sets_uncached(budget)
        _memo_put(_BATCH_KINDS_MEMO, key, (self.kind_sets, self._kind_state))

    def _build_kind_sets_uncached(self, budget: Optional[int]) -> None:
        self.sdel_budget = budget
        self.kind_sets = []
        for i in range(self.n_pairs):
            kinds = []
            # Per-PAIR LUT cache (shared across the pk variants only): the
            # LUTs embed the pair's secondary sequence, so sharing across
            # pairs would price every pair with pair 0's sequences.
            lut_cache: dict = {}
            lr, lq = self.real[i]
            for pk in (0, 1):
                for sk in (0, 1):
                    for dk in (0, 1):
                        # Per-pair REAL lengths drive the structural
                        # feasibilities (seed walk bounds, strict reentry,
                        # exit walk); the shared bucket lengths drive the
                        # shapes and the active/None decision, so every
                        # pair agrees on the kind set and the stacked
                        # shapes below.
                        spec = make_kind_spec(
                            self.config,
                            self.nr,
                            self.nq,
                            pk,
                            sk,
                            dk,
                            sdel_budget=budget,
                            n_ref_real=lr,
                            n_qry_real=lq,
                        )
                        if spec is None:
                            continue
                        km = JaxKindModule(
                            spec,
                            self.config,
                            self.refs[i],
                            self.qrys[i],
                            0,
                            self.nq if pk == 0 else self.nr,
                            chunk=self.chunk,
                            lut_cache=lut_cache,
                        )
                        if km.active:
                            kinds.append(km)
            self.kind_sets.append(kinds)
        # Round-invariant per-kind batch state: stacked _fixed tensors and
        # (for intra-sequence kinds) the entry-independent module fields.
        self._kind_state = []
        kind_count = len(self.kind_sets[0]) if self.kind_sets else 0
        for ki in range(kind_count):
            kms = [ks[ki] for ks in self.kind_sets]
            km0 = kms[0]
            fixed_b = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[km._fixed for km in kms]
            )
            if km0.spec.same_seq:
                B_pre = _same_module_batch_jit(fixed_b, st=km0._static)
                sync_point(
                    B_pre,
                    f"batch B_pre pk={km0.spec.pk} sk={km0.spec.sk} "
                    f"dk={km0.spec.dk}",
                )
            else:
                B_pre = jnp.zeros((self.n_pairs, 1, 1), jnp.int32)
            n_e = km0.spec.n_anti + 1
            C = km0.chunk
            e_bases = jnp.asarray(
                [
                    np.int32(min(e0, n_e - C) if n_e >= C else 0)
                    for e0 in range(0, n_e, C)
                ],
                jnp.int32,
            )
            self._kind_state.append((km0, fixed_b, B_pre, e_bases))

    def _reentry_batch(self, A_stack: np.ndarray, shard) -> np.ndarray:
        """Batched all-kinds reentry cells from the stacked (pruned) entry
        fields."""
        B = self.n_pairs
        launched = []
        for km0, fixed_b, B_pre, e_bases in self._kind_state:
            spec = km0.spec
            A_mod = A_stack if spec.pk == 0 else A_stack.transpose(0, 2, 1)
            n_anti = spec.n_anti
            C = km0.chunk
            PAD = max(0, -km0.s_lo)
            width = PAD + n_anti + 1 + max(0, C - 1 + km0.s_hi)
            Rk_pad0 = jnp.full((B, spec.n_p + 1, width), DEV_INF, jnp.int32)
            A_dev = jnp.asarray(np.ascontiguousarray(A_mod))
            # Per-pair chunk liveness: the pruned entry field marks dead
            # cells DEV_INF, so a chunk whose column block has no finite
            # entry contributes nothing — its base becomes the -1 sentinel
            # (_kind_all_chunks skips it).  e_bases rides as a MAPPED
            # operand so each pair scans only its own live chunks; after
            # round 1 the pruned field is sparse and this is the batch
            # analog of the single-pair chunk pruning.
            eb_host = np.asarray(e_bases)
            eb_b = np.full((B, eb_host.size), -1, np.int32)
            n_e = n_anti + 1
            finite = A_mod < int(DEV_INF) // 2  # (B, n_p+1, n_e[+pad])
            col_live = finite.any(axis=1)  # (B, n_e)
            for ci, eb in enumerate(eb_host):
                s0 = int(eb)
                live = col_live[:, s0 : s0 + C].any(axis=1)
                eb_b[live, ci] = s0
            if (eb_b < 0).all():
                continue  # no pair has a live entry for this kind
            # Compact-column route (the single-pair engine's post-round-1
            # fast path, _kind_sel_chunks): once the pruned entry fields
            # are sparse but SCATTERED, whole chunks stay live while only a
            # handful of columns in them matter — gather just the live
            # columns per pair into a shared power-of-two bucket instead.
            # lax.map keeps the gathers unbatched: the exact op pattern the
            # single-pair path already exercises safely on device every
            # round.  Sentinel slots (0) re-gather column 0 (idempotent
            # duplicate or pruned-INF) — exact either way.
            n_live_max = max(int(col_live.sum(axis=1).max()), 1)
            Kb = C
            while Kb < n_live_max:
                Kb *= 2
            live_chunks_max = int((eb_b >= 0).sum(axis=1).max())
            # Engage only on a clear win: at Kb ~ n_e the gathered bucket
            # redoes the full chunked work plus gather overhead (measured
            # 32 s vs 20 s per cross kind on device at Kb = n_e).
            if shard is None and 2 * Kb <= live_chunks_max * C:
                e_sel_b = np.zeros((B, Kb), np.int32)
                for i in range(B):
                    idx = np.nonzero(col_live[i])[0]
                    e_sel_b[i, : idx.size] = idx.astype(np.int32)
                OUTW = PAD + spec.n_anti + 1 + max(0, km0.s_hi)

                es_dev = jnp.asarray(e_sel_b)
                try:
                    sel = _kind_sel_map_jit(
                        A_dev, es_dev, fixed_b, B_pre,
                        st=km0._static._replace(separate_cols=True),
                        PAD=PAD, OUTW=OUTW,
                    )
                except Exception as e:
                    from ..jax_engine import _module_pallas_fallback

                    _module_pallas_fallback(km0, e)
                    sel = _kind_sel_map_jit(
                        A_dev, es_dev, fixed_b, B_pre,
                        st=km0._static._replace(separate_cols=True),
                        PAD=PAD, OUTW=OUTW,
                    )
                sync_point(
                    sel,
                    f"batch kind pk={spec.pk} sk={spec.sk} dk={spec.dk} "
                    f"compact Kb={Kb}",
                )
                n_reals = jnp.asarray(
                    [lq if spec.pk == 0 else lr for lr, lq in self.real],
                    jnp.int32,
                )
                launched.append((spec, PAD, sel, n_reals))
                continue
            eb_dev = jnp.asarray(eb_b)
            if shard is not None:
                A_dev, Rk_pad0 = shard(A_dev), shard(Rk_pad0)
                eb_dev = shard(eb_dev)

            try:
                Rk_pad = _kind_map_jit(
                    A_dev, Rk_pad0, fixed_b, B_pre, eb_dev,
                    st=km0._static, PAD=PAD,
                )
            except Exception as e:
                # Mosaic compile rejection of the vmapped Pallas module
                # kernel: downgrade this kind to the XLA scan path and retry
                # (see jax_engine._module_pallas_fallback).
                from ..jax_engine import _module_pallas_fallback

                _module_pallas_fallback(km0, e)
                Rk_pad = _kind_map_jit(
                    A_dev, Rk_pad0, fixed_b, B_pre, eb_dev,
                    st=km0._static, PAD=PAD,
                )
            sync_point(
                Rk_pad,
                f"batch kind pk={spec.pk} sk={spec.sk} dk={spec.dk} "
                f"pallas={km0._static.use_pallas}",
            )
            n_reals = jnp.asarray(
                [lq if spec.pk == 0 else lr for lr, lq in self.real],
                jnp.int32,
            )
            launched.append((spec, PAD, Rk_pad, n_reals))
        if not launched:
            R0 = jnp.full((B, self.nr + 1, self.nq + 1), DEV_INF, jnp.int32)
            return shard(R0) if shard is not None else R0
        # Device-side fold (see jax_engine._reentry): one transfer of the
        # folded (B, nr+1, nq+1) field instead of one per kind.
        R_dev = jnp.full((B, self.nr + 1, self.nq + 1), DEV_INF, jnp.int32)
        if shard is not None:
            R_dev = shard(R_dev)
        for spec, PAD, Rk_pad, n_reals in launched:
            R_dev = _fold_batch_jit(
                R_dev, Rk_pad, n_reals,
                PAD=PAD, n_anti=spec.n_anti, transpose=spec.pk == 1,
            )
            sync_point(R_dev, f"batch fold pk={spec.pk}")
        return R_dev

    def _stack_sweep_arrays(self):
        from ..chain.plan import config_digest

        memo_key = (
            config_digest(self.config),
            self.refs.tobytes(),
            self.qrys.tobytes(),
        )
        if memo_key in _BATCH_ARRAYS_MEMO:
            return _BATCH_ARRAYS_MEMO[memo_key]
        out = self._stack_sweep_arrays_uncached()
        _memo_put(_BATCH_ARRAYS_MEMO, memo_key, out)
        return out

    def _stack_sweep_arrays_uncached(self):
        out = {}
        for key in ("p", "l", "r"):
            name = {"p": "primary", "l": "left", "r": "right"}[key]
            out[key] = tuple(
                jnp.stack([jnp.asarray(s._rows[name][j]) for s in self.sweeps])
                for j in range(3)
            )
        out["ins"] = {
            name: tuple(
                jnp.stack([jnp.asarray(s._ins[name][j]) for s in self.sweeps])
                for j in range(2)
            )
            for name in ("primary", "left", "right")
        }
        return out

    def align(self, mesh=None) -> List[JaxEngineResult]:
        """Per-pair engine results (exact optimum each), batch-lockstep.

        Single-device batches run the FUSED rounds loop by default — the
        whole lockstep iteration as one `lax.while_loop` dispatch
        (parallel/fused_rounds.py; the remote-relay RPC per dispatch
        dominated the warm batched wall, BENCH_r04).  The host loop below
        remains the executable spec, the mesh/SPMD path, and the fallback
        (TSALIGN_NO_FUSED=1 forces it).
        """
        import os

        if mesh is None and not os.environ.get("TSALIGN_NO_FUSED"):
            # Default ON off-CPU.  XLA:CPU takes minutes to compile the
            # fused program at wide-window configs (measured ~4 min for the
            # sample config's 128 bucket), so CPU runs opt in explicitly
            # (TSALIGN_FUSED=1; tests/test_fused_rounds.py).
            if (
                os.environ.get("TSALIGN_FUSED") == "1"
                or jax.default_backend() != "cpu"
            ):
                results = self._align_fused()
                if results is not None:
                    return results
        return self._align_host(mesh)

    def _align_fused(self) -> Optional[List[JaxEngineResult]]:
        from .fused_rounds import _fused_loop, build_meta_and_data

        B = self.n_pairs
        keep = bool(self.keep_fields)
        F = self.config.left_flank_length + self.config.right_flank_length + 1
        arrays_b = self._stack_sweep_arrays()
        # Root-seed tensor memo: ~13 MB of host build + relay upload per
        # align() otherwise (pure function of shape + flank + origins).
        root_key = (
            B, F, self.nr, self.nq, self.config.right_flank_length,
            tuple((rg.reference_offset, rg.query_offset) for rg in self.ranges),
        )
        root_dev = _BATCH_ROOT_MEMO.get(root_key)
        if root_dev is None:
            seeds0 = np.full(
                (B, F, 3, self.nr + 1, self.nq + 1), INF, np.int64
            )
            for i in range(B):
                rg = self.ranges[i]
                seeds0[
                    i, self.config.right_flank_length, GAP_NONE,
                    rg.reference_offset, rg.query_offset,
                ] = 0
            root_dev = jnp.asarray(np.asarray(to_device_costs(seeds0)))
            _memo_put(_BATCH_ROOT_MEMO, root_key, root_dev)
        lr_idx = jnp.asarray([r for r, _ in self.limits], jnp.int32)
        lq_idx = jnp.asarray([q for _, q in self.limits], jnp.int32)
        M0_dev = sync_point(
            _sweep_batch_jit(
                root_dev, arrays_b,
                L=self.config.left_flank_length,
                R=self.config.right_flank_length,
                climb=True,
            ),
            "fused round-0 sweep",
        )
        E0_dev, tv_b = _summ_batch_jit(M0_dev, lr_idx, lq_idx)
        tv = np.asarray(tv_b)
        best0 = [
            INF if int(t.min()) >= int(DEV_INF) // 2 else int(t.min())
            for t in tv
        ]
        results = [JaxEngineResult(cost=INF, rounds=1) for _ in range(B)]

        # Host fast path: every pair already provably done at round 1 (the
        # k*delta bound or the TSLB improvement stop) — exact-match pairs
        # and trivial segments skip kind/bound construction entirely.
        delta = min_tsm_cost_bound(self.config)
        E0_host = None
        if all(b < INF for b in best0):
            E0_host = np.asarray(E0_dev)
            all_done1 = all(
                (delta > 0 and delta > best0[i])
                or not self._can_improve_pair(i, E0_host[i], best0[i])
                for i in range(B)
            )
            if all_done1:
                for i in range(B):
                    results[i].cost = best0[i]
                self._keep_fused_fields(
                    results, M0_dev, None, None, E0_dev,
                    np.ones(B, np.int32), np.zeros(B, np.int32),
                )
                return results

        if self.kind_sets is None:
            logger.debug("batch fused: build_kind_sets")
            self._build_kind_sets(self._derive_budget(best0))
        # Retry chain: Pallas sweep on (flankless, in-VMEM shapes) -> XLA
        # sweep -> XLA sweep with every Pallas module kind downgraded.  A
        # Mosaic compile rejection is a clean exception; runtime faults
        # never reach here.
        sweep_tile = 0
        use_psweep = F == 1 and self.sweeps[0]._pallas_ok()
        if not use_psweep and F == 1:
            sweep_tile = self.sweeps[0]._pallas_tile()
            use_psweep = sweep_tile > 0
        out = None
        last_err = None
        for attempt in ("psweep", "xla", "no_pallas_kinds"):
            if attempt == "psweep" and not use_psweep:
                continue
            if attempt == "no_pallas_kinds":
                from ..jax_engine import _module_pallas_fallback

                pallas_kinds = [
                    km0 for km0, *_ in self._kind_state
                    if km0._static.use_pallas
                ]
                if not pallas_kinds:
                    break
                for km0 in pallas_kinds:
                    _module_pallas_fallback(km0, last_err)
            meta, data = build_meta_and_data(
                self, arrays_b, root_dev, M0_dev, E0_dev, best0, keep,
                pallas_sweep=attempt == "psweep",
                sweep_tile=sweep_tile if attempt == "psweep" else 0,
            )
            try:
                out = _fused_loop(data, meta=meta)
                break
            except Exception as e:
                last_err = e
                logger.warning(
                    "fused rounds loop failed (attempt %s; %s: %s)",
                    attempt, type(e).__name__, str(e)[:300],
                )
        if out is None:
            logger.warning("fused loop exhausted retries; host loop")
            return None
        sync_point(out["best"], "fused rounds loop")
        done = np.asarray(out["done"])
        if not done.all():
            raise RuntimeError(
                f"BatchedTSAligner: not all pairs converged within "
                f"max_rounds={self.max_rounds}"
            )
        best = np.asarray(out["best"])
        rounds = np.asarray(out["rounds"])
        for i in range(B):
            results[i].cost = (
                INF if int(best[i]) >= int(DEV_INF) // 2 else int(best[i])
            )
            results[i].rounds = int(rounds[i])
        if keep:
            self._keep_fused_fields(
                results, out["M_all"], out["R_all"], out["E_all"], None,
                np.asarray(out["np_cnt"]), np.asarray(out["nr_cnt"]),
            )
        return results

    def _keep_fused_fields(self, results, M_all, R_all, E_all, E0_dev,
                           np_cnt, nr_cnt):
        """Reconstruct per-pair field lists from the fused loop's stacked
        round buffers (liveness is a prefix — done is monotone — so pair
        i's fields are exactly the first np_cnt[i]/nr_cnt[i] slots)."""
        import os

        if not self.keep_fields:
            return
        B = self.n_pairs
        # Single-pair records: materialize the whole round buffers in ONE
        # bulk transfer and hand the traceback plain numpy — each lazy
        # tile fetch is a relay RPC, and the buffers at single-pair shapes
        # are small enough (~100 MB) that one transfer beats any number of
        # per-tile round trips.
        if (
            self.keep_fields == "device"
            and B == 1
            and R_all is not None
            and M_all.size * 4 <= int(
                os.environ.get("TSALIGN_FIELD_XFER_MB", "256")
            ) * 2**20
        ):
            self.keep_fields = True
            try:
                self._keep_fused_fields(
                    results, M_all, R_all, E_all, E0_dev, np_cnt, nr_cnt
                )
            finally:
                self.keep_fields = "device"
            return
        if self.keep_fields is True:
            M_host = np.asarray(M_all)
            R_host = np.asarray(R_all) if R_all is not None else None
            for i in range(B):
                for r in range(int(np_cnt[i])):
                    fld = M_host[r, i] if M_host.ndim == 6 else M_host[i]
                    results[i].primary_fields.append(from_device_costs(fld))
                for r in range(int(nr_cnt[i])):
                    results[i].reentry_fields.append(
                        from_device_costs(R_host[r, i])
                    )
            return
        from ..device_fields import (
            DeviceField2,
            DeviceField4,
            _FusedEntryLayer,
        )

        for i in range(B):
            for r in range(int(np_cnt[i])):
                if E_all is not None:
                    entry = _FusedEntryLayer(E_all, r, i)
                else:
                    entry = from_device_costs(np.asarray(E0_dev[i]))
                if M_all.ndim == 6:
                    results[i].primary_fields.append(
                        DeviceField4(M_all, entry_cells=entry, rb=(r, i))
                    )
                else:
                    results[i].primary_fields.append(
                        DeviceField4(M_all, entry_cells=entry, batch_index=i)
                    )
            for r in range(int(nr_cnt[i])):
                results[i].reentry_fields.append(
                    DeviceField2(R_all, rb=(r, i))
                )

    def _align_host(self, mesh=None) -> List[JaxEngineResult]:
        B = self.n_pairs
        shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def shard(x):
                spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

        F = self.config.left_flank_length + self.config.right_flank_length + 1

        arrays_b = self._stack_sweep_arrays()
        if shard is not None:
            arrays_b = jax.tree_util.tree_map(shard, arrays_b)
        def sweep_v(seeds, arrays):
            return _sweep_batch_jit(
                seeds,
                arrays,
                L=self.config.left_flank_length,
                R=self.config.right_flank_length,
                climb=True,
            )

        seeds0 = np.full((B, F, 3, self.nr + 1, self.nq + 1), INF, dtype=np.int64)
        for i in range(B):
            rg = self.ranges[i]
            seeds0[
                i, self.config.right_flank_length, GAP_NONE,
                rg.reference_offset, rg.query_offset,
            ] = 0
        seeds0_dev = np.asarray(to_device_costs(seeds0))
        seeds = jnp.asarray(seeds0_dev)
        if shard is not None:
            seeds = shard(seeds)

        lr_idx = jnp.asarray([r for r, _ in self.limits], jnp.int32)
        lq_idx = jnp.asarray([q for _, q in self.limits], jnp.int32)

        def summarize(M_dev):
            """(entry layers (B, nr+1, nq+1) host, per-pair target costs)."""
            E_b, tv_b = _summ_batch_jit(M_dev, lr_idx, lq_idx)
            tv = np.asarray(tv_b)
            costs = [
                INF if int(t.min()) >= int(DEV_INF) // 2 else int(t.min())
                for t in tv
            ]
            return np.asarray(E_b), costs

        logger.debug("batch phase: initial sweep (B=%d nr=%d nq=%d)", B, self.nr, self.nq)
        M_dev = sync_point(sweep_v(seeds, arrays_b), "batch sweep round 0")
        E_host, best = summarize(M_dev)
        logger.debug("batch phase: initial sweep done")
        results = [JaxEngineResult(cost=INF, rounds=1) for _ in range(B)]

        def keep_primary(M_dev_round, E_round, live=None):
            """Append this round's primary field per live pair: host copies
            (keep_fields=True) or lazy device tile views ("device" mode,
            device_fields.py — no full stacked-field transfer)."""
            if self.keep_fields is True:
                M_host = np.asarray(M_dev_round)
                for i in range(B):
                    if live is None or live[i]:
                        results[i].primary_fields.append(
                            from_device_costs(M_host[i])
                        )
            elif self.keep_fields == "device":
                from ..device_fields import DeviceField4

                for i in range(B):
                    if live is None or live[i]:
                        results[i].primary_fields.append(
                            DeviceField4(
                                M_dev_round,
                                entry_cells=from_device_costs(E_round[i]),
                                batch_index=i,
                            )
                        )

        def keep_reentry(R_dev_round, live):
            if self.keep_fields is True:
                R_host = np.asarray(R_dev_round)
                for i in range(B):
                    if live[i]:
                        results[i].reentry_fields.append(
                            from_device_costs(R_host[i])
                        )
            elif self.keep_fields == "device":
                from ..device_fields import DeviceField2

                for i in range(B):
                    if live[i]:
                        results[i].reentry_fields.append(
                            DeviceField2(R_dev_round, batch_index=i)
                        )

        if self.keep_fields:
            keep_primary(M_dev, E_host)
        delta = min_tsm_cost_bound(self.config)
        root_dev = seeds

        done = [False] * B
        A_cur: List[Optional[np.ndarray]] = [None] * B
        # Delta-incremental reentry (see jax_engine.align): the reentry
        # field is a device-resident running min of per-launch
        # contributions, and a cell is relaunched only when its entry value
        # improved since its last launch — confirmation rounds launch
        # (almost) nothing.  Exactness argument as in the single-pair loop.
        A_launched: List[Optional[np.ndarray]] = [None] * B
        R_acc = None
        for k in range(1, self.max_rounds + 1):
            for i in range(B):
                if done[i]:
                    continue
                # Exact early stop: a further improvement needs a path with
                # k template switches, costing at least k * delta.
                if delta > 0 and k * delta > best[i]:
                    done[i], results[i].rounds = True, k
                # TSLB improvement stop.
                elif not self._can_improve_pair(i, E_host[i], best[i]):
                    done[i], results[i].rounds = True, k
            if all(done):
                break
            if self.kind_sets is None:
                logger.debug("batch phase: build_kind_sets (round %d)", k)
                self._build_kind_sets(self._derive_budget(best))
            for i in range(B):
                if A_cur[i] is None:
                    if done[i]:
                        # Converged before any reentry (k*delta bound or
                        # TSLB improvement stop in this same round): its one
                        # and only delta launch must be inert, not a full
                        # pruned-entry launch for a pair already proven done.
                        A_cur[i] = np.full(
                            (self.nr + 1, self.nq + 1), DEV_INF, np.int32
                        )
                    else:
                        A_cur[i] = self._pruned_entry_pair(
                            i, E_host[i], best[i]
                        )
            A_delta = []
            for i in range(B):
                a = A_cur[i]
                if A_launched[i] is None:
                    A_delta.append(a)
                    A_launched[i] = a
                else:
                    A_delta.append(
                        np.where(a < A_launched[i], a, np.int32(DEV_INF))
                    )
                    A_launched[i] = np.minimum(A_launched[i], a)
            A_stack = np.stack(A_delta)
            logger.debug("batch phase: reentry (round %d)", k)
            R_new = self._reentry_batch(A_stack, shard)
            if R_acc is None:
                R_acc, unchanged = R_new, False
            else:
                R_acc, eq = _acc_batch_jit(R_acc, R_new)
                unchanged = bool(eq)
            logger.debug("batch phase: reentry done (round %d)", k)
            if self.keep_fields:
                keep_reentry(R_acc, [not d for d in done])
            # Exact no-sweep stop: this round's launches left the reentry
            # accumulator unchanged, so seeds, sweeps and pruned entry
            # fields would all repeat — a fixpoint for every live pair.
            if unchanged:
                for i in range(B):
                    if not done[i]:
                        done[i], results[i].rounds = True, k + 1
                break
            sk_dev = sync_point(
                _seeds_batch_jit(root_dev, R_acc), f"batch seeds round {k}"
            )
            logger.debug("batch phase: re-sweep (round %d)", k)
            M_next_dev = sync_point(
                sweep_v(sk_dev, arrays_b), f"batch sweep round {k}"
            )
            E_next, t_costs = summarize(M_next_dev)
            new_best = [min(a, b) for a, b in zip(best, t_costs)]
            if self.keep_fields:
                keep_primary(M_next_dev, E_next, live=[not d for d in done])
            # Pruned-entry fixpoint per pair (jax_engine semantics): once
            # the pruned field is stable, reentries/seeds/sweeps repeat.
            for i in range(B):
                if done[i]:
                    continue
                A_next_i = self._pruned_entry_pair(i, E_next[i], new_best[i])
                A_i = A_cur[i]
                if new_best[i] < best[i]:
                    A_i = self._pruned_entry_pair(i, E_host[i], new_best[i])
                if np.array_equal(A_next_i, A_i):
                    done[i], results[i].rounds = True, k + 1
                    A_cur[i] = A_next_i
                else:
                    A_cur[i] = A_next_i
            best = new_best
            E_host = E_next
        else:
            raise RuntimeError(
                f"BatchedTSAligner: not all pairs converged within "
                f"max_rounds={self.max_rounds}"
            )
        for i in range(B):
            results[i].cost = best[i]
        return results

    def costs(self, mesh=None) -> np.ndarray:
        """Optimal TS alignment cost per pair (int64, INF when unreachable)."""
        return np.asarray(
            [r.cost for r in self.align(mesh=mesh)], dtype=np.int64
        )

    def align_with_traceback(self, mesh=None):
        """[(cost, Alignment)] per pair: batched rounds on device, host
        traceback per pair over the kept fields (traceback.py)."""
        from ..alignment import Alignment
        from ..traceback import TracebackEngine

        if not self.keep_fields:
            # Lazy device tile views by default: the stacked per-round
            # fields stay in HBM and each pair's traceback fetches only the
            # tiles its path touches (device_fields.py).
            self.keep_fields = "device"
        results = self.align(mesh=mesh)
        self.last_results = results  # per-pair rounds (K-soundness guard)
        out = []
        for i, res in enumerate(results):
            if res.cost >= INF:
                out.append((INF, Alignment([])))
                continue
            tb = TracebackEngine(
                self.config,
                self.refs[i],
                self.qrys[i],
                range_=self.ranges[i],
                prune_range=False,
                sdel_budget=self.sdel_budget,
            )
            out.append(
                tb.trace(
                    res.primary_fields,
                    res.reentry_fields,
                    climb_flags=[True] * len(res.primary_fields),
                )
            )
        return out

def align_pairs(
    config: TemplateSwitchConfig,
    pairs: Sequence[Tuple[str, str]],
    names: Optional[Sequence[Tuple[str, str]]] = None,
    maximise_total_length: bool = True,
    chunk: int = 64,
    mesh=None,
):
    """Full batched record pipeline: align many (reference, query) string
    pairs in one batch and return a list of AlignmentResult records (the
    same post-processing as Aligner.align: K-scaled total-length tie-break,
    extension, equal-cost ranges, reference-schema TOML).

    Falls back to the exact single-pair path per pair when the K-scaled
    algebra would overflow the device int32 domain.
    """
    import time as _time

    from ..aligner import Aligner
    from ..postprocess import compute_ts_equal_cost_ranges
    from ..result import AlignmentResult, AStarResultInfo

    al = config.alphabet
    enc = [(al.encode(r.upper()), al.encode(q.upper())) for r, q in pairs]
    # Multi-bucket grouping: pairs bucket to the power-of-two of their own
    # lengths, so short pairs don't pay the longest pair's padded grid
    # (poison-padding soundness makes every bucket exact).  Each group runs
    # the lockstep batch below; records are reassembled in input order.
    groups: dict = {}
    for i, (r, q) in enumerate(enc):
        groups.setdefault((_bucket(len(r)), _bucket(len(q))), []).append(i)
    # Sub-batch cap: the fused loop's keep-fields buffers scale with
    # (max_rounds+1) * B * bucket^2 in HBM, so large groups split into
    # batches of <= 8 (at the 1024 bucket, 8 pairs * 33 round slots of
    # primary+reentry+entry fields ~ 5 GB of the 16 GB chip).
    only_key = next(iter(groups))
    if len(groups) > 1 or len(groups[only_key]) > 8:
        records = [None] * len(pairs)
        for _key, idxs in sorted(groups.items()):
            for c0 in range(0, len(idxs), 8):
                part = idxs[c0 : c0 + 8]
                sub = align_pairs(
                    config,
                    [pairs[i] for i in part],
                    names=[names[i] for i in part] if names else None,
                    maximise_total_length=maximise_total_length,
                    chunk=chunk,
                    mesh=mesh,
                )
                for i, rec in zip(part, sub):
                    records[i] = rec
        return records
    # K-soundness (aligner._run_engine): the scaled decomposition is exact
    # only while total TS length < K; a rewinding config with zero-cost TSMs
    # makes the maximise objective unbounded, so drop the tie-break there.
    if (
        maximise_total_length
        and config.can_rewind()
        and min_tsm_cost_bound(config) <= 0
    ):
        maximise_total_length = False
    K = 1
    cfg_run = config
    if maximise_total_length:
        nr = _bucket(max(len(r) for r, _ in enc))
        nq = _bucket(max(len(q) for _, q in enc))
        while K < nr + nq + 2:
            K *= 2
        cfg_run = config.scaled_for_length_tiebreak(K)

    t0 = _time.monotonic()
    try:
        bt = BatchedTSAligner(cfg_run, enc, chunk=chunk, keep_fields="device")
        traced = bt.align_with_traceback(mesh=mesh)
    except OverflowError:
        # Scaled magnitudes exceed the int32 device domain: single-pair
        # exact fallback (numpy int64 algebra).
        a = Aligner(costs=config)
        out = []
        for i, (r, q) in enumerate(pairs):
            nm = names[i] if names else ("reference", "query")
            out.append(a.align(r, q, nm[0], nm[1]).result)
        return out

    duration = _time.monotonic() - t0
    # Post-hoc K check per pair (aligner._run_engine semantics): with
    # rewinding reentries total TS length is only bounded by
    # (rounds-1) * l_max; pairs where that bound reaches K re-run through
    # the single-pair guarded path (which escalates K exactly).
    rewind = config.can_rewind()
    lw = config.length_costs.maximum_finite_input()
    redo: List[int] = []
    if K > 1 and rewind:
        for i, (comp, _aln) in enumerate(traced):
            if comp >= INF:
                continue
            lr, lq = len(enc[i][0]), len(enc[i][1])
            l_max_eff = min(int(lw) if lw is not None else max(lr, lq, 1),
                            max(lr, lq, 1))
            rounds = bt.last_results[i].rounds
            if max(0, rounds - 1) * l_max_eff >= K:
                redo.append(i)
    if redo:
        a = Aligner(costs=config)
        for i in redo:
            nm = names[i] if names else ("reference", "query")
            comp_i, aln_i = a._run_engine(
                enc[i][0], enc[i][1],
                AlignmentRange.complete(len(enc[i][0]), len(enc[i][1])),
                None, None, False,
            )
            traced[i] = (comp_i * K if comp_i < INF else INF, aln_i)
    records = []
    for i, (comp, alignment) in enumerate(traced):
        r_str, q_str = pairs[i][0].upper(), pairs[i][1].upper()
        ref_arr, qry_arr = enc[i]
        nm = names[i] if names else ("reference", "query")
        rng = AlignmentRange.complete(len(ref_arr), len(qry_arr))
        if comp >= INF:
            cost = INF
            alignment = None
            result = AStarResultInfo(type="NoTarget")
        else:
            cost = -(-comp // K)
            compute_ts_equal_cost_ranges(alignment, config, ref_arr, qry_arr, rng)
            result = AStarResultInfo(type="FoundTarget", cost=cost)
        cells = (len(ref_arr) + 1) * (len(qry_arr) + 1)
        records.append(
            AlignmentResult.new(
                alignment=alignment,
                reference=r_str,
                query=q_str,
                reference_rc=al.reverse_complement_str(r_str),
                query_rc=al.reverse_complement_str(q_str),
                reference_name=nm[0],
                query_name=nm[1],
                reference_offset=0,
                query_offset=0,
                result=result,
                duration_seconds=duration / max(len(pairs), 1),
                opened_nodes=cells,
                closed_nodes=cells,
                suboptimal_opened_nodes=0,
            )
        )
    return records
