"""JAX/TPU dense template-switch alignment engine.

Device counterpart of engine.py (the numpy executable spec, which carries
the reference citations: lib_tsalign/src/a_star_aligner/template_switch_distance/context.rs
and strategies/*): the same
iterated structure — flank-layered primary sweeps (ops/jax_primary.py) and
per-kind TSM module/assembly pipelines (ops/jax_modules.py) — jitted with
static shapes in the int32 saturating (min,+) algebra.

The rounds loop runs on the host (a handful of iterations); everything per
round is device code.  Shapes depend only on (sequence lengths, config
windows, deletion-drift budget bucket), so recompiles are bounded.
"""

from __future__ import annotations

import os

# Persistent compilation cache: the big scan kernels are expensive to
# compile (notably via remote-compile TPU setups); cache across processes.
# The directory is fingerprinted by the host CPU's feature flags: XLA:CPU
# AOT artifacts embed the compile machine's ISA features and loading them
# on a host without those features SIGILL/segfaults ("Machine type used
# for XLA:CPU compilation doesn't match the machine type for execution"),
# which we hit when the environment migrates across heterogeneous hosts.


def _cache_dir() -> str:
    import hashlib

    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        flags = ""
    h = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/tsalign_tpu_jax_cache_{h}"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import logging
import time

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TemplateSwitchConfig
from .costs import INF
from .geometry import AlignmentRange
from .ops.jax_primary import JaxPrimarySweep
from .ops.jax_modules import JaxKindModule, _kind_all_chunks, _same_module_jit
from .ops.jaxcommon import (
    DEV_INF,
    from_device_costs,
    sync_point,
    to_device_costs,
    validate_magnitudes,
)
from .ops.primary_sweep import GAP_NONE
from .ops.tsm_modules import make_kind_spec

from functools import partial


@partial(jax.jit, static_argnames=("rl", "ql"))
def _summ_jit(M_dev, *, rl, ql):
    """Round-loop sweep summary: entry layer + target-cell values (the only
    pieces the cost-only loop consumes; keeps the full field off the relay)."""
    return jnp.min(M_dev[-1], axis=0), M_dev[:, :, rl, ql].reshape(-1)


@jax.jit
def _acc_jit(R_acc, R_new):
    """Fold a round's reentry contributions into the device accumulator and
    report whether anything improved (the exact no-sweep stop signal)."""
    R2 = jnp.minimum(R_acc, R_new)
    return R2, jnp.all(R2 == R_acc)


@jax.jit
def _seeds_jit(root_dev, R_dev):
    """Next-round sweep seeds on device: the root seeds min the reentry
    field placed at (flank 0, GAP_NONE) — keeps the (F, 3, n, n) seed field
    off the relay."""
    return root_dev.at[0, GAP_NONE].min(R_dev)
from .engine import min_tsm_cost_bound


logger = logging.getLogger("tsalign_tpu")

# Content-keyed memos for the remaining-cost bound and the kind modules
# (see _remaining_bound / _build_kinds).
_LB_MEMO: dict = {}
_KINDS_MEMO: dict = {}


def _module_pallas_fallback(km, err: Exception) -> None:
    """A kind dispatch failed while its statics request the Pallas module
    kernel: downgrade that kind to the XLA scan path and let the caller
    retry once.  Re-raises when Pallas was not in play (a genuine error)."""
    if not km._static.use_pallas:
        raise err
    logger.warning(
        "Pallas module kernel compile failed for kind pk=%d sk=%d dk=%d "
        "(%s: %s); retrying on the XLA scan path",
        km.spec.pk,
        km.spec.sk,
        km.spec.dk,
        type(err).__name__,
        str(err)[:500],
    )
    km._static = km._static._replace(use_pallas=False)


@dataclass
class JaxEngineResult:
    cost: int
    rounds: int
    primary_fields: List[np.ndarray] = field(default_factory=list)
    reentry_fields: List[np.ndarray] = field(default_factory=list)


class JaxAligner:
    """Drop-in device analog of engine.DenseAligner (cost computation)."""

    def __init__(
        self,
        config: TemplateSwitchConfig,
        reference: np.ndarray,
        query: np.ndarray,
        range_: Optional[AlignmentRange] = None,
        max_template_switches: Optional[int] = None,
        prune_range: bool = False,
        allow_secondary_deletions: bool = True,
        max_rounds: int = 32,
        chunk: int = 64,
        keep_fields: bool = True,
        allowed_primaries=(0, 1),
        use_lower_bounds: bool = True,
    ):
        self.use_lower_bounds = use_lower_bounds
        self.config = config
        self.allowed_primaries = tuple(allowed_primaries)
        self.ref = np.asarray(reference)
        self.qry = np.asarray(query)
        n_r, n_q = len(self.ref), len(self.qry)
        self.n_r, self.n_q = n_r, n_q
        # Real content lengths of possibly poison-padded inputs (bucketed
        # batch/chain problems): every STRUCTURAL feasibility (seed walk
        # bounds, strict reentry, exit anti-gap walk) derives from these;
        # padded lengths only drive shapes (shared compiled programs).
        from .ops.tsm_modules import real_seq_length

        self.n_r_real = real_seq_length(self.ref, config.alphabet.size)
        self.n_q_real = real_seq_length(self.qry, config.alphabet.size)
        self._padded = self.n_r_real != n_r or self.n_q_real != n_q
        self.range = range_ or AlignmentRange.complete(n_r, n_q)
        self.max_ts = max_template_switches
        self.prune_range = prune_range
        self.allow_sdel = allow_secondary_deletions
        self.max_rounds = max_rounds
        self.chunk = chunk
        self.keep_fields = keep_fields

        self._validate()

        if prune_range:
            self._sweep_range = self.range
            self.anti_bounds_ref = (self.range.reference_offset, self.range.reference_limit)
            self.anti_bounds_qry = (self.range.query_offset, self.range.query_limit)
        else:
            self._sweep_range = AlignmentRange.complete(n_r, n_q)
            self.anti_bounds_ref = (0, n_r)
            self.anti_bounds_qry = (0, n_q)

        self._sweeps = {}

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
        mx = max(mx, max(v for v in cfg.base_cost.values() if v < INF) if any(
            v < INF for v in cfg.base_cost.values()
        ) else 0)
        validate_magnitudes(mx, 2 * (self.n_r + self.n_q + 2))

    def _get_sweep(self, climb: bool) -> JaxPrimarySweep:
        if climb not in self._sweeps:
            self._sweeps[climb] = JaxPrimarySweep(
                self.config,
                self.ref,
                self.qry,
                range_=self._sweep_range,
                allow_flank_climb=climb,
            )
        return self._sweeps[climb]

    def _root_seeds_host(self) -> np.ndarray:
        cfg = self.config
        F = cfg.left_flank_length + cfg.right_flank_length + 1
        seeds = np.full((F, 3, self.n_r + 1, self.n_q + 1), INF, dtype=np.int64)
        seeds[
            cfg.right_flank_length,
            GAP_NONE,
            self.range.reference_offset,
            self.range.query_offset,
        ] = 0
        return seeds

    def _remaining_bound(self):
        """Admissible remaining-cost field (TSLB counterpart, host numpy;
        ref lower_bounds/template_switch.rs:75-284), or None when the
        relaxed value iteration does not apply.  Memoized across engine
        instances by content key — the field is a pure function of
        (config, sequences, target limits), and repeated runs on the same
        pair (benchmarks, retries) would otherwise pay the ~0.5-1 s
        value iteration every time."""
        if not self.use_lower_bounds:
            return None  # skip the value iteration (see engine.DenseAligner)
        if not hasattr(self, "_lb_cache"):
            from .chain.plan import config_digest
            from .lower_bounds import compute_remaining_bound

            key = (
                config_digest(self.config),
                self.ref.tobytes(),
                self.qry.tobytes(),
                self.range.reference_limit,
                self.range.query_limit,
            )
            if key in _LB_MEMO:
                hit = _LB_MEMO[key]
            else:
                hit = compute_remaining_bound(
                    self.config,
                    self.ref,
                    self.qry,
                    self.range.reference_limit,
                    self.range.query_limit,
                )
                _LB_MEMO.clear()  # keep at most one entry (fields are ~MBs)
                _LB_MEMO[key] = hit
            self._lb_cache = hit
        return self._lb_cache

    def _axes_can_rewind(self) -> tuple:
        """(ref_can_decrease, qry_can_decrease): a primary coordinate only
        ever decreases via a TSM on the *other* primary whose anti-gap is
        negative (reentry behind the entry on the anti axis).  Conservative:
        any active kind with a finite negative anti-gap window counts."""
        neg_ag = any(
            fn.finite_window() is not None and fn.finite_window()[0] < 0
            for fn in (
                self.config.forward_anti_primary_gap_costs,
                self.config.reverse_anti_primary_gap_costs,
            )
        )
        return (
            neg_ag and 1 in self.allowed_primaries,  # query-primary TSM moves i
            neg_ag and 0 in self.allowed_primaries,  # reference-primary TSM moves j
        )

    def _pruned_entry(self, M_host: np.ndarray, best: int) -> np.ndarray:
        return self._pruned_entry_cells(
            M_host[-1].min(axis=0).astype(np.int32), best
        )

    def _pruned_entry_cells(self, entry_cells: np.ndarray, best: int) -> np.ndarray:
        """Entry field with every cell that cannot start a TSM on an optimal
        or co-optimal path masked to DEV_INF.  This is exactly the field
        `_reentry` consumes, so reentry/seed/sweep outputs are a fixpoint as
        soon as two consecutive rounds agree on it.

        Soundness: beyond-limit cells are NOT unconditionally masked — under
        NoPrune a path may overshoot a target limit and template-switch back
        inside via a negative anti-gap, so the hard slice mask applies only
        when no active kind can rewind that axis.  The lower-bound mask
        (S == INF, and A + S > best once an incumbent exists) covers the
        rewind case exactly: S is the one-TSM start-here-and-finish bound of
        the full-grid relaxed fixpoint, so S == INF proves no TSM started
        here can ever reach the target."""
        A_cells = entry_cells.astype(np.int32).copy()
        ref_rewind, qry_rewind = self._axes_can_rewind()
        if not ref_rewind:
            A_cells[self.range.reference_limit + 1 :, :] = int(DEV_INF)
        if not qry_rewind:
            A_cells[:, self.range.query_limit + 1 :] = int(DEV_INF)
        lb = self._remaining_bound()
        if lb is not None:
            A64 = A_cells.astype(np.int64)
            useful = (A64 < int(DEV_INF) // 2) & (lb.S < INF)
            if best < INF:
                useful &= A64 + lb.S <= best
            return np.where(useful, A_cells, np.int32(DEV_INF))
        if best >= INF:
            return A_cells
        # Fallback: global one-TSM delta threshold.
        thresh = self._entry_threshold(best)
        return np.where(
            A_cells.astype(np.int64) > thresh, np.int32(DEV_INF), A_cells
        )

    def _can_improve(self, M_host: np.ndarray, best: int) -> bool:
        return self._can_improve_cells(M_host[-1].min(axis=0), best)

    def _can_improve_cells(self, entry_cells: np.ndarray, best: int) -> bool:
        """TSLB improvement test (see engine.DenseAligner._can_improve):
        False once no entry cell can start a further TSM and still strictly
        beat the incumbent."""
        lb = self._remaining_bound()
        if lb is None or best >= INF:
            return True
        A64 = entry_cells.astype(np.int64)
        mask = (A64 < int(DEV_INF) // 2) & (lb.S < INF)
        return bool(np.any(mask & (A64 + lb.S < best)))

    def _entry_threshold(self, best: int) -> int:
        """Exact keep-threshold for TSM entry cells: a path entering a TSM
        at a cell of value v has total >= v + delta - slack_other, where
        delta lower-bounds one TSM's (comp) cost and slack bounds the total
        tie-break discount, so cells above best + slack - max(delta, 0)
        cannot lie on any optimal or co-optimal path."""
        slack = self.config.secondary_length_bonus * (self.n_r + self.n_q)
        delta = max(0, min_tsm_cost_bound(self.config))
        return best + slack - delta

    def _target_cost(self, M_host: np.ndarray) -> int:
        v = int(M_host[:, :, self.range.reference_limit, self.range.query_limit].min())
        return INF if v >= int(DEV_INF) // 2 else v

    def _sdel_budget(self, upper_bound: int) -> Optional[int]:
        if upper_bound >= INF:
            return None
        cfg = self.config
        steps = []
        for d in ("Forward", "Reverse"):
            t = cfg.secondary_edit_costs(d)
            steps.append(min(t.min_gap_open_cost(), t.min_gap_extend_cost()))
        min_step = min(steps)
        if min_step <= 0:
            return None
        budget = upper_bound // min_step
        # Bucket to limit recompiles across inputs.
        b = 8
        while b < budget:
            b *= 2
        return b

    def _build_kinds(self, budget: Optional[int]) -> List[JaxKindModule]:
        """Per-kind device pipelines.  Memoized by content key across
        engine instances (same reasoning as _remaining_bound): the modules
        — host tables, device-resident _fixed tensors, entry-independent
        same-seq fields — are pure functions of (config, pair, bounds,
        budget, chunk), and rebuilding them dominates warm-run setup."""
        from .chain.plan import config_digest

        key = (
            config_digest(self.config),
            self.ref.tobytes(),
            self.qry.tobytes(),
            self.allowed_primaries,
            self.anti_bounds_ref,
            self.anti_bounds_qry,
            self.chunk,
            self.allow_sdel,
            budget,
        )
        if key in _KINDS_MEMO:
            return _KINDS_MEMO[key]
        kinds = self._build_kinds_uncached(budget)
        _KINDS_MEMO.clear()  # keep at most one entry (device tensors are ~MBs)
        _KINDS_MEMO[key] = kinds
        return kinds

    def _build_kinds_uncached(self, budget: Optional[int]) -> List[JaxKindModule]:
        kinds = []
        lut_cache = {}  # (sk, dk, window) LUTs shared across the pk variants
        for pk in self.allowed_primaries:
            anti_lo, anti_hi = (
                self.anti_bounds_qry if pk == 0 else self.anti_bounds_ref
            )
            for sk in (0, 1):
                for dk in (0, 1):
                    spec = make_kind_spec(
                        self.config, self.n_r, self.n_q, pk, sk, dk,
                        sdel_budget=budget,
                        n_ref_real=self.n_r_real if self._padded else None,
                        n_qry_real=self.n_q_real if self._padded else None,
                    )
                    if spec is None:
                        continue
                    km = JaxKindModule(
                        spec,
                        self.config,
                        self.ref,
                        self.qry,
                        anti_lo,
                        anti_hi,
                        chunk=self.chunk,
                        allow_secondary_deletions=self.allow_sdel,
                        lut_cache=lut_cache,
                    )
                    if km.active:
                        kinds.append(km)
        return kinds

    def _reentry(self, A_cells: np.ndarray, kinds: List[JaxKindModule], best: int = INF):
        """Pruned entry field (host, from `_pruned_entry_cells`) + all
        kind pipelines -> the folded reentry-cell field, returned as a
        DEVICE array (the caller accumulates, builds seeds and re-sweeps on
        device; nothing reentry-sized crosses the relay).

        Each kind runs as one jitted chunk-step with a *traced* chunk offset,
        so all chunks share a single compilation.  All glue (entry-field
        extraction, reentry folding, transposes) runs on the host: ad-hoc
        eager device ops each cost a separate (remote) compilation and the
        gather-style ones proved pathological.
        """
        # Per-chunk liveness bound: with the TSLB remaining bound, a chunk is
        # live iff some cell could start a TSM and still finish within best
        # (A + S <= best); without it, fall back to the global kind minimum.
        lb = self._remaining_bound() if best < INF else None
        AS = None
        if lb is not None and best < INF:
            A64 = A_cells.astype(np.int64)
            AS = np.where(
                (A64 < int(DEV_INF) // 2) & (lb.S < INF), A64 + lb.S, INF
            )
        # Work accounting (surfaced as opened_nodes: DP cells computed).
        self.cells_swept = getattr(self, "cells_swept", 0) + len(kinds) * (
            (self.n_r + 1) * (self.n_q + 1)
        )
        # Two phases: enqueue every kind's chunk scan first (dispatch is
        # async, so the device pipelines the 8 independent kind programs
        # back-to-back), then materialize and fold — a per-kind np.array()
        # inside the launch loop would sync after every kind and serialize
        # device work with host round-trips.
        launched = []
        # The entry field is one of only two tensors (A or A^T, possibly
        # column-padded); transfer each distinct (orientation, width) once
        # per round instead of once per kind.
        a_dev_cache = {}
        for km in kinds:
            spec = km.spec
            A_mod = A_cells if spec.pk == 0 else A_cells.T
            n_anti = spec.n_anti
            C = km.chunk
            n_e = n_anti + 1
            if n_e < C:
                A_mod = np.pad(
                    A_mod, ((0, 0), (0, C - n_e)), constant_values=int(DEV_INF)
                )
            fixed = km._fixed
            if spec.same_seq:
                # The intra-sequence module is independent of the entry
                # field, hence round-invariant: compute once per alignment.
                if getattr(km, "_b_pre_cache", None) is None:
                    km._b_pre_cache = _same_module_jit(fixed, st=km._static)
                B_pre = km._b_pre_cache
            else:
                B_pre = jnp.zeros((1, 1), jnp.int32)
            def get_a_dev():
                a_key = (spec.pk, A_mod.shape[1])
                dev = a_dev_cache.get(a_key)
                if dev is None:
                    dev = jnp.asarray(np.ascontiguousarray(A_mod))
                    a_dev_cache[a_key] = dev
                return dev

            # Compacted-column route: with the TSLB bound, gather only the
            # live entry columns (A + S <= best somewhere in the column)
            # into a dense power-of-two bucket — the chunked route below
            # processes whole 16..128-column blocks even when a handful of
            # columns is live (the usual case after round 1).
            if AS is not None:
                AS_mod = AS if spec.pk == 0 else AS.T
                col_live = AS_mod.min(axis=0) <= best
                e_live = np.nonzero(col_live)[0]
                if e_live.size == 0:
                    continue
                Kb = C
                while Kb < e_live.size:
                    Kb *= 2
                live_chunks = {
                    min(int(e) // C * C, max(n_e - C, 0)) for e in e_live
                }
                if Kb < len(live_chunks) * C:
                    t_kind = time.monotonic()
                    sel = self._launch_compact(
                        km, get_a_dev(), e_live, Kb, B_pre
                    )
                    sync_point(
                        sel,
                        f"kind pk={spec.pk} sk={spec.sk} dk={spec.dk} "
                        f"pallas={km._static.use_pallas} compact",
                    )
                    launched.append(("compact", km, sel, e_live, t_kind))
                    continue
                bases = []
                for e0 in range(0, n_e, C):
                    eb = min(e0, n_e - C) if n_e >= C else 0
                    bases.append(
                        np.int32(eb) if (e0 // C * C) in live_chunks
                        or eb in live_chunks
                        else np.int32(-1)
                    )
            else:
                # Fallback (no remaining bound): global thresholds.  Under
                # the total-length tie-break, secondary edges carry a -1
                # bonus; future TSMs can discount at most the total
                # secondary length, bounded by the sequence lengths.
                slack = self.config.secondary_length_bonus * (self.n_r + self.n_q)
                thresh = min(best + slack, int(DEV_INF))
                # per-kind TSM lower bound: at least the kind's base cost,
                # and at least the global one-TSM bound (both exact; see
                # _entry_threshold)
                kind_min = max(spec.base, max(0, min_tsm_cost_bound(self.config)))
                bases = []
                for e0 in range(0, n_e, C):
                    eb = min(e0, n_e - C) if n_e >= C else 0
                    a_min = (
                        int(A_mod[:, eb : eb + C].min()) if A_mod.size else int(DEV_INF)
                    )
                    bases.append(
                        np.int32(eb) if a_min + kind_min <= thresh else np.int32(-1)
                    )
            if all(b < 0 for b in bases):
                continue
            A_dev = get_a_dev()
            PAD = max(0, -km.s_lo)
            width = PAD + n_anti + 1 + max(0, C - 1 + km.s_hi)
            Rk_pad = jnp.full((spec.n_p + 1, width), DEV_INF, jnp.int32)
            e_bases = jnp.asarray(bases, jnp.int32)
            t_kind = time.monotonic()
            try:
                Rk_pad = _kind_all_chunks(
                    A_dev, Rk_pad, fixed, e_bases, B_pre, st=km._static, PAD=PAD
                )
            except Exception as e:
                # Mosaic compile rejection of the Pallas module kernel at an
                # unusual shape: retry on the XLA scan path (runtime faults
                # do not reach here — jit compiles synchronously at call).
                _module_pallas_fallback(km, e)
                Rk_pad = _kind_all_chunks(
                    A_dev, Rk_pad, fixed, e_bases, B_pre, st=km._static, PAD=PAD
                )
            sync_point(
                Rk_pad,
                f"kind pk={spec.pk} sk={spec.sk} dk={spec.dk} "
                f"pallas={km._static.use_pallas} chunked",
            )
            launched.append(("chunked", km, Rk_pad, (PAD, bases), t_kind))
        # Device-side fold: the per-kind (n_p+1, width) slabs stay on device
        # and min into one shared (n_r+1, n_q+1) accumulator that STAYS on
        # device — the caller accumulates, builds seeds and re-sweeps there,
        # so no reentry/seed field crosses the relay at all.
        from .ops.jax_modules import _fold_kind_cells
        R_dev = jnp.full((self.n_r + 1, self.n_q + 1), DEV_INF, jnp.int32)
        for mode, km, dev_out, extra, t_kind in launched:
            spec = km.spec
            PAD = max(0, -km.s_lo)
            R_dev = _fold_kind_cells(
                R_dev,
                dev_out,
                np.int32(spec.n_anti_real),
                PAD=PAD,
                n_anti=spec.n_anti,
                transpose=spec.pk == 1,
            )
            sync_point(R_dev, f"fold pk={spec.pk} sk={spec.sk} dk={spec.dk}")
            if logger.isEnabledFor(logging.DEBUG):
                desc = (
                    f"compact {len(extra)} cols"
                    if mode == "compact"
                    else f"{sum(1 for b in extra[1] if b >= 0)}/{len(extra[1])} chunks"
                )
                logger.debug(
                    "  kind pk=%d sk=%d dk=%d: %s enqueued %.3fs",
                    spec.pk, spec.sk, spec.dk, desc, time.monotonic() - t_kind,
                )
        return R_dev

    def _launch_compact(self, km, A_dev, e_live, Kb, B_pre):
        """Enqueue the compacted-column pipeline for one kind: gather the
        live entry columns and their per-e tables into a Kb bucket and
        dispatch _kind_sel_chunks (returns the un-materialized device
        field, already folded at the true j2 = e + s positions)."""
        from .ops.jax_modules import _kind_sel_chunks

        spec = km.spec
        e_sel = np.zeros(Kb, np.int32)  # sentinel 0: inert (see _kind_sel_chunks)
        e_sel[: e_live.size] = e_live.astype(np.int32)
        # Everything big stays resident on the device: the full entry field
        # (A_dev, cached across kinds per orientation) and the per-entry
        # tables (km._fixed, transferred once per alignment).  The jitted
        # pipeline gathers the live columns of both by e_sel; only the tiny
        # index vector crosses the relay per kind.
        PAD = max(0, -km.s_lo)
        OUTW = PAD + spec.n_anti + 1 + max(0, km.s_hi)
        try:
            return _kind_sel_chunks(
                A_dev,
                jnp.asarray(e_sel),
                km._fixed,
                B_pre,
                st=km._static._replace(separate_cols=True),
                PAD=PAD,
                OUTW=OUTW,
                gather=True,
            )
        except Exception as e:
            _module_pallas_fallback(km, e)
            return _kind_sel_chunks(
                A_dev,
                jnp.asarray(e_sel),
                km._fixed,
                B_pre,
                st=km._static._replace(separate_cols=True),
                PAD=PAD,
                OUTW=OUTW,
                gather=True,
            )

    def _fold_compact(self, km, dev_out, e_live) -> np.ndarray:
        """Materialize the device-folded field and cut the real j2 range."""
        spec = km.spec
        PAD = max(0, -km.s_lo)
        return np.array(dev_out)[:, PAD : PAD + spec.n_anti + 1]

    def _sweep_host(self, seeds_host: np.ndarray, climb: bool) -> np.ndarray:
        """Run the device sweep from host seeds, returning the host field."""
        M = self._get_sweep(climb).sweep(jnp.asarray(seeds_host))
        F = self.config.left_flank_length + self.config.right_flank_length + 1
        self.cells_swept = getattr(self, "cells_swept", 0) + F * 3 * (
            (self.n_r + 1) * (self.n_q + 1)
        )
        return np.asarray(M)

    def _sweep_summary(self, seeds_host: np.ndarray, climb: bool):
        """Run the device sweep and transfer only what the round loop needs:
        the entry layer (min over gap types of the top flank layer) and the
        target-cell values.  The full (F, 3, n, n) field crosses the relay
        only when keep_fields is True (host-materialized traceback); the
        "device" mode keeps the field resident and the traceback fetches
        tiles on demand (device_fields.py).

        Returns (entry_cells int32 (n_r+1, n_q+1), target_cost host int,
        M_host or None, M_dev)."""
        M_dev = sync_point(
            self._get_sweep(climb).sweep(jnp.asarray(seeds_host)), "sweep"
        )
        F = self.config.left_flank_length + self.config.right_flank_length + 1
        self.cells_swept = getattr(self, "cells_swept", 0) + F * 3 * (
            (self.n_r + 1) * (self.n_q + 1)
        )
        E, tv = _summ_jit(
            M_dev,
            rl=self.range.reference_limit,
            ql=self.range.query_limit,
        )
        M_host = np.asarray(M_dev) if self.keep_fields is True else None
        t = int(np.asarray(tv).min())
        return np.asarray(E), (INF if t >= int(DEV_INF) // 2 else t), M_host, M_dev

    def _fused_delegate(self) -> Optional[JaxEngineResult]:
        """Single-pair fused path: delegate to a B=1 BatchedTSAligner so
        the whole rounds loop runs as ONE lax.while_loop dispatch
        (parallel/fused_rounds.py) instead of ~10 relay RPCs per round.
        Applies only to the plain NoPrune full-feature case the batch
        engine models; anything else (max_ts, pruned range, restricted
        primaries) stays on the host loop below, which also remains the
        fallback on any failure.  Exactness: the batch engine runs the
        same algebra with the same per-pair stops (fused-vs-host parity
        pinned in tests/test_fused_rounds.py; the delegation itself in
        test_fused_single_pair_delegation)."""
        import os

        if os.environ.get("TSALIGN_NO_FUSED"):
            return None
        if not (
            os.environ.get("TSALIGN_FUSED") == "1"
            or jax.default_backend() != "cpu"
        ):
            return None
        if (
            self.max_ts is not None
            or self.prune_range
            or self.allowed_primaries != (0, 1)
            or not self.allow_sdel
        ):
            return None
        try:
            from .parallel.batch_ts import BatchedTSAligner

            bt = BatchedTSAligner(
                self.config,
                [(self.ref, self.qry)],
                ranges=[self.range],
                chunk=self.chunk,
                keep_fields=self.keep_fields,
                # The fused keep-fields buffers are preallocated at
                # max_rounds+1 round slots (and bulk-transferred for the
                # traceback), so cap the fused attempt at 16 — real runs
                # take <= ~8 rounds, and a deeper run falls back to the
                # host loop (which has no such cap) via the exception path.
                max_rounds=min(self.max_rounds, 16),
                use_lower_bounds=self.use_lower_bounds,
                bucket=False,
            )
            res = bt.align()[0]
        except Exception as e:
            logger.warning(
                "single-pair fused delegation failed (%s: %s); host loop",
                type(e).__name__,
                str(e)[:300],
            )
            return None
        self._last_budget = bt.sdel_budget
        F = self.config.left_flank_length + self.config.right_flank_length + 1
        area = (self.n_r + 1) * (self.n_q + 1)
        n_kinds = len(bt.kind_sets[0]) if bt.kind_sets else 0
        self.cells_swept = getattr(self, "cells_swept", 0) + res.rounds * (
            F * 3 * area
        ) + max(0, res.rounds - 1) * n_kinds * area
        return res

    def align(self) -> JaxEngineResult:
        fused = self._fused_delegate()
        if fused is not None:
            return fused
        root = np.asarray(to_device_costs(self._root_seeds_host()))
        t = self.max_ts
        res = JaxEngineResult(cost=INF, rounds=0)

        def keep(M_host, M_dev, E_i32):
            if self.keep_fields is True and M_host is not None:
                res.primary_fields.append(from_device_costs(M_host))
            elif self.keep_fields == "device":
                from .device_fields import DeviceField4

                res.primary_fields.append(
                    DeviceField4(M_dev, entry_cells=from_device_costs(E_i32))
                )

        def keepR(R_dev):
            if self.keep_fields is True:
                res.reentry_fields.append(from_device_costs(np.asarray(R_dev)))
            elif self.keep_fields == "device":
                from .device_fields import DeviceField2

                res.reentry_fields.append(DeviceField2(R_dev))

        root_dev = jnp.asarray(root)

        if t is not None:
            E, best, M_host, M_dev = self._sweep_summary(root_dev, 0 < t)
            keep(M_host, M_dev, E)
            if t == 0:
                res.cost, res.rounds = best, 1
                return res
            budget = self._sdel_budget(best)
            self._last_budget = budget
            kinds = self._build_kinds(budget)
            for c in range(1, t + 1):
                R_dev = self._reentry(
                    self._pruned_entry_cells(E, best), kinds, best=best
                )
                if self.keep_fields:
                    keepR(R_dev)
                E, t_cost, M_host, M_dev = self._sweep_summary(
                    _seeds_jit(root_dev, R_dev), c < t
                )
                keep(M_host, M_dev, E)
                best = min(best, t_cost)
            res.cost, res.rounds = best, t + 1
            return res

        t0 = time.monotonic()
        E, best, M_host, M_dev = self._sweep_summary(root_dev, True)
        keep(M_host, M_dev, E)
        logger.debug("round 0 (no-TS sweep): cost=%s %.3fs", best, time.monotonic() - t0)
        delta = min_tsm_cost_bound(self.config)
        kinds = None
        A = None
        # Delta-incremental reentry: the reentry field is a running min of
        # per-column contributions, and a column is relaunched only when
        # some entry value in it improved since its last launch.  Every
        # folded contribution is the cost of a genuine <=k-TSM prefix, and
        # any cell that reaches a new (lower) value is relaunched, so the
        # accumulated field equals the full relaunch-everything field on
        # every cell an optimal path can use - confirmation rounds whose
        # entry values are stable launch (almost) nothing.
        A_launched = None
        R_acc = None
        for k in range(1, self.max_rounds + 1):
            # Exact early stop: a further improvement needs a path with k
            # template switches, costing at least k * delta.  Checked before
            # any kind/bound construction so trivial (e.g. exact-match)
            # pairs never pay for them.
            if delta > 0 and k * delta > best:
                res.cost, res.rounds = best, k
                return res
            # TSLB improvement stop: no entry cell can start a further TSM
            # and still strictly beat the incumbent.
            if not self._can_improve_cells(E, best):
                res.cost, res.rounds = best, k
                return res
            if kinds is None:
                t0 = time.monotonic()
                budget = self._sdel_budget(best)
                self._last_budget = budget
                kinds = self._build_kinds(budget)
                logger.debug(
                    "budget+build_kinds: %.3fs", time.monotonic() - t0
                )
            if A is None:
                A = self._pruned_entry_cells(E, best)
            t0 = time.monotonic()
            if A_launched is None:
                A_delta = A
            else:
                A_delta = np.where(A < A_launched, A, np.int32(DEV_INF))
            R_new = self._reentry(A_delta, kinds, best=best)
            if R_acc is None:
                R_acc, unchanged = R_new, False
            else:
                R_acc, eq = _acc_jit(R_acc, R_new)
                unchanged = bool(eq)
            A_launched = A if A_launched is None else np.minimum(A_launched, A)
            if self.keep_fields:
                keepR(R_acc)
            # Exact no-sweep stop: if this round's launches left the reentry
            # field unchanged, the seeds are unchanged, so the sweep would
            # reproduce M and the pruned entry field verbatim — a fixpoint.
            if unchanged:
                res.cost, res.rounds = best, k + 1
                return res
            E_next, t_cost, M_host, M_dev = self._sweep_summary(
                _seeds_jit(root_dev, R_acc), True
            )
            keep(M_host, M_dev, E_next)
            new_best = min(best, t_cost)
            logger.debug("round %d: cost=%s %.3fs", k, new_best, time.monotonic() - t0)
            # TSLB stop: the next reentry depends only on the pruned entry
            # field (cells that could start a TSM on an optimal or
            # co-optimal path).  Once that field is stable, reentries,
            # seeds and sweeps all repeat — a true fixpoint of the
            # target-equivalent pruned system.
            A_next = self._pruned_entry_cells(E_next, new_best)
            if new_best < best:
                A = self._pruned_entry_cells(E, new_best)
            best = new_best
            if np.array_equal(A_next, A):
                res.cost, res.rounds = best, k + 1
                return res
            E = E_next
            A = A_next
        res.cost, res.rounds = best, self.max_rounds + 1
        return res

    def align_with_traceback(self):
        from .engine import _align_with_traceback

        result = self.align()
        self.last_rounds = result.rounds  # K-soundness guard (aligner)
        return _align_with_traceback(self, result)
