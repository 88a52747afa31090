"""JAX TSM module sweeps + reentry assembly (int32, jitted, chunked).

Device counterpart of ops/tsm_modules.py.  Per kind (pk, sk, dk):

  1. module scan over the secondary length l with carry T[g, batch..., r]
     (lax.scan; secondary-deletion chains via the associative (min,+) scan),
     emitting per-level exit minima B;
  2. reentry assembly: with s = anti_primary_gap, the exit price is
     length(l) + ldiff(s - l) + anti(s) and the anti-gap walk feasibility
     constraint `p2 + ldiff in [Al, Ah]` (context.rs:662-707) simplifies to
     `p1 + s in [Al, Ah]` (p2 + ldiff = p1 + l + s - l).  The min over l for
     each (p2, s) is a sliding-window minimum over the sheared table
     D3s[p2, e, l] = D3[p2-l, e, l] + length(l), decomposed over the finite
     segments of the piecewise-constant ldiff function.  The feasibility
     constraint clips the window only in a static boundary band of rows
     (|band| <= segment width), handled exactly with per-row-width window
     minima computed as masked shifted elementwise mins over the band slab
     (_masked_window_min — gather-free).  A final scan over s
     accumulates R[p2, j2 = e_anti + s] with the strict reentry bound
     0 <= j2 < n_anti (template_switch_distance.rs:600-618).

Everything per scan step is elementwise + scalar-indexed dynamic slices —
no data-dependent gathers — so the whole pipeline compiles to dense TPU
vector code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TemplateSwitchConfig
from ..costs import INF, CostFunction
from .jaxcommon import (
    DEV_INF,
    minplus_scan,
    sat_add,
    sliding_min_start,
    to_device_costs,
)
from .primary_sweep import GAP_DEL, GAP_INS, GAP_NONE
from .tsm_modules import KindSpec, _dense_or_inf, make_kind_spec

_DK = ("Forward", "Reverse")
_PK = ("Reference", "Query")


def _pallas_default() -> bool:
    """Use the Pallas module kernel on real TPU backends (the CPU backend
    would need interpret mode, which is slower than the XLA scan).
    TSALIGN_NO_PALLAS=1 forces the XLA scan path (escape hatch for shapes
    whose VMEM footprint is near the kernel's budget)."""
    if os.environ.get("TSALIGN_NO_PALLAS"):
        return False
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat not in ("cpu",)


def _finite_segments(fn: CostFunction, lo: int, hi: int) -> List[Tuple[int, int, int]]:
    """Maximal constant finite segments [(a, b, cost)] of fn over [lo, hi],
    split so that no segment contains 0 (ldiff = 0 is priced separately)."""
    segs = []
    cur = None
    for x in range(lo, hi + 1):
        c = fn.evaluate(x) if x >= fn.points[0][0] else INF
        if c >= INF:
            if cur:
                segs.append(tuple(cur))
                cur = None
            continue
        if cur and cur[2] == c:
            cur[1] = x
        else:
            if cur:
                segs.append(tuple(cur))
            cur = [x, x, c]
    if cur:
        segs.append(tuple(cur))
    out = []
    for a, b, c in segs:
        if a <= 0 <= b:
            if a <= -1:
                out.append((a, -1, c))
            if b >= 1:
                out.append((1, b, c))
        else:
            out.append((a, b, c))
    return out


@dataclass(frozen=True)
class _SegPlan:
    a: int
    b: int
    cost: int
    positive: bool
    # static row partition (inclusive python ints, possibly empty ranges)
    full_rows_end: int  # main sliding-window value valid for rows [0..end] (pos) / [start..n_p] (neg)
    band_rows: Tuple[int, int]  # inclusive row range needing clipped windows
    kill_from: int  # rows with no feasible ldiff in this segment


class _Static(NamedTuple):
    """Hashable static snapshot keying the jitted kind pipeline."""

    same_seq: bool
    dk: int
    n_p: int
    n_s: int
    W: int
    L: int
    OFF: int
    LL: int
    s_lo: int
    S: int
    ldiff0: int
    allow_sdel: bool
    anti_lo: int
    anti_hi: int
    plans: tuple
    chunk: int
    use_pallas: bool
    separate_cols: bool = False
    # Poison-padded problem (bucketed batch/chain): anti_hi above is the
    # PADDED walk bound (shared across a bucket so programs are reused);
    # the real bound rides as traced data in fixed["ah_real"] and the
    # positive-ldiff exit-walk row partition is computed at trace time.
    padded: bool = False


class JaxKindModule:
    """One TSM kind's device pipeline: chunk of e_anti -> reentry slab."""

    def __init__(
        self,
        spec: KindSpec,
        config: TemplateSwitchConfig,
        reference: np.ndarray,
        query: np.ndarray,
        anti_lo: int,
        anti_hi: int,
        chunk: int = 64,
        allow_secondary_deletions: bool = True,
        lut_cache: Optional[dict] = None,
        batch: int = 1,
    ):
        self.spec = spec
        self.batch = max(int(batch), 1)
        self.chunk = min(chunk, spec.n_anti + 1)
        # Clamp the e-chunk so the Pallas module kernel's VMEM working set
        # (3 gap planes x 8 rows + scan temporaries + the LUT) fits.  The
        # budget is deliberately conservative: overflowing scoped VMEM at
        # large windows has crashed the TPU worker outright.
        if not spec.same_seq:
            W_pad = -(-(spec.r_hi - spec.r_lo + 1) // 128) * 128
            A = config.alphabet.size
            budget = int(os.environ.get("TSALIGN_VMEM_BUDGET_MB", "24")) * 2**20
            while self.chunk > 8 and 4 * (14 * 8 + A + 4) * self.chunk * W_pad > budget:
                self.chunk //= 2
            # Separately bound the XLA scan path's HBM working set: the
            # carried state T is (3, n_p+1, C, W) int32 and the fused step
            # temporaries are a small multiple of it, so very large shapes
            # (the 1099x1099 ari golden reaches ~4 GB at chunk 32) are
            # clamped harder.  More chunks only lengthen the in-dispatch
            # chunk scan — no extra launches.
            scan_budget = (
                int(os.environ.get("TSALIGN_SCAN_BUDGET_MB", "512")) * 2**20
            )
            # batch > 1 scales the clamp for genuinely vmapped dispatches.
            # The real batch path (parallel/batch_ts.py) no longer has any:
            # module/assembly dispatches run under lax.map with single-pair
            # temps, so it leaves batch=1; only scripts/bisect_batch_crash.py
            # passes batch>1 to reproduce the historical vmapped footprints.
            carry = (
                12 * (spec.n_p + 1) * (spec.r_hi - spec.r_lo + 1) * self.batch
            )
            while self.chunk > 8 and carry * self.chunk > scan_budget:
                self.chunk //= 2
        self.allow_sdel = allow_secondary_deletions
        self.anti_lo, self.anti_hi = anti_lo, anti_hi

        ref = np.asarray(reference, dtype=np.int8)
        qry = np.asarray(query, dtype=np.int8)
        self.P = ref if spec.pk == 0 else qry
        sec = ref if spec.sk == 0 else qry
        A = config.alphabet.size
        # poison padding char support (chained-mode bucketed segments)
        comp = np.append(config.alphabet.complement_array().astype(np.int8), A)
        from .jax_primary import _pad_table_for_poison

        table = _pad_table_for_poison(config.secondary_edit_costs(_DK[spec.dk]))

        n_s, r_lo, r_hi = spec.n_s, spec.r_lo, spec.r_hi
        W = r_hi - r_lo + 1
        self.W = W
        # The big (n_s+1, W) LUTs are built as single int32 gathers from
        # pre-transformed (A+1)-sized tables; infeasible (b, r) positions
        # map to the poison char A, whose padded table row/column already
        # prices INF.  (Full-size int64 where/astype temporaries dominate
        # construction time on slow-memory hosts — this path runs once per
        # kind per alignment.)
        bonus = config.secondary_length_bonus
        lut_key = (spec.sk, spec.dk, r_lo, r_hi)
        cached = lut_cache.get(lut_key) if lut_cache is not None else None
        if cached is None:
            b = np.arange(n_s + 1, dtype=np.int32)[:, None]
            r = np.arange(r_lo, r_hi + 1, dtype=np.int32)[None, :]
            cidx = b + r if spec.dk == 0 else b + r - 1
            valid = (cidx >= 0) & (cidx < n_s)
            raw = (
                sec[np.clip(cidx, 0, max(n_s - 1, 0))]
                if n_s
                else np.zeros_like(cidx, dtype=np.int8)
            )
            cvals = comp[raw] if spec.dk == 1 else raw
            schar = np.where(valid, cvals, np.int8(A)).astype(np.int32)
            sub32 = to_device_costs(
                np.where(table.substitution < INF, table.substitution - bonus, INF)
            )
            go32 = to_device_costs(table.gap_open)
            ge32 = to_device_costs(table.gap_extend)
            # (A+1, n_s+1, W) substitution LUT vs the secondary char at (b, r).
            cached = (sub32[:, schar], go32[schar], ge32[schar])
            if lut_cache is not None:
                lut_cache[lut_key] = cached
        self.sub_lut, self.sdel_open, self.sdel_ext = cached
        self.pgap_open = to_device_costs(
            np.where(table.gap_open < INF, table.gap_open - bonus, INF)
        )
        self.pgap_ext = to_device_costs(
            np.where(table.gap_extend < INF, table.gap_extend - bonus, INF)
        )
        self.seed = to_device_costs(spec.seed)

        n_p, L = spec.n_p, spec.l_max
        # Per-level primary chars and validity (levels consume P[p1 + l]).
        if spec.same_seq:
            pb = np.arange(n_s + 1, dtype=np.int32)
        else:
            pb = np.arange(n_p + 1, dtype=np.int32)
        lvl = np.arange(L, dtype=np.int32)[:, None]
        pidx = pb[None, :] + lvl
        pvalid = pidx < n_p
        self.pchar_l = np.where(
            pvalid, self.P[np.clip(pidx, 0, max(n_p - 1, 0))].astype(np.int32), 0
        )
        self.pmask_l = np.where(pvalid, np.int32(0), DEV_INF)

        # --- assembly statics ---
        cfg = config
        self.length_vec = to_device_costs(
            _dense_or_inf(cfg.length_costs, 0, L)
            if L >= cfg.length_costs.points[0][0]
            else np.full(L + 1, INF, dtype=np.int64)
        )
        # mask lengths below min_len (dense eval already INF there by defn of
        # min_len, but be explicit for safety)
        lv = np.asarray(self.length_vec)
        lv[: spec.min_len] = DEV_INF
        self.length_vec = jnp.asarray(lv)

        ldiff_fn = cfg.length_difference_costs
        dw = ldiff_fn.finite_window()
        d_lo = max(int(dw[0]), -(spec.n_anti + L + 1))
        d_hi = min(int(dw[1]), spec.n_anti + L + 1)
        self.ldiff0 = np.int32(min(ldiff_fn.evaluate(0), int(DEV_INF)))
        segs = _finite_segments(ldiff_fn, d_lo, d_hi)

        anti_fn = cfg.anti_primary_gap_costs(_DK[spec.dk])
        s_lo = spec.min_len + min([a for a, _, _ in segs] + [0])
        s_hi = L + max([b for _, b, _ in segs] + [0])
        s_lo = max(s_lo, -spec.n_anti)
        s_hi = min(s_hi, spec.n_anti - 1)  # j2 = e + s <= n_anti-1, e >= 0
        aw = anti_fn.finite_window()
        if aw is not None:
            s_lo = max(s_lo, int(aw[0]))
            s_hi = min(s_hi, int(aw[1]))
        self.active = aw is not None and s_lo <= s_hi
        if not self.active:
            return
        self.s_lo, self.s_hi = s_lo, s_hi
        S = s_hi - s_lo + 1
        self.S = S
        self.anti_vec = to_device_costs(_dense_or_inf(anti_fn, s_lo, s_hi))

        # l'-axis padding so every window index is in range:
        # t = s - seg.b (start-anchored) and t_end = s - seg.a.
        t_min = min([s_lo - sg[1] for sg in segs] + [s_lo, 0])
        t_max = max([s_hi - sg[0] for sg in segs] + [s_hi, L])
        self.OFF = -t_min
        self.LL = t_max - t_min + 1
        Al, Ah = anti_lo, anti_hi

        plans: List[_SegPlan] = []
        for a, b2, c in segs:
            if a >= 1:
                # feasible iff p1 + s <= Ah <=> p2 <= Ah - ldiff; strictest
                # at ldiff = b2 for full windows.
                plans.append(
                    _SegPlan(
                        a=a,
                        b=b2,
                        cost=c,
                        positive=True,
                        full_rows_end=Ah - b2,
                        band_rows=(max(0, Ah - b2 + 1), min(n_p, Ah - a)),
                        kill_from=Ah - a + 1,
                    )
                )
            else:
                plans.append(
                    _SegPlan(
                        a=a,
                        b=b2,
                        cost=c,
                        positive=False,
                        full_rows_end=Al - a,  # full for rows >= this
                        band_rows=(max(0, Al - b2), min(n_p, Al - a - 1)),
                        kill_from=Al - b2,  # rows < this are killed
                    )
                )
        self.plans = tuple(plans)

        # Assembly scratch clamp (XLA path, ALL kinds — the same-seq kinds
        # have no module-scan clamp, and their assembly is the dominant
        # working set).  The gather-free masked-shift band machinery
        # (_masked_window_min) keeps one (n_p+1, C, S+w-1) window source
        # slice plus a handful of (n_p+1, C, S)-sized shift/accumulator
        # slabs live per segment, alongside the (n_p+1, C, LL) sheared
        # D3pad; the K_env factor below is a conservative envelope of those
        # concurrent slabs.  Historically a dispatch whose working set
        # approached the worker's free HBM headroom crashed the worker (the
        # round-3 bisect later attributed the crash to gather dispatches,
        # since rewritten away), so this clamp is now a memory-footprint
        # bound, not a crash workaround.
        w_max = max((sg[1] - sg[0] + 1 for sg in segs), default=1)
        K_env = max(1, int(np.floor(np.log2(max(w_max, 1)))) + 1)
        a_budget = int(os.environ.get("TSALIGN_ASM_BUDGET_MB", "128")) * 2**20
        per_c = 4 * (K_env + 3) * (n_p + 1) * (S + w_max - 1) * self.batch
        while self.chunk > 8 and per_c * self.chunk > a_budget:
            self.chunk //= 2

        padded = spec.bucketed
        self._static = _Static(
            same_seq=spec.same_seq,
            dk=spec.dk,
            n_p=spec.n_p,
            n_s=spec.n_s,
            W=self.W,
            L=spec.l_max,
            OFF=self.OFF,
            LL=self.LL,
            s_lo=self.s_lo,
            S=self.S,
            ldiff0=int(self.ldiff0),
            allow_sdel=self.allow_sdel,
            anti_lo=anti_lo,
            anti_hi=anti_hi,
            plans=self.plans,
            chunk=self.chunk,
            use_pallas=_pallas_default() and not spec.same_seq,
            padded=padded,
        )
        self._fixed = {
            "seed": jnp.asarray(self.seed),
            "lut": jnp.asarray(self.sub_lut),
            "sdo": jnp.asarray(self.sdel_open),
            "sde": jnp.asarray(self.sdel_ext),
            "pchar_l": jnp.asarray(self.pchar_l),
            "pmask_l": jnp.asarray(self.pmask_l),
            "pgo": jnp.asarray(self.pgap_open),
            "pge": jnp.asarray(self.pgap_ext),
            "length_vec": jnp.asarray(self.length_vec),
            "anti_vec": jnp.asarray(self.anti_vec),
        }
        if padded:
            # Traced (not static) so bucketed problems with different real
            # lengths share one compiled program; stacks to (B,) in the
            # batched path.  The effective walk bound is the tighter of the
            # static bound (the range under RangePrune) and the real length.
            self._fixed["ah_real"] = jnp.int32(min(anti_hi, spec.n_anti_real))

    def run(self, A_chunk: jnp.ndarray, seed_chunk, lut_chunk, do_chunk, de_chunk):
        """A_chunk: (n_p+1, C) entry costs for this e-slab (same_seq: full
        A rows x e-slab).  Returns R_pad (n_p+1, C + S - 1) for columns
        j2 = e0 + s_lo ... e0 + C - 1 + s_hi.  The jitted pipeline is
        module-level keyed on the static snapshot, so equal-shaped kinds
        (e.g. across chained segments) share compilations."""
        return _kind_impl(
            A_chunk, seed_chunk, lut_chunk, do_chunk, de_chunk, self._fixed,
            st=self._static,
        )


def _kind_body(A_chunk, seed_chunk, lut_chunk, do_chunk, de_chunk, fixed, B_pre, *, st):
    L = st.L
    C = A_chunk.shape[1]

    if st.same_seq:
        # Intra-sequence module is e-independent: computed once per round
        # (_same_module_jit) and passed in as B_pre (L+1, n_b).
        return _assembly(B_pre, A_chunk, fixed, st)

    if st.use_pallas:
        from .pallas_module import module_scan_pallas

        pchar_l = fixed["pchar_l"]
        pmask_l = fixed["pmask_l"]
        io_l = jnp.minimum(fixed["pgo"][pchar_l] + pmask_l, DEV_INF)
        ie_l = jnp.minimum(fixed["pge"][pchar_l] + pmask_l, DEV_INF)
        seedT = sat_add(A_chunk[:, :, None], seed_chunk[None, :, :])
        B = module_scan_pallas(
            seedT,
            lut_chunk,
            do_chunk,
            de_chunk,
            pchar_l,
            pmask_l,
            io_l,
            ie_l,
            L=L,
            A=lut_chunk.shape[0],
            fwd=st.dk == 0,
            allow_sdel=st.allow_sdel,
        )
    else:
        seedT = sat_add(A_chunk[:, :, None], seed_chunk[None, :, :])
        B = _module_scan_xla(seedT, lut_chunk, do_chunk, de_chunk, fixed, st=st)
    return _assembly(B, A_chunk, fixed, st)


def _module_scan_xla(seed0, lut, sdo, sde, fixed, *, st):
    """lax.scan module sweep.  seed0 is the level-0 GAP_NONE plane:
    (n_b, W) for intra-sequence kinds, (n_b, C, W) for cross kinds."""
    L = st.L
    W = st.W
    fwd = st.dk == 0
    T0 = jnp.full((3,) + seed0.shape, DEV_INF, jnp.int32)
    T0 = T0.at[GAP_NONE].set(seed0)

    def close(T):
        if not st.allow_sdel:
            return T
        open_src = jnp.minimum(T[GAP_NONE], T[GAP_INS])
        pad_shape = T.shape[1:-1] + (1,)
        pad = jnp.full(pad_shape, DEV_INF, T.dtype)
        if fwd:
            cand = jnp.concatenate([pad, sat_add(open_src, sdo)[..., :-1]], axis=-1)
            ext = jnp.concatenate([pad, jnp.broadcast_to(sde, open_src.shape)[..., :-1]], axis=-1)
            cand = jnp.minimum(cand, T[GAP_DEL])
            d = minplus_scan(cand, ext, axis=-1)
        else:
            cand = jnp.concatenate([sat_add(open_src, sdo)[..., 1:], pad], axis=-1)
            ext = jnp.concatenate([jnp.broadcast_to(sde, open_src.shape)[..., 1:], pad], axis=-1)
            cand = jnp.minimum(cand, T[GAP_DEL])
            d = minplus_scan(cand, ext, axis=-1, reverse=True)
        return T.at[GAP_DEL].set(d)

    pchar_l = fixed["pchar_l"]  # (L, n_b)
    pmask_l = fixed["pmask_l"]
    pgo, pge = fixed["pgo"], fixed["pge"]

    def step(T, x):
        pchar, pmask = x
        T = close(T)
        emit = jnp.min(jnp.min(T, axis=0), axis=-1)  # (n_b[, C])
        # transitions to the next level
        src_any = jnp.min(T, axis=0)
        if st.same_seq:
            sub = jnp.take_along_axis(lut, pchar[None, :, None], axis=0)[0]
            sub = sat_add(sub, pmask[:, None])
        else:
            sub = lut[pchar]  # (n_b, C, W)
            sub = sat_add(sub, pmask[:, None, None])
        diag = sat_add(src_any, sub)
        pad_shape = diag.shape[:-1] + (1,)
        pad = jnp.full(pad_shape, DEV_INF, diag.dtype)
        if fwd:
            none_new = jnp.concatenate([pad, diag[..., :-1]], axis=-1)
        else:
            none_new = jnp.concatenate([diag[..., 1:], pad], axis=-1)
        io = sat_add(pgo[pchar], pmask)
        ie = sat_add(pge[pchar], pmask)
        ex = (slice(None),) + (None,) * (T.ndim - 2)
        ins_new = jnp.minimum(
            sat_add(jnp.minimum(T[GAP_NONE], T[GAP_DEL]), io[ex]),
            sat_add(T[GAP_INS], ie[ex]),
        )
        T_next = (
            jnp.full_like(T, DEV_INF).at[GAP_NONE].set(none_new).at[GAP_INS].set(ins_new)
        )
        return T_next, emit

    T_last, B = jax.lax.scan(step, T0, (pchar_l, pmask_l))
    T_last = close(T_last)
    B_last = jnp.min(jnp.min(T_last, axis=0), axis=-1)
    return jnp.concatenate([B, B_last[None]], axis=0)  # (L+1, n_b[, C])


def _assembly(B, A_chunk, fixed, st):
    L = st.L
    n_p = st.n_p
    C = A_chunk.shape[1]
    # D3pl[p1, e, l] = entry + module + length(l)
    if st.same_seq:
        D3 = sat_add(A_chunk[:, :, None], jnp.moveaxis(B, 0, -1)[:, None, :])
    else:
        D3 = jnp.moveaxis(B, 0, -1)  # (n_p+1, C, L+1)
    D3 = sat_add(D3, fixed["length_vec"][None, None, :])

    # shear: D3s[p2, e, l] = D3[p2 - l, e, l], gather-free via the skew
    # reshape (left INF pad, flatten, stride by R+L-1 — the same trick as
    # the diagonal min-fold below; p2 - l < 0 lands in the pad).  The
    # take_along_axis form of this shear faulted the TPU worker at
    # n_p ~ 1100 once any device->host transfer had run (the ari golden;
    # same dirty-state gather fault class as _assembly_positive_traced).
    R = n_p + 1
    Z = jnp.moveaxis(D3, 0, -1)  # (C, L+1, R)
    Zpad = jnp.concatenate(
        [jnp.full((C, L + 1, L), DEV_INF, jnp.int32), Z], axis=-1
    )
    flat = Zpad.reshape(C, (L + 1) * (R + L))
    V = flat[:, L : L + (L + 1) * (R + L - 1)].reshape(
        C, L + 1, R + L - 1
    )[:, :, :R]
    D3s = jnp.transpose(V, (2, 0, 1))

    OFF, LL = st.OFF, st.LL
    D3pad = jnp.full((n_p + 1, C, LL), DEV_INF, jnp.int32)
    D3pad = jax.lax.dynamic_update_slice(D3pad, D3s, (0, 0, OFF))

    anti_vec = fixed["anti_vec"]
    S = st.S
    row_idx = jnp.arange(n_p + 1)

    # All s-positions at once: every per-s window lookup is a lookup at the
    # static offset t = OFF + s - plan.b over the contiguous static range
    # s in [s_lo, s_hi], i.e. one static slice of width S — the former
    # S-step lax.scan serialized ~hundreds of small device ops per chunk
    # and dominated the kind execute time.  Each segment's sliding-min
    # array is folded into U before the next is built, so at most one
    # D3pad-sized window buffer is live at a time (building all segments
    # first kept len(plans) of them live simultaneously — the peak-memory
    # hot spot of the whole kind step at large n).
    U = jnp.full((n_p + 1, C, S), DEV_INF, jnp.int32)
    for plan in st.plans:
        w = plan.b - plan.a + 1
        if st.padded and plan.positive:
            # Poison-padded problem: the positive-ldiff walk bound
            # p2 + ldiff <= Ah uses the REAL anti length (traced in
            # fixed["ah_real"]), so the row partition (full/banded/killed)
            # is computed per row at trace time via per-row-width sparse-
            # table window minima.  Negative plans depend only on anti_lo
            # (= 0 here) and keep the static machinery below.
            val = _assembly_positive_traced(
                st, plan, D3pad, n_p, C, fixed["ah_real"]
            )
            U = jnp.minimum(
                U, sat_add(val, np.int32(min(plan.cost, int(DEV_INF))))
            )
            continue
        t0 = OFF + st.s_lo - plan.b  # start-anchored window index at s_lo
        # Windows are needed only at t0 .. t0 + S - 1; their source values
        # span [t0, t0 + S + w - 1), in-bounds by construction of OFF/LL.
        # Slicing before the sliding min keeps the window buffers S+w wide
        # instead of LL wide.
        src = jax.lax.slice(D3pad, (0, 0, t0), (n_p + 1, C, t0 + S + w - 1))
        val = sliding_min_start(src, w, axis=-1)[..., :S]
        b0, b1 = plan.band_rows
        if b0 <= b1:
            bval = _band_masked(st, plan, D3pad, b0, b1, C)
            val = jax.lax.dynamic_update_slice(val, bval, (b0, 0, 0))
        if plan.positive:
            kill = row_idx[:, None, None] > plan.kill_from - 1
        else:
            kill = row_idx[:, None, None] < plan.kill_from
        val = jnp.where(kill, DEV_INF, val)
        U = jnp.minimum(U, sat_add(val, np.int32(min(plan.cost, int(DEV_INF)))))
    # ldiff = 0 exact term (always walk-feasible)
    v0 = jax.lax.slice(
        D3pad, (0, 0, OFF + st.s_lo), (n_p + 1, C, OFF + st.s_lo + S)
    )
    U = jnp.minimum(U, sat_add(v0, np.int32(st.ldiff0)))
    U = sat_add(U, anti_vec[None, None, :])

    if getattr(st, "separate_cols", False):
        # Compacted-column mode: each entry column's full s-slab
        # (n_p+1, C, S); the caller folds at the true j2 = e + s positions.
        return U

    # Diagonal min-fold R_pad[p, c + s] = min_c U[p, c, s] via the skew
    # reshape: pad rows to length S + C, flatten, drop the tail, reshape to
    # (C, S + C - 1) — row c lands shifted right by c — then min over c.
    V = jnp.concatenate(
        [U, jnp.full((n_p + 1, C, C), DEV_INF, jnp.int32)], axis=-1
    )
    flat = V.reshape(n_p + 1, C * (S + C))
    skewed = flat[:, : C * (S + C) - C].reshape(n_p + 1, C, S + C - 1)
    return jnp.min(skewed, axis=1)


def _assembly_positive_traced(st, plan: _SegPlan, D3pad, n_p: int, C: int, ah):
    """Positive-ldiff segment contribution with a TRACED walk bound `ah`
    (the real anti length of a poison-padded problem).

    Exact counterpart of the static full+band+kill partition: row p2's
    feasible ldiff range is [a, min(b, ah - p2)], i.e. an end-anchored
    window of per-row width w_row = clip(ah - a - p2 + 1, 1, w), killed
    when ah - p2 < a.  Per-row widths are served gather-free by w masked
    shifted elementwise mins over the (w-1)-row boundary band
    (_masked_window_min); only the band rows pay the per-offset work."""
    w = plan.b - plan.a + 1
    S = st.S
    t0 = st.OFF + st.s_lo - plan.b
    src = jax.lax.slice(D3pad, (0, 0, t0), (n_p + 1, C, t0 + S + w - 1))
    # Row p2's feasible window over the w offsets is [delta(p2), w-1] with
    # delta = clip(p2 - (ah - b), 0, w) (delta == w kills the row),
    # end-anchored.  Rows at delta == 0 (everything up to the boundary band)
    # take the plain full-window sliding min; the w-1 band rows starting at
    # the TRACED offset b0 = ah - b + 1 are patched with w masked shifted
    # elementwise mins over the band slab (fori accumulator, carry seeded
    # from the u=0 term so shard_map vma types match); rows past ah - a are
    # killed.  Entirely gather-free: the original per-row-level sparse
    # tables used take_along_axis gathers whose dispatch FAULTS this
    # environment's TPU worker at the dk=1 widths once any device->host
    # transfer has staged buffers (round-3 bisect, BISECT_PLANS=pos in
    # scripts/bisect_batch_crash.py).
    rows = jnp.arange(n_p + 1, dtype=jnp.int32)[:, None, None]
    val = sliding_min_start(src, w, axis=-1)[..., :S]
    nb = min(w - 1, n_p + 1)
    if nb > 0:
        b0 = jnp.clip(
            ah - np.int32(plan.b) + 1, 0, np.int32(n_p + 1 - nb)
        ).astype(jnp.int32)
        band_src = jax.lax.dynamic_slice(src, (b0, 0, 0), (nb, C, S + w - 1))
        brows = b0 + jnp.arange(nb, dtype=jnp.int32)[:, None, None]
        delta = jnp.clip(brows - (ah - np.int32(plan.b)), 0, w)
        bval = _masked_window_min(band_src, delta, w, nb, C, S)
        val = jax.lax.dynamic_update_slice(val, bval, (b0, 0, 0))
    return jnp.where(rows > ah - np.int32(plan.a), DEV_INF, val)


def _band_masked(st, plan: _SegPlan, D3pad, b0: int, b1: int, C: int):
    """Per-row-width window minima for the feasibility boundary band rows
    [b0, b1], as w masked shifted elementwise mins over the band slab
    (gather-free; see _assembly_positive_traced for why gathers are banned
    from this pipeline).

    With src sliced at the start anchor t0 = OFF + s_lo - b, offset u of
    output position s reads window index t = (s - b) + u, i.e. the ldiff
    value x = b - u.  Feasibility of x for row p2:
      positive plans: p2 + x <= Ah  <=>  u >= p2 - (Ah - b)
      negative plans: p2 + x >= Al  <=>  u <= p2 + b - Al
    (anti-gap walk feasibility, context.rs:662-707 reduced per the module
    decomposition).  Returns the (b1-b0+1, C, S) band values; rows outside
    their feasible range saturate to DEV_INF via the mask."""
    w = plan.b - plan.a + 1
    S = st.S
    t0 = st.OFF + st.s_lo - plan.b
    nb = b1 - b0 + 1
    src = jax.lax.slice(D3pad, (b0, 0, t0), (b1 + 1, C, t0 + S + w - 1))
    rows = jnp.arange(b0, b1 + 1, dtype=jnp.int32)[:, None, None]
    if plan.positive:
        lo_u = jnp.clip(rows - np.int32(st.anti_hi - plan.b), 0, w)
        return _masked_window_min(src, lo_u, w, nb, C, S)
    hi_u = jnp.clip(rows + np.int32(plan.b - st.anti_lo), -1, w - 1)
    return _masked_window_min(src, None, w, nb, C, S, hi_u=hi_u)


def _masked_window_min(src, lo_u, w, nb, C, S, hi_u=None):
    """min over window offsets u in [lo_u(row), w-1] (or [0, hi_u(row)])
    of src[..., s+u], as masked shifted elementwise mins — gather-free (see
    _assembly_positive_traced).  The u loop runs in blocks of UB: one
    dynamic slice per block plus UB static sub-slices, so the sequential
    fori depth is w/UB instead of w (the per-step work here is tiny — the
    loop was launch-latency-bound inside the chunk scans)."""
    UB = 8

    def masked(uu, sh):
        ok = uu >= lo_u if hi_u is None else uu <= hi_u
        return jnp.where(ok, sh, DEV_INF)

    def term(u):
        return masked(u, jax.lax.dynamic_slice(src, (0, 0, u), (nb, C, S)))

    def block(u0, v):
        chunk = jax.lax.dynamic_slice(src, (0, 0, u0), (nb, C, S + UB - 1))
        for db in range(UB):
            sh = jax.lax.slice(chunk, (0, 0, db), (nb, C, db + S))
            v = jnp.minimum(v, masked(u0 + db, sh))
        return v

    nfull = max((w - 1) // UB, 0)  # UB-blocks covering u = 1 .. nfull*UB
    v = term(0)
    u = 1
    if nfull:
        v = jax.lax.fori_loop(
            0, nfull, lambda i, vv: block(1 + i * UB, vv), v
        )
        u = 1 + nfull * UB
    for ur in range(u, w):
        v = jnp.minimum(v, term(ur))
    return v


@partial(jax.jit, static_argnames=("st",))
def _same_module_jit(fixed, *, st):
    """Intra-sequence (RR/QQ) module scan: independent of the entry-field
    e-axis, so it runs once per round and is shared by all chunks."""
    return _module_scan_xla(
        jnp.asarray(fixed["seed"]),
        fixed["lut"],
        fixed["sdo"],
        fixed["sde"],
        fixed,
        st=st,
    )


@partial(jax.jit, static_argnames=("st", "PAD"))
def _kind_all_chunks(A_mod, Rk_pad, fixed, e_bases, B_pre, *, st, PAD):
    """All e-chunks of a kind in one dispatch: lax.scan over the traced
    chunk offsets with the padded reentry accumulator as carry."""

    def body(carry, e_base):
        # e_base < 0 marks a chunk whose entry-field minimum already exceeds
        # the best known total cost: it cannot lie on an optimal path, so it
        # is skipped (the host builds the sentinel list per round).
        return (
            jax.lax.cond(
                e_base >= 0,
                lambda c: _kind_chunk_step(
                    c, A_mod=A_mod, fixed=fixed, e_base=e_base, B_pre=B_pre,
                    st=st, PAD=PAD
                ),
                lambda c: c,
                carry,
            ),
            None,
        )

    Rk_pad, _ = jax.lax.scan(body, Rk_pad, e_bases)
    return Rk_pad


@partial(jax.jit, static_argnames=("st", "PAD", "OUTW", "gather"))
def _kind_sel_chunks(A_sel, e_sel, fixed_sel, B_pre, *, st, PAD, OUTW, gather=False):
    """Compacted-column pipeline: the host gathers the live entry columns
    into a dense (n_p+1, K) matrix; chunks of the COMPACT axis run the
    module + separate-column assembly, and each column's contiguous s-slab
    is min-folded ON DEVICE at its true j2 = e + s position (a K-step inner
    scan of dense (n_p+1, S) mins) so only the folded (n_p+1, OUTW) field
    transfers back - the raw (n_p+1, K, S) slab is 10-100x larger and
    dominated the relay transfer time.  With gather=True the per-entry
    tables (seed/lut/sdo/sde) arrive FULL (round-invariant, resident on
    device) and the live columns are gathered here by e_sel - no per-round
    host gather/transfer of the big tables.  Sentinel columns (e_sel
    pointing anywhere) are inert because their A_sel column is DEV_INF and
    the module seed saturates.  One compile per (kind statics, K bucket)."""
    C = st.chunk
    if gather:
        # A_sel arrives as the FULL entry field (device-cached across
        # kinds); gather its live columns here too.  Sentinel e_sel slots
        # re-gather column e_sel[i]'s true value: a duplicate genuine
        # contribution folded at its true position (min-idempotent) or
        # DEV_INF if that column is pruned — exact either way.
        A_sel = jnp.take(A_sel, e_sel, axis=1)
        if not st.same_seq:
            fixed_sel = dict(
                fixed_sel,
                seed=jnp.take(fixed_sel["seed"], e_sel, axis=0),
                lut=jnp.take(fixed_sel["lut"], e_sel, axis=1),
                sdo=jnp.take(fixed_sel["sdo"], e_sel, axis=0),
                sde=jnp.take(fixed_sel["sde"], e_sel, axis=0),
            )
    K = A_sel.shape[1]
    out0 = jnp.full((st.n_p + 1, OUTW), DEV_INF, jnp.int32)
    n_chunks = -(-K // C)
    e_bases = jnp.asarray(
        [np.int32(min(i * C, K - C) if K >= C else 0) for i in range(n_chunks)],
        jnp.int32,
    )

    def fold_body(out, args):
        col_slab, e = args  # (n_p+1, S), scalar true entry column
        lo = e + np.int32(st.s_lo + PAD)
        cur = jax.lax.dynamic_slice(out, (0, lo), (st.n_p + 1, st.S))
        return (
            jax.lax.dynamic_update_slice(
                out, jnp.minimum(cur, col_slab), (0, lo)
            ),
            None,
        )

    def body(out, e_base):
        A_chunk = jax.lax.dynamic_slice(A_sel, (0, e_base), (st.n_p + 1, C))
        if st.same_seq:
            sc = fixed_sel["seed"][:1]
            lc = fixed_sel["lut"][:, :1]
            dc = fixed_sel["sdo"][:1]
            ec = fixed_sel["sde"][:1]
        else:
            sc = jax.lax.dynamic_slice(fixed_sel["seed"], (e_base, 0), (C, st.W))
            lc = jax.lax.dynamic_slice(
                fixed_sel["lut"], (0, e_base, 0), (fixed_sel["lut"].shape[0], C, st.W)
            )
            dc = jax.lax.dynamic_slice(fixed_sel["sdo"], (e_base, 0), (C, st.W))
            ec = jax.lax.dynamic_slice(fixed_sel["sde"], (e_base, 0), (C, st.W))
        slab = _kind_body(A_chunk, sc, lc, dc, ec, fixed_sel, B_pre, st=st)
        e_chunk = jax.lax.dynamic_slice(e_sel, (e_base,), (C,))
        out, _ = jax.lax.scan(
            fold_body, out, (jnp.moveaxis(slab, 1, 0), e_chunk)
        )
        return out, None

    out, _ = jax.lax.scan(body, out0, e_bases)
    return out


def _kind_chunk_step(Rk_pad, *, A_mod, fixed, e_base, B_pre, st, PAD):
    """One e-chunk of a kind's pipeline with a traced chunk offset: slice the
    entry field and per-e tables at e_base, run the module + assembly, and
    min-fold the resulting slab into the padded reentry accumulator at
    columns PAD + e_base + s_lo."""
    C = st.chunk
    A_chunk = jax.lax.dynamic_slice(A_mod, (0, e_base), (st.n_p + 1, C))
    if st.same_seq:
        sc = fixed["seed"][:1]
        lc = fixed["lut"][:, :1]
        dc = fixed["sdo"][:1]
        ec = fixed["sde"][:1]
    else:
        sc = jax.lax.dynamic_slice(fixed["seed"], (e_base, 0), (C, st.W))
        lc = jax.lax.dynamic_slice(
            fixed["lut"], (0, e_base, 0), (fixed["lut"].shape[0], C, st.W)
        )
        dc = jax.lax.dynamic_slice(fixed["sdo"], (e_base, 0), (C, st.W))
        ec = jax.lax.dynamic_slice(fixed["sde"], (e_base, 0), (C, st.W))
    R_pad = _kind_body(A_chunk, sc, lc, dc, ec, fixed, B_pre, st=st)
    # fold: R_pad column c is j2 = e_base + s_lo + c -> Rk_pad col PAD + e_base + s_lo + c
    start = PAD + e_base + st.s_lo
    cur = jax.lax.dynamic_slice(
        Rk_pad, (0, start), (Rk_pad.shape[0], R_pad.shape[1])
    )
    return jax.lax.dynamic_update_slice(
        Rk_pad, jnp.minimum(cur, R_pad), (0, start)
    )


@partial(
    jax.jit,
    static_argnames=("PAD", "n_anti", "transpose"),
    donate_argnums=(0,),
)
def _fold_kind_cells(R_dev, Rk_pad, n_real, *, PAD, n_anti, transpose):
    """Min-fold one kind's padded reentry slab into the shared (ref, query)
    reentry-cell accumulator ON DEVICE: slice the real j2 range, apply the
    strict-reentry bound (j2 < n_real, the REAL anti length of a possibly
    poison-padded problem — traced so bucketed problems share programs),
    transpose pk==1 kinds, min.  Keeps the per-kind (n_p+1, width) slabs on
    device so only the final folded field crosses the relay (the eight ~MB
    per-kind transfers per round dominated the reentry wall time)."""
    Rk = Rk_pad[:, PAD : PAD + n_anti + 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_anti + 1), 1)
    Rk = jnp.where(cols < n_real, Rk, DEV_INF)
    if transpose:
        Rk = Rk.T
    return jnp.minimum(R_dev, Rk)
