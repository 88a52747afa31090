"""JAX primary sweep: flank-layered gap-affine wavefront DP (int32, jitted).

Device counterpart of ops/primary_sweep.py (the executable numpy spec); one
lax.scan step per reference row, layers unrolled bottom-up (-R .. L), the
within-row insertion chain solved with the associative (min,+) scan.

Semantics (context.rs:164-354): flank-0 steps use the primary table; climbing
f -> f+1 uses the right-flank table for f < 0 (always allowed) and the left
flank table for 0 <= f < L (gated on can_start_another_template_switch);
gap open vs extend decided by the source gap type; sources gated to the
primary range.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TemplateSwitchConfig
from ..costs import INF
from ..geometry import AlignmentRange
from .jaxcommon import DEV_INF, minplus_scan, sat_add, to_device_costs
from .primary_sweep import GAP_DEL, GAP_INS, GAP_NONE


class JaxPrimarySweep:
    """Precomputes device inputs for a (config, pair, range, climb) tuple and
    exposes a jitted `sweep(seeds)` matching PrimarySweep.sweep."""

    def __init__(
        self,
        config: TemplateSwitchConfig,
        reference: np.ndarray,
        query: np.ndarray,
        range_: Optional[AlignmentRange] = None,
        allow_flank_climb: bool = True,
    ):
        self.config = config
        ref = np.asarray(reference, dtype=np.int64)
        qry = np.asarray(query, dtype=np.int64)
        n_r, n_q = len(ref), len(qry)
        self.n_r, self.n_q = n_r, n_q
        rng = range_ or AlignmentRange.complete(n_r, n_q)
        self.L = config.left_flank_length
        self.R = config.right_flank_length
        self.F = self.L + self.R + 1
        self.climb = allow_flank_climb

        ref_ok = np.zeros(n_r + 1, dtype=bool)
        qry_ok = np.zeros(n_q + 1, dtype=bool)
        ref_ok[rng.reference_offset : rng.reference_limit] = True
        qry_ok[rng.query_offset : rng.query_limit] = True
        qmask = np.where(qry_ok[:n_q], 0, INF)
        # Sequences may carry the poison padding char (index == alphabet
        # size, used by bucketed chained-mode segments); extend every table
        # with an INF row/column so any interaction with padding is INF.
        pad_idx = config.alphabet.size
        ref = np.clip(ref, 0, pad_idx)
        qry = np.clip(qry, 0, pad_idx)

        self._rows = {}
        self._ins = {}
        for name, table in (
            ("primary", config.primary_edit_costs),
            ("left", config.left_flank_edit_costs),
            ("right", config.right_flank_edit_costs),
        ):
            table = _pad_table_for_poison(table)
            subrow = np.full((n_r + 1, n_q), INF, dtype=np.int64)
            delopen = np.full(n_r + 1, INF, dtype=np.int64)
            delext = np.full(n_r + 1, INF, dtype=np.int64)
            if n_r and n_q:
                sub = np.where(
                    qry_ok[None, :n_q],
                    table.substitution[ref[:, None], qry[None, :]],
                    INF,
                )
                subrow[1:] = np.where(ref_ok[:n_r, None], sub, INF)
            if n_r:
                delopen[1:] = np.where(ref_ok[:n_r], table.gap_open[ref], INF)
                delext[1:] = np.where(ref_ok[:n_r], table.gap_extend[ref], INF)
            self._rows[name] = (
                to_device_costs(subrow),
                to_device_costs(delopen),
                to_device_costs(delext),
            )
            insopen = (
                np.where(qry_ok[:n_q], table.gap_open[qry], INF)
                if n_q
                else np.zeros(0)
            )
            insext = (
                np.where(qry_ok[:n_q], table.gap_extend[qry], INF)
                if n_q
                else np.zeros(0)
            )
            self._ins[name] = (to_device_costs(insopen), to_device_costs(insext))

    def sweep(self, seeds: jnp.ndarray) -> jnp.ndarray:
        """seeds: (F, 3, n_r+1, n_q+1) int32 device costs.  Returns
        M: (F, 3, n_r+1, n_q+1) int32.

        The jitted kernel is module-level with static (L, R, climb), so
        instances with equal shapes share one compilation.  Flankless
        configs on TPU use the on-chip Pallas sweep (the XLA per-row scan
        is latency-bound)."""
        if self.F == 1 and self._pallas_ok():
            from .pallas_sweep import sweep_pallas_flankless

            sub_rows, dd, io, ie = self.flankless_inputs()
            try:
                M = sweep_pallas_flankless(
                    jnp.asarray(sub_rows),
                    jnp.asarray(dd),
                    seeds[0].transpose(1, 0, 2),
                    jnp.asarray(io),
                    jnp.asarray(ie),
                )
                return M.transpose(1, 0, 2)[None]
            except Exception as e:  # Mosaic compile rejection: clean fallback
                self._disable_pallas(e)
        tb = self._pallas_tile()
        if tb:
            from .pallas_sweep import sweep_pallas_flankless_tiled

            sub_rows, dd, io, ie = self.flankless_inputs()
            try:
                M = sweep_pallas_flankless_tiled(
                    jnp.asarray(sub_rows),
                    jnp.asarray(dd),
                    seeds[0].transpose(1, 0, 2),
                    jnp.asarray(io),
                    jnp.asarray(ie),
                    TB=tb,
                )
                return M.transpose(1, 0, 2)[None]
            except Exception as e:  # Mosaic compile rejection: clean fallback
                self._disable_pallas(e)
        if self.F > 1 and self._pallas_ok():
            from .pallas_sweep import sweep_pallas_flanked

            subs, dd, io, ie = self.flanked_inputs()
            n_rows = self.n_r + 1
            Wq = self.n_q + 1
            # (F, 3, n_rows, Wq) -> (n_rows, F*3, Wq), layer-major
            seeds_r = seeds.reshape(self.F * 3, n_rows, Wq).transpose(1, 0, 2)
            try:
                M = sweep_pallas_flanked(
                    jnp.asarray(subs),
                    jnp.asarray(dd),
                    seeds_r,
                    jnp.asarray(io),
                    jnp.asarray(ie),
                    L=self.L,
                    R=self.R,
                    climb=self.climb,
                )
                return M.transpose(1, 0, 2).reshape(self.F, 3, n_rows, Wq)
            except Exception as e:  # Mosaic compile rejection: clean fallback
                self._disable_pallas(e)
        arrays = {
            "p": self._rows["primary"],
            "l": self._rows["left"],
            "r": self._rows["right"],
            "ins": self._ins,
        }
        return _sweep_jit(seeds, arrays, L=self.L, R=self.R, climb=self.climb)

    def flankless_inputs(self):
        """Row-major flankless (F == 1) sweep inputs shared by the Pallas
        kernel and the sequence-parallel sharded sweep: per-row substitution
        costs (row 0 all-INF), per-row del open/extend, and per-column ins
        open/extend (position n_q padded INF)."""
        sub, do, de = self._rows["primary"]
        n_rows = self.n_r + 1
        Wq = self.n_q + 1
        sub_rows = np.full((n_rows, Wq), int(DEV_INF), np.int32)
        sub_rows[:, : self.n_q] = sub
        dd = np.stack([do, de], axis=1).astype(np.int32)
        io = np.full(Wq, int(DEV_INF), np.int32)
        ie = np.full(Wq, int(DEV_INF), np.int32)
        io[: self.n_q] = self._ins["primary"][0]
        ie[: self.n_q] = self._ins["primary"][1]
        return sub_rows, dd, io, ie

    def flanked_inputs(self):
        """Flanked (F > 1) Pallas sweep inputs: stacked per-table rows.

        subs (3, n_rows, Wq): substitution rows for (primary, left, right),
        row 0 all-INF, column n_q INF; ddrows (n_rows, 6): del open/ext per
        table; io/ie (3, Wq): insertion open/extend per table."""
        n_rows = self.n_r + 1
        Wq = self.n_q + 1
        subs = np.full((3, n_rows, Wq), int(DEV_INF), np.int32)
        dd = np.full((n_rows, 6), int(DEV_INF), np.int32)
        io = np.full((3, Wq), int(DEV_INF), np.int32)
        ie = np.full((3, Wq), int(DEV_INF), np.int32)
        for t, name in enumerate(("primary", "left", "right")):
            sub, do, de = self._rows[name]
            subs[t, :, : self.n_q] = sub
            dd[:, 2 * t] = do
            dd[:, 2 * t + 1] = de
            io[t, : self.n_q] = self._ins[name][0]
            ie[t, : self.n_q] = self._ins[name][1]
        return subs, dd, io, ie

    def _disable_pallas(self, err: Exception) -> None:
        """A Pallas sweep failed to compile (e.g. a Mosaic scoped-VMEM
        rejection at an unusual shape): log once and route this instance
        through the XLA scan path from now on.  Runtime worker faults do
        not reach here — only clean compile-time errors."""
        import logging

        logging.getLogger(__name__).warning(
            "Pallas sweep compile failed (%s: %s); falling back to the XLA "
            "scan path for this sweep",
            type(err).__name__,
            str(err)[:500],
        )
        self._pallas_broken = True

    def _pallas_tile(self) -> int:
        """Row-block size for the TILED flankless Pallas sweep when the
        whole-state kernel is VMEM-capped out (large n) — 0 disables."""
        from .jax_modules import _pallas_default
        from .pallas_sweep import choose_tile

        if self.F != 1 or getattr(self, "_pallas_broken", False):
            return 0
        if not _pallas_default():
            return 0
        return choose_tile(self.n_r + 1, self.n_q + 1)

    def _pallas_ok(self) -> bool:
        from .jax_modules import _pallas_default

        if getattr(self, "_pallas_broken", False):
            return False
        if not _pallas_default():
            return False
        # whole-state-resident kernel: stay well inside VMEM (seeds + out
        # are each (n_rows, F*3, Wq); subs add 3 more planes).  The limit
        # is set from device evidence, not the physical 128 MB: a runtime
        # VMEM overflow CRASHES the TPU worker (wedging the chip), it does
        # not error — 460x502 flankless (~9.2 MB here) is validated good,
        # 1001x1001 (~40 MB) kernel-faulted the worker (twin_1000_5ts,
        # TPU_SESSION_LOG).  Mosaic double-buffers in/out, so the true
        # footprint is a small multiple of this estimate.
        import os

        cap_mb = int(os.environ.get("TSALIGN_PALLAS_SWEEP_MAX_MB", "16"))
        bytes_needed = 4 * (self.n_r + 1) * (self.n_q + 1) * (6 * self.F + 4)
        return bytes_needed <= cap_mb * 2**20


@partial(jax.jit, static_argnames=("L", "R", "climb"))
def _sweep_jit(seeds, arrays, *, L, R, climb):
    F = L + R + 1
    n_q = arrays["p"][0].shape[1]

    xs = {
        "seed": jnp.moveaxis(seeds, 2, 0),  # (n_r+1, F, 3, n_q+1)
        "p_sub": arrays["p"][0],
        "p_do": arrays["p"][1],
        "p_de": arrays["p"][2],
        "l_sub": arrays["l"][0],
        "l_do": arrays["l"][1],
        "l_de": arrays["l"][2],
        "r_sub": arrays["r"][0],
        "r_do": arrays["r"][1],
        "r_de": arrays["r"][2],
    }
    ins = arrays["ins"]

    def diag_from(src, subrow):
        # src: (3, n_q+1); subrow: (n_q,) for this row
        any_g = jnp.min(src, axis=0)
        out = sat_add(any_g[:n_q], subrow)
        return jnp.concatenate([jnp.full((1,), DEV_INF, out.dtype), out])

    def del_from(src, do, de):
        open_src = jnp.minimum(src[GAP_NONE], src[GAP_INS])
        return jnp.minimum(sat_add(open_src, do), sat_add(src[GAP_DEL], de))

    def ins_from(src, name):
        io, ie = ins[name]
        open_src = jnp.minimum(src[GAP_NONE], src[GAP_DEL])
        o = sat_add(open_src[:n_q], io)
        e = sat_add(src[GAP_INS][:n_q], ie)
        pad = jnp.full((1,), DEV_INF, o.dtype)
        return jnp.concatenate([pad, o]), jnp.concatenate([pad, e])

    def row_step(prev, x):
        # prev: (F, 3, n_q+1) previous row (all-INF for the virtual row -1)
        rows = [None] * F
        tabs = {
            "primary": (x["p_sub"], x["p_do"], x["p_de"]),
            "left": (x["l_sub"], x["l_do"], x["l_de"]),
            "right": (x["r_sub"], x["r_do"], x["r_de"]),
        }
        for f in range(-R, L + 1):
            fi = f + R
            if (-R < f < 0) or (f == 0 and R > 0):
                climb_src, climb_tab = fi - 1, "right"
            elif f > 0 and climb:
                climb_src, climb_tab = fi - 1, "left"
            else:
                climb_src, climb_tab = None, None

            none_c = x["seed"][fi, GAP_NONE]
            del_c = x["seed"][fi, GAP_DEL]
            ins_c = x["seed"][fi, GAP_INS]

            if f == 0:
                none_c = jnp.minimum(none_c, diag_from(prev[fi], tabs["primary"][0]))
                del_c = jnp.minimum(
                    del_c, del_from(prev[fi], tabs["primary"][1], tabs["primary"][2])
                )
            if climb_src is not None:
                ct = tabs[climb_tab]
                none_c = jnp.minimum(none_c, diag_from(prev[climb_src], ct[0]))
                del_c = jnp.minimum(del_c, del_from(prev[climb_src], ct[1], ct[2]))

            if climb_src is not None:
                o, e = ins_from(rows[climb_src], climb_tab)
                ins_c = jnp.minimum(ins_c, jnp.minimum(o, e))

            if f == 0:
                io, ie = ins["primary"]
                open_src = jnp.minimum(none_c, del_c)
                open_c = sat_add(open_src[:n_q], io)
                pad = jnp.full((1,), DEV_INF, open_c.dtype)
                cand = jnp.minimum(ins_c, jnp.concatenate([pad, open_c]))
                ext_into = jnp.concatenate([pad, ie])
                ins_final = minplus_scan(cand, ext_into, axis=-1)
            else:
                ins_final = ins_c

            rows[fi] = jnp.stack(_ordered(none_c, ins_final, del_c))
        row = jnp.stack(rows)
        return row, row

    # Row-blocked scan: U rows per scan step (static inner unroll).  The
    # per-step fused region of a 1-row scan is tiny, so at 1000+ rows the
    # sweep wall is dominated by scan-step boundaries, not arithmetic;
    # blocking cuts the step count U-fold with identical integer ops.
    U = _sweep_unroll()
    n_rows = int(xs["seed"].shape[0])
    if U > 1 and n_rows > U:
        pad = (-n_rows) % U
        if pad:
            xs = jax.tree_util.tree_map(
                lambda a: jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], DEV_INF, a.dtype)]
                ),
                xs,
            )
        xs_blk = jax.tree_util.tree_map(
            lambda a: a.reshape((-1, U) + a.shape[1:]), xs
        )

        def body(prev, xblk):
            outs = []
            for u in range(U):
                x = jax.tree_util.tree_map(lambda a: a[u], xblk)
                prev, row = row_step(prev, x)
                outs.append(row)
            return prev, jnp.stack(outs)

        init = jnp.full((F, 3, n_q + 1), DEV_INF, jnp.int32)
        _, Mb = jax.lax.scan(body, init, xs_blk)
        M = Mb.reshape((-1,) + Mb.shape[2:])[:n_rows]
        return jnp.moveaxis(M, 0, 2)

    init = jnp.full((F, 3, n_q + 1), DEV_INF, jnp.int32)
    _, M = jax.lax.scan(row_step, init, xs)
    return jnp.moveaxis(M, 0, 2)  # (F, 3, n_r+1, n_q+1)


def _sweep_unroll() -> int:
    import os

    try:
        return max(1, int(os.environ.get("TSALIGN_SWEEP_UNROLL", "8")))
    except ValueError:
        return 8


def _ordered(none_c, ins_c, del_c):
    out = [None, None, None]
    out[GAP_NONE] = none_c
    out[GAP_INS] = ins_c
    out[GAP_DEL] = del_c
    return out


def _pad_table_for_poison(table):
    """Copy of a GapAffineCostTable with one extra INF row/column/entry so
    the poison padding char (index == alphabet size) prices as INF."""
    import copy

    t = copy.copy(table)
    t.substitution = np.pad(
        table.substitution, ((0, 1), (0, 1)), constant_values=INF
    )
    t.gap_open = np.pad(table.gap_open, (0, 1), constant_values=INF)
    t.gap_extend = np.pad(table.gap_extend, (0, 1), constant_values=INF)
    return t
