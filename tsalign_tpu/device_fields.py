"""On-demand tile views of device-resident engine fields for the traceback.

The host traceback (traceback.py) reads only O(path length) scattered cells
of the per-round primary fields M_k (F, 3, n_r+1, n_q+1), single cells of
the reentry fields R_k, and the per-round entry layers (which the round
loop already transfers as summaries).  Materializing the full fields on the
host — the reference's backtracking walks its closed list in host memory,
a_star_aligner.rs:58-161, but our fields live in device HBM — costs one
full (F, 3, n, n) transfer per round.  These views keep the fields on
device and fetch fixed-size tiles lazily through ONE jitted dynamic-slice
program per field shape (traced tile origins, so every fetch reuses the
same compiled program; plain dynamic_slice at traced scalar starts is the
one indexing pattern proven safe on the remote-relay TPU environment —
see CLAUDE.md / ops/jax_modules.py on the gather fault class).

A view quacks like the numpy array the traceback expects:
  * ``view[:, :, i, j]``      -> (F, 3) int64 host slab
  * ``view[fi, g, i, j]``     -> int64 host scalar
  * ``view.entry_cells()``    -> the round's entry layer (min over gap types
                                  of the top flank layer), served from the
                                  summary the round loop already transferred
  * 2-D views: ``view[i, j]`` -> int64 host scalar
All values come back in the host int64 cost domain (INF restored).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from .ops.jaxcommon import from_device_costs

_TILE = 64

# Per-fetch transfer budget.  Each tile fetch is one relay RPC round trip
# with fixed latency that dwarfs the per-byte cost at these sizes, so the
# right tile is the LARGEST one within a sane transfer budget — at heli
# shapes (F=1, n~500) a single fetch covers the whole field, and the
# round-4 52 s record wall (dozens of 64x64 fetches per round) collapses
# to one fetch per consulted field.
_FETCH_BUDGET_BYTES = 8 << 20


def _auto_tile(shape, rows: int, cols: int, itemsize: int = 4) -> int:
    """Largest power-of-two tile whose fetch (leading axes x tile^2) stays
    within the transfer budget, clamped to [_TILE, 1024]."""
    leading = 1
    for d in shape[:-2]:
        leading *= int(d)
    t = _TILE
    while (
        t < 1024
        and t < max(rows, cols)
        and leading * (2 * t) * (2 * t) * itemsize <= _FETCH_BUDGET_BYTES
    ):
        t *= 2
    return t


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch4(M, i0, j0, *, ti, tj):
    return jax.lax.dynamic_slice(
        M, (0, 0, i0, j0), (M.shape[0], M.shape[1], ti, tj)
    )


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch2(R, i0, j0, *, ti, tj):
    return jax.lax.dynamic_slice(R, (i0, j0), (ti, tj))


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch4_b(M, b, i0, j0, *, ti, tj):
    """Batched-field variant: one pair's tile out of a stacked
    (B, F, 3, R, Q) field, all indices traced (one compile per bucket)."""
    return jax.lax.dynamic_slice(
        M, (b, 0, 0, i0, j0), (1, M.shape[1], M.shape[2], ti, tj)
    )[0]


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch2_b(R, b, i0, j0, *, ti, tj):
    return jax.lax.dynamic_slice(R, (b, i0, j0), (1, ti, tj))[0]


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch4_rb(M, r, b, i0, j0, *, ti, tj):
    """Fused-loop variant: one (round, pair) tile out of the stacked
    (maxR, B, F, 3, R, Q) round buffer (parallel/fused_rounds.py)."""
    return jax.lax.dynamic_slice(
        M, (r, b, 0, 0, i0, j0), (1, 1, M.shape[2], M.shape[3], ti, tj)
    )[0, 0]


@partial(jax.jit, static_argnames=("ti", "tj"))
def _fetch2_rb(R, r, b, i0, j0, *, ti, tj):
    return jax.lax.dynamic_slice(R, (r, b, i0, j0), (1, 1, ti, tj))[0, 0]


@jax.jit
def _fetch_layer_rb(E_all, r, b):
    """One (round, pair) entry layer out of the fused loop's stacked
    (maxR, B, R, Q) buffer."""
    return jax.lax.dynamic_slice(
        E_all, (r, b, 0, 0), (1, 1, E_all.shape[2], E_all.shape[3])
    )[0, 0]


class _FusedEntryLayer:
    """Lazy entry-layer fetch for fused-loop device views: transfers one
    (n_r+1, n_q+1) layer on first use, through one shared jitted program."""

    def __init__(self, E_all, r: int, b: int):
        self._E_all, self._r, self._b = E_all, r, b
        self._host: Optional[np.ndarray] = None

    def __call__(self) -> np.ndarray:
        if self._host is None:
            self._host = from_device_costs(
                np.asarray(_fetch_layer_rb(self._E_all, self._r, self._b))
            )
        return self._host


class _TileBase:
    """Tile cache over the trailing two (cell) axes of a device array."""

    def __init__(self, dev, rows: int, cols: int, tile: int = _TILE):
        self._dev = dev
        self._rows, self._cols = rows, cols
        self._ti = min(tile, rows)
        self._tj = min(tile, cols)
        self._tiles: dict = {}

    def _fetch(self, i0: int, j0: int):  # pragma: no cover - overridden
        raise NotImplementedError

    def _tile_for(self, i: int, j: int):
        ti, tj = self._ti, self._tj
        i0 = min((i // ti) * ti, self._rows - ti)
        j0 = min((j // tj) * tj, self._cols - tj)
        t = self._tiles.get((i0, j0))
        if t is None:
            t = from_device_costs(np.asarray(self._fetch(i0, j0)))
            self._tiles[(i0, j0)] = t
        return t, i0, j0


class DeviceField4(_TileBase):
    """Lazy view of one round's primary field (F, 3, n_r+1, n_q+1)."""

    def __init__(self, dev, entry_cells=None,
                 batch_index: Optional[int] = None,
                 tile: Optional[int] = None,
                 rb: Optional[tuple] = None):
        if tile is None:
            # Batched/fused fields fetch one pair's tile, so the leading
            # batch/round axes do not count toward the transfer budget.
            lead = 2 if rb is not None else (1 if batch_index is not None else 0)
            eff = dev.shape[lead:]
            tile = _auto_tile(eff, dev.shape[-2], dev.shape[-1])
        super().__init__(dev, dev.shape[-2], dev.shape[-1], tile)
        # entry_cells: host array, or a lazy callable (_FusedEntryLayer)
        self._entry = entry_cells
        self._b = batch_index
        self._rb = rb
        self.shape = tuple(dev.shape[-4:])

    def _fetch(self, i0, j0):
        if self._rb is not None:
            return _fetch4_rb(
                self._dev, *self._rb, i0, j0, ti=self._ti, tj=self._tj
            )
        if self._b is None:
            return _fetch4(self._dev, i0, j0, ti=self._ti, tj=self._tj)
        return _fetch4_b(
            self._dev, self._b, i0, j0, ti=self._ti, tj=self._tj
        )

    def __getitem__(self, idx):
        fi, g, i, j = idx
        t, i0, j0 = self._tile_for(int(i), int(j))
        return t[fi, g, int(i) - i0, int(j) - j0]

    def entry_cells(self) -> np.ndarray:
        """The round's entry layer ``M[-1].min(axis=0)`` in host int64.
        Served from the stored round-loop summary when available (no device
        work), or lazily through the fused-loop layer fetcher; falls back
        to a device reduction over the top flank layer."""
        if callable(self._entry):
            self._entry = self._entry()
        if self._entry is None:
            top = (
                self._dev[-1] if self._b is None else self._dev[self._b, -1]
            )
            self._entry = from_device_costs(np.asarray(top)).min(axis=0)
        return self._entry


class DeviceField2(_TileBase):
    """Lazy view of one round's reentry field (n_r+1, n_q+1)."""

    def __init__(self, dev, batch_index: Optional[int] = None,
                 tile: Optional[int] = None,
                 rb: Optional[tuple] = None):
        if tile is None:
            lead = 2 if rb is not None else (1 if batch_index is not None else 0)
            eff = dev.shape[lead:]
            tile = _auto_tile(eff, dev.shape[-2], dev.shape[-1])
        super().__init__(dev, dev.shape[-2], dev.shape[-1], tile)
        self._b = batch_index
        self._rb = rb
        self.shape = tuple(dev.shape[-2:])

    def _fetch(self, i0, j0):
        if self._rb is not None:
            return _fetch2_rb(
                self._dev, *self._rb, i0, j0, ti=self._ti, tj=self._tj
            )
        if self._b is None:
            return _fetch2(self._dev, i0, j0, ti=self._ti, tj=self._tj)
        return _fetch2_b(
            self._dev, self._b, i0, j0, ti=self._ti, tj=self._tj
        )

    def __getitem__(self, idx):
        i, j = idx
        t, i0, j0 = self._tile_for(int(i), int(j))
        return t[int(i) - i0, int(j) - j0]


def entry_cells_of(M) -> np.ndarray:
    """Entry layer of a primary field: works for host numpy fields and the
    lazy device views alike (the traceback's one whole-layer read)."""
    if hasattr(M, "entry_cells"):
        return M.entry_cells()
    return M[-1].min(axis=0)
