"""Shared device-side primitives for the int32 saturating (min,+) algebra.

All device DP state is int32.  Host costs (exact Python ints with INF = 2^62)
are clamped to DEV_INF = 2^30 - 1; any device value >= DEV_INF_THRESH is
"infinite".  Single additions of two in-range values cannot overflow int32
(2 * (2^30 - 1) < 2^31 - 1); every add is immediately re-clamped to DEV_INF.

The within-row / within-level gap chains D[t] = min(C[t], D[t-1] + e[t]) are
solved with `jax.lax.associative_scan` over the (min,+) affine maps
f(x) = min(C, x + e); composition keeps the pair representation closed:
(C, e) o (C', e') = (min(C', C + e'), e + e') (clamped).  This is the exact
log-depth analog of the prefix-sum trick used by the numpy engine
(ops/primary_sweep.py min_plus_scan).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..costs import INF

# TSALIGN_SYNC_DEBUG=1: block after every device dispatch and log it, so a
# TPU worker fault is attributed to the exact program that raised it instead
# of surfacing at the next transfer (dispatch is async).  Debug-only: the
# syncs serialize the pipelined kind launches.
SYNC_DEBUG = bool(os.environ.get("TSALIGN_SYNC_DEBUG"))


def sync_point(x, what: str):
    """Block on `x` and log when TSALIGN_SYNC_DEBUG is set; identity otherwise."""
    if SYNC_DEBUG:
        import time

        t0 = time.monotonic()
        jax.block_until_ready(x)
        print(f"[sync] ok: {what} ({time.monotonic() - t0:.2f}s)", flush=True)
    return x

DEV_INF = np.int32(2**30 - 1)
# Values at or above this are treated as infinite when mapping back to host.
DEV_INF_THRESH = np.int32(2**29)

I32 = jnp.int32


def to_device_costs(x: np.ndarray) -> np.ndarray:
    """Clamp host int64 costs (INF = 2^62) into the int32 device algebra."""
    x = np.asarray(x, dtype=np.int64)
    return np.minimum(x, int(DEV_INF)).astype(np.int32)


def from_device_costs(x: np.ndarray) -> np.ndarray:
    """Map device int32 costs back to host int64 with INF restored."""
    x = np.asarray(x, dtype=np.int64)
    return np.where(x >= int(DEV_INF_THRESH), INF, x)


def validate_magnitudes(max_finite_cost: int, path_length: int) -> None:
    """The int32 algebra is exact while every finite path cost stays below
    DEV_INF_THRESH.  Raise early if a config/sequence combination could
    overflow (fall back to the numpy engine in that case)."""
    if max_finite_cost * max(path_length, 1) >= int(DEV_INF_THRESH):
        raise OverflowError(
            f"cost magnitudes too large for the int32 device algebra: "
            f"{max_finite_cost} * {path_length} >= {int(DEV_INF_THRESH)}"
        )


def sat_add(a, b):
    return jnp.minimum(a + b, DEV_INF)


def sat_add3(a, b, c):
    return jnp.minimum(jnp.minimum(a + b, DEV_INF) + c, DEV_INF)


def minplus_scan(cand, ext, axis: int = -1, reverse: bool = False):
    """Solve D[t] = min(cand[t], D[t-1] + ext[t]) along `axis` (log depth).

    ext[t] is the cost of the chain edge INTO position t.  With reverse=True
    the recurrence runs from the other end (D[t] = min(cand[t], D[t+1]+ext[t]))
    with ext[t] then being the edge into t from t+1.
    """

    def combine(left, right):
        c_l, e_l = left
        c_r, e_r = right
        c = jnp.minimum(c_r, jnp.minimum(c_l + e_r, DEV_INF))
        e = jnp.minimum(e_l + e_r, DEV_INF)
        return c, e

    axis = axis % cand.ndim
    c, _ = jax.lax.associative_scan(
        combine, (cand, ext), axis=axis, reverse=reverse
    )
    return c


def cummin(x, axis: int = -1, reverse: bool = False):
    return jax.lax.associative_scan(jnp.minimum, x, axis=axis % x.ndim, reverse=reverse)


def sliding_min_start(x, w: int, axis: int = -1):
    """y[t] = min(x[t], ..., x[t + w - 1]) along `axis` (same length; windows
    running off the end use INF padding).  Classic two-pass block algorithm."""
    if w <= 1:
        return x
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    nb = -(-n // w)
    pad = nb * w - n
    xp = jnp.concatenate(
        [x, jnp.full(x.shape[:-1] + (pad + w,), DEV_INF, x.dtype)], axis=-1
    )
    blocks = xp.reshape(xp.shape[:-1] + (nb + 1, w))
    suf = cummin(blocks, axis=-1, reverse=True).reshape(xp.shape)
    pre = cummin(blocks, axis=-1).reshape(xp.shape)
    y = jnp.minimum(suf[..., :n], pre[..., w - 1 : w - 1 + n])
    return jnp.moveaxis(y, -1, axis)


def build_sparse_table(x, max_w: int):
    """Power-of-two windowed mins m[k][..., t] = min over [t, t + 2^k) along
    the last axis.  Returns a list of arrays (same shape as x)."""
    tables = [x]
    k = 1
    while (1 << k) <= max_w:
        prev = tables[-1]
        shift = 1 << (k - 1)
        shifted = jnp.concatenate(
            [prev[..., shift:], jnp.full(prev.shape[:-1] + (shift,), DEV_INF, prev.dtype)],
            axis=-1,
        )
        tables.append(jnp.minimum(prev, shifted))
        k += 1
    return tables
