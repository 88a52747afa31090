"""Batched pair-level data parallelism over a device mesh.

The reference processes one pair per process (SURVEY.md §2.8: corpus-level
parallelism was done externally with shell scripts).  Here many pairs are
padded/bucketed into a batch and the wavefront DP runs vectorized over the
batch dimension, sharded across chips with `jax.sharding` — per-pair costs
come back with an implicit all-gather and batch statistics ride a psum.

This module provides the batched gap-affine core (the --no-ts path and the
building block of the chained long-sequence mode); the full TSM engine runs
per pair on top of it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TemplateSwitchConfig
from ..ops.jaxcommon import DEV_INF, minplus_scan, sat_add, to_device_costs

GAP_NONE, GAP_INS, GAP_DEL = 0, 1, 2


def encode_batch(alphabet, sequences, pad_to: Optional[int] = None) -> np.ndarray:
    """Encode a list of strings into a (B, L) int32 batch padded with -1."""
    arrs = [alphabet.encode(s.upper()) for s in sequences]
    L = pad_to or max((len(a) for a in arrs), default=0)
    out = np.full((len(arrs), L), -1, dtype=np.int32)
    for k, a in enumerate(arrs):
        out[k, : len(a)] = a
    return out


@partial(jax.jit, static_argnums=(0,))
def _batched_gap_affine(alpha_size: int, sub, go, ge, refs, qrys):
    """Batched gap-affine global alignment costs.

    sub: (A, A) int32 device costs; go/ge: (A,) open/extend vectors;
    refs: (B, NR) int32, -1 padded; qrys: (B, NQ) int32, -1 padded.
    Returns (B,) int32 costs (value at each pair's (len_r, len_q) corner).
    """
    B, NR = refs.shape
    NQ = qrys.shape[1]
    q_valid = qrys >= 0
    qc = jnp.clip(qrys, 0, alpha_size - 1)
    ins_open = jnp.where(q_valid, go[qc], DEV_INF)  # (B, NQ)
    ins_ext = jnp.where(q_valid, ge[qc], DEV_INF)
    pad1 = jnp.full((B, 1), DEV_INF, jnp.int32)

    def row_chain(none_c, del_c, ins_cand):
        open_src = jnp.minimum(none_c, del_c)
        open_c = jnp.concatenate([pad1, sat_add(open_src[:, :-1], ins_open)], axis=1)
        cand = jnp.minimum(ins_cand, open_c)
        ext_into = jnp.concatenate([pad1, ins_ext], axis=1)
        return minplus_scan(cand, ext_into, axis=-1)

    # row 0
    none0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.full((B, NQ), DEV_INF, jnp.int32)], axis=1
    )
    del0 = jnp.full((B, NQ + 1), DEV_INF, jnp.int32)
    ins0 = row_chain(none0, del0, jnp.full((B, NQ + 1), DEV_INF, jnp.int32))

    r_valid = refs >= 0
    rc = jnp.clip(refs, 0, alpha_size - 1)
    # per-row, per-batch tables
    subrow_all = jnp.where(
        (r_valid[:, :, None] & q_valid[:, None, :]),
        sub[rc[:, :, None], qc[:, None, :]],
        DEV_INF,
    )  # (B, NR, NQ)
    del_open_all = jnp.where(r_valid, go[rc], DEV_INF)  # (B, NR)
    del_ext_all = jnp.where(r_valid, ge[rc], DEV_INF)

    xs = (
        jnp.moveaxis(subrow_all, 1, 0),
        jnp.moveaxis(del_open_all, 1, 0),
        jnp.moveaxis(del_ext_all, 1, 0),
    )
    # Each pair reads its cost at its own (len_r, len_q) corner, so collect
    # per-row corner values at column len_q and gather row len_r at the end.
    len_q = jnp.sum(q_valid, axis=1)  # (B,)
    len_r = jnp.sum(r_valid, axis=1)

    def body2(carry, x):
        i, none_p, ins_p, del_p = carry
        subrow, dopen, dext = x
        any_p = jnp.minimum(jnp.minimum(none_p, ins_p), del_p)
        none_c = jnp.concatenate([pad1, sat_add(any_p[:, :-1], subrow)], axis=1)
        open_src = jnp.minimum(none_p, ins_p)
        del_c = jnp.minimum(
            sat_add(open_src, dopen[:, None]), sat_add(del_p, dext[:, None])
        )
        ins_c = row_chain(none_c, del_c, jnp.full((B, NQ + 1), DEV_INF, jnp.int32))
        corner = jnp.min(
            jnp.stack(
                [
                    jnp.take_along_axis(none_c, len_q[:, None], axis=1)[:, 0],
                    jnp.take_along_axis(ins_c, len_q[:, None], axis=1)[:, 0],
                    jnp.take_along_axis(del_c, len_q[:, None], axis=1)[:, 0],
                ]
            ),
            axis=0,
        )
        return (i + 1, none_c, ins_c, del_c), corner

    corner0 = jnp.min(
        jnp.stack(
            [
                jnp.take_along_axis(none0, len_q[:, None], axis=1)[:, 0],
                jnp.take_along_axis(ins0, len_q[:, None], axis=1)[:, 0],
                jnp.take_along_axis(del0, len_q[:, None], axis=1)[:, 0],
            ]
        ),
        axis=0,
    )
    (_, _, _, _), corners = jax.lax.scan(body2, (1, none0, ins0, del0), xs)
    corners = jnp.concatenate([corner0[None], corners], axis=0)  # (NR+1, B)
    return jnp.take_along_axis(corners, len_r[None, :], axis=0)[0]


class BatchedGapAffine:
    """Host wrapper: config -> device tables; sharded batched execution."""

    def __init__(self, config: TemplateSwitchConfig):
        self.config = config
        t = config.primary_edit_costs
        self.sub = jnp.asarray(to_device_costs(t.substitution))
        self.go = jnp.asarray(to_device_costs(t.gap_open))
        self.ge = jnp.asarray(to_device_costs(t.gap_extend))
        self.A = config.alphabet.size

    def costs(self, refs: np.ndarray, qrys: np.ndarray) -> np.ndarray:
        out = _batched_gap_affine(
            self.A, self.sub, self.go, self.ge, jnp.asarray(refs), jnp.asarray(qrys)
        )
        return np.asarray(out)

    def sharded_step(self, mesh, refs, qrys):
        """One data-parallel step over `mesh` (axis "data"): per-pair costs
        plus the batch-mean cost (an all-reduce across shards)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data", None))
        refs_d = jax.device_put(jnp.asarray(refs), shard)
        qrys_d = jax.device_put(jnp.asarray(qrys), shard)

        @partial(jax.jit, static_argnums=(0,), out_shardings=None)
        def step(alpha, sub, go, ge, r, q):
            c = _batched_gap_affine(alpha, sub, go, ge, r, q)
            return c, jnp.mean(c.astype(jnp.float32))

        return step(self.A, self.sub, self.go, self.ge, refs_d, qrys_d)
