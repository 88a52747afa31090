"""Batched template-switch alignment: many pairs per device dispatch.

The corpus-level throughput path (the reference ran one pair per process
and left corpus parallelism to external scripts — alignment_result.rs:71-81,
SURVEY.md §2.8): pairs are padded to one poison-char bucket, their per-pair
tables stacked, and the single-pair jitted kernels (ops/jax_primary,
ops/jax_modules) vmapped over the batch dimension.  The rounds loop runs to
a shared round count derived from the exact per-round TSM-cost bound, so
every pair's optimum is covered.

Chunk-level cost pruning is intentionally skipped here (it is per-pair,
data-dependent): this path trades it for batch parallelism.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TemplateSwitchConfig
from ..costs import INF
from ..engine import min_tsm_cost_bound
from ..geometry import AlignmentRange
from ..ops.jax_primary import JaxPrimarySweep, _sweep_jit
from ..ops.jax_modules import JaxKindModule, _kind_all_chunks, _same_module_jit
from ..ops.jaxcommon import DEV_INF, to_device_costs
from ..ops.primary_sweep import GAP_NONE


def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b


class BatchedTSAligner:
    """Cost-only batched TS alignment over equal-bucket pairs."""

    def __init__(
        self,
        config: TemplateSwitchConfig,
        pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
        max_rounds: int = 8,
        chunk: int = 64,
    ):
        self.config = config
        self.n_pairs = len(pairs)
        P = config.alphabet.size
        nr = _bucket(max(len(r) for r, _ in pairs))
        nq = _bucket(max(len(q) for _, q in pairs))
        self.nr, self.nq = nr, nq
        self.real = [(len(r), len(q)) for r, q in pairs]
        self.refs = np.full((self.n_pairs, nr), P, dtype=np.int8)
        self.qrys = np.full((self.n_pairs, nq), P, dtype=np.int8)
        for i, (r, q) in enumerate(pairs):
            self.refs[i, : len(r)] = r
            self.qrys[i, : len(q)] = q
        self.max_rounds = max_rounds
        self.chunk = chunk

        # Per-pair single-pair machinery (host precompute per pair), with
        # identical statics across the batch thanks to the shared bucket.
        self.sweeps = [
            JaxPrimarySweep(config, self.refs[i], self.qrys[i])
            for i in range(self.n_pairs)
        ]
        budget = None  # full windows (no per-pair C0 available pre-sweep)
        self.kind_sets = []
        for i in range(self.n_pairs):
            from ..ops.tsm_modules import make_kind_spec

            kinds = []
            for pk in (0, 1):
                for sk in (0, 1):
                    for dk in (0, 1):
                        spec = make_kind_spec(
                            config, nr, nq, pk, sk, dk, sdel_budget=64
                        )
                        if spec is None:
                            continue
                        km = JaxKindModule(
                            spec,
                            config,
                            self.refs[i],
                            self.qrys[i],
                            0,
                            nq if pk == 0 else nr,
                            chunk=self.chunk,
                        )
                        if km.active:
                            kinds.append(km)
            self.kind_sets.append(kinds)

    def costs(self, mesh=None) -> np.ndarray:
        """Optimal TS alignment cost per pair (int64, INF when unreachable).

        With `mesh` (a jax.sharding.Mesh with axis "data"), the batch
        dimension of every stacked array is sharded across the mesh; the
        vmapped kernels then run SPMD with XLA inserting the collectives.
        """
        B = self.n_pairs
        shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def shard(x):
                spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

        F = self.config.left_flank_length + self.config.right_flank_length + 1

        # stacked sweep inputs
        def stack_sweep_arrays():
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

        arrays_b = stack_sweep_arrays()
        if shard is not None:
            arrays_b = jax.tree_util.tree_map(shard, arrays_b)
        sweep_v = jax.vmap(
            lambda seeds, arrays: _sweep_jit(
                seeds, arrays, L=self.config.left_flank_length,
                R=self.config.right_flank_length, climb=True
            )
        )

        seeds0 = np.full((B, F, 3, self.nr + 1, self.nq + 1), INF, dtype=np.int64)
        for i in range(B):
            seeds0[i, self.config.right_flank_length, GAP_NONE, 0, 0] = 0
        seeds = jnp.asarray(to_device_costs(seeds0))
        if shard is not None:
            seeds = shard(seeds)

        M = sweep_v(seeds, arrays_b)
        M_host = np.asarray(M)
        best = self._targets(M_host)

        delta = min_tsm_cost_bound(self.config)
        rounds = self.max_rounds
        if delta > 0:
            finite = [b for b in best if b < INF]
            if finite:
                rounds = min(rounds, max(1, max(finite) // delta + 1))

        # group kinds by static snapshot so each vmapped call covers the batch
        kind_count = len(self.kind_sets[0])
        for k in range(1, rounds + 1):
            R_cells = np.full(
                (B, self.nr + 1, self.nq + 1), int(DEV_INF), np.int32
            )
            A_cells = M_host[:, -1].min(axis=1).astype(np.int32)
            for ki in range(kind_count):
                kms = [ks[ki] for ks in self.kind_sets]
                km0 = kms[0]
                spec = km0.spec
                A_mod = A_cells if spec.pk == 0 else A_cells.transpose(0, 2, 1)
                n_anti = spec.n_anti
                C = km0.chunk
                n_e = n_anti + 1
                PAD = max(0, -km0.s_lo)
                width = PAD + n_anti + 1 + max(0, C - 1 + km0.s_hi)
                Rk_pad0 = jnp.full(
                    (B, spec.n_p + 1, width), DEV_INF, jnp.int32
                )
                fixed_b = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *[km._fixed for km in kms]
                )
                e_bases = jnp.asarray(
                    [
                        np.int32(min(e0, n_e - C) if n_e >= C else 0)
                        for e0 in range(0, n_e, C)
                    ],
                    jnp.int32,
                )
                if spec.same_seq:
                    B_pre = jax.vmap(
                        lambda f: _same_module_jit(f, st=km0._static)
                    )(fixed_b)
                else:
                    B_pre = jnp.zeros((B, 1, 1), jnp.int32)
                step = jax.vmap(
                    lambda a, rk, f, bp: _kind_all_chunks(
                        a, rk, f, e_bases, bp, st=km0._static, PAD=PAD
                    )
                )
                Rk_pad = step(
                    jnp.asarray(np.ascontiguousarray(A_mod)), Rk_pad0, fixed_b, B_pre
                )
                Rk = np.array(Rk_pad)[:, :, PAD : PAD + n_anti + 1]
                Rk[:, :, n_anti] = int(DEV_INF)
                if spec.pk == 1:
                    Rk = Rk.transpose(0, 2, 1)
                np.minimum(R_cells, Rk, out=R_cells)
            seeds_k = np.full_like(seeds0, INF)
            seeds_k = np.minimum(seeds_k, seeds0)
            sk = np.asarray(to_device_costs(seeds_k))
            sk[:, 0, GAP_NONE] = np.minimum(sk[:, 0, GAP_NONE], R_cells)
            M_next = sweep_v(jnp.asarray(sk), arrays_b)
            M_next_host = np.asarray(M_next)
            new_best = self._targets(M_next_host)
            if np.array_equal(M_next_host, M_host):
                best = new_best
                break
            M_host = M_next_host
            best = [min(a, b) for a, b in zip(best, new_best)]
        return np.asarray(best, dtype=np.int64)

    def _targets(self, M_host: np.ndarray) -> List[int]:
        out = []
        for i, (lr, lq) in enumerate(self.real):
            v = int(M_host[i, :, :, lr, lq].min())
            out.append(INF if v >= int(DEV_INF) // 2 else v)
        return out
