"""Direct equality test for the compact-column reentry launch.

The round loop picks between two routes per kind: the chunked whole-field
scan (_kind_all_chunks) and the compacted-column pipeline (_launch_compact,
device-side gather of the live entry columns).  Both must produce the same
reentry slab for the same entry field; this pins it directly with a sparse
field (a handful of live columns scattered across chunks — the shape that
selects the compact route in production).
"""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.jax_engine import JaxAligner
from tsalign_tpu.ops.jaxcommon import DEV_INF

from util import related_pair_scaled


def _mid_aligner(seed=3, n=60):
    from tsalign_tpu.config import TemplateSwitchConfig

    rng = np.random.default_rng(seed)
    al = get_alphabet("dna")
    # The default config keeps all 8 kinds active (finite base costs and
    # windows); the pair carries a planted RC stretch so entries are live.
    cfg = TemplateSwitchConfig.default(al)
    ref, qry = related_pair_scaled(rng, al, n, 8)
    ja = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False)
    return ja


@pytest.mark.parametrize("seed", [3, 4])
def test_compact_route_equals_chunked_route(seed):
    import jax.numpy as jnp

    from tsalign_tpu.ops.jax_modules import _kind_all_chunks, _same_module_jit

    ja = _mid_aligner(seed)
    root = np.asarray(ja._sweep_host(
        np.asarray(__import__("tsalign_tpu.ops.jaxcommon", fromlist=["to_device_costs"]).to_device_costs(ja._root_seeds_host())), True
    ))
    M = root
    best = ja._target_cost(M)
    if best >= 2**62:
        pytest.skip("no finite alignment for this seed")
    # Loosen the incumbent so kinds stay active and entry pruning keeps
    # plenty of live columns — this test exercises launch plumbing, not
    # the pruning thresholds.
    best = best + 40
    budget = ja._sdel_budget(best)
    ja._last_budget = budget
    kinds = ja._build_kinds(budget)
    if not kinds:
        pytest.skip("no active kinds for this seed")
    A = ja._pruned_entry(M, best)

    for km in kinds:
        spec = km.spec
        A_mod = A if spec.pk == 0 else A.T
        n_e = spec.n_anti + 1
        C = km.chunk
        if n_e < C:
            A_mod = np.pad(
                A_mod, ((0, 0), (0, C - n_e)), constant_values=int(DEV_INF)
            )
        # Sparsify: keep at most 3 live columns spread across the range.
        live_cols = [c for c in range(n_e) if A_mod[:, c].min() < int(DEV_INF)]
        if not live_cols:
            continue
        keep = live_cols[:: max(1, len(live_cols) // 3)][:3]
        A_sparse = np.full_like(A_mod, int(DEV_INF))
        A_sparse[:, keep] = A_mod[:, keep]

        if spec.same_seq:
            if getattr(km, "_b_pre_cache", None) is None:
                km._b_pre_cache = _same_module_jit(km._fixed, st=km._static)
            B_pre = km._b_pre_cache
        else:
            B_pre = jnp.zeros((1, 1), jnp.int32)

        # Chunked route over the full sparse field.
        PAD = max(0, -km.s_lo)
        width = PAD + spec.n_anti + 1 + max(0, C - 1 + km.s_hi)
        Rk_pad0 = jnp.full((spec.n_p + 1, width), DEV_INF, jnp.int32)
        bases = [
            np.int32(min(e0, n_e - C) if n_e >= C else 0)
            for e0 in range(0, n_e, C)
        ]
        chunked = np.array(
            _kind_all_chunks(
                jnp.asarray(np.ascontiguousarray(A_sparse)),
                Rk_pad0,
                km._fixed,
                jnp.asarray(bases, jnp.int32),
                B_pre,
                st=km._static,
                PAD=PAD,
            )
        )[:, PAD : PAD + spec.n_anti + 1]

        # Compact route with device-side gather.
        e_live = np.asarray(keep, dtype=np.int64)
        Kb = C
        while Kb < e_live.size:
            Kb *= 2
        sel = ja._launch_compact(km, A_sparse, e_live, Kb, B_pre)
        compact = ja._fold_compact(km, sel, e_live)

        np.testing.assert_array_equal(
            compact, chunked,
            err_msg=f"kind pk={spec.pk} sk={spec.sk} dk={spec.dk}",
        )
