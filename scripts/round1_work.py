"""Estimate per-round module work for the heli headline case (CPU host logic).

Runs the round-0 primary sweep on the CPU backend, applies the TSLB entry
pruning exactly as the device engine would, and prints per-kind live-column
counts and estimated module-scan adds for round 1 — the data needed to
decide where the remaining device wall time goes.

Usage: env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/round1_work.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import tomllib

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.costs import INF
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.jax_engine import JaxAligner
    from tsalign_tpu.postprocess import _advance
    from tsalign_tpu.result import AlignmentResult

    golden = "/root/reference/test_files/twin_heli_MDC1-AS1_10.toml"
    with open(golden, "rb") as f:
        g = tomllib.load(f)
    al = get_alphabet("dna-n")
    cfg0 = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/experiments/config.tsa", al
    )
    ref = al.encode(g["sequences"]["reference"].upper())
    qry = al.encode(g["sequences"]["query"].upper())
    rec = AlignmentResult.from_toml(open(golden).read())
    ro, qo = rec.reference_offset, rec.query_offset
    rl, ql = _advance(ro, qo, rec.alignment.entries)
    rng = AlignmentRange(ro, qo, rl, ql)

    # K-scaled config exactly as aligner._run_engine does
    K = 1
    while K <= len(ref) + len(qry) + 2:
        K *= 2
    cfg = cfg0.scaled_for_length_tiebreak(K)

    eng = JaxAligner(cfg, ref, qry, range_=rng, chunk=128, keep_fields=False)
    t0 = time.time()
    seeds = eng._root_seeds_host()
    from tsalign_tpu.ops.jaxcommon import to_device_costs

    entry, tcost, _, _ = eng._sweep_summary(to_device_costs(seeds), climb=False)
    best = tcost
    print(f"round-0 sweep {time.time()-t0:.1f}s best(no-TS)={best} (/K={best/K:.1f})")

    t0 = time.time()
    A = eng._pruned_entry_cells(entry, best)
    print(f"prune {time.time()-t0:.1f}s")
    lb = eng._remaining_bound()
    from tsalign_tpu.ops.jaxcommon import DEV_INF

    AS = np.where(
        (A.astype(np.int64) < int(DEV_INF) // 2) & (lb.S < INF),
        A.astype(np.int64) + lb.S,
        INF,
    )
    kinds = eng._build_kinds(eng._sdel_budget(best))
    total_adds = 0
    for km in kinds:
        st = km._static
        spec = km.spec
        AS_mod = AS if spec.pk == 0 else AS.T
        col_live = AS_mod.min(axis=0) <= best
        n_live = int(col_live.sum())
        C = st.chunk
        n_e = spec.n_anti + 1
        live_chunks = {min(e // C * C, max(n_e - C, 0)) for e in np.nonzero(col_live)[0]}
        # module scan adds: chunks x L levels x (n_p+1) x C x W
        adds = len(live_chunks) * st.L * (st.n_p + 1) * C * st.W
        total_adds += adds
        print(
            f"kind pk={spec.pk} sk={spec.sk} dk={spec.dk} same={st.same_seq} "
            f"live_cols={n_live}/{n_e} chunks={len(live_chunks)} "
            f"L={st.L} W={st.W} C={C} scan_adds={adds/1e9:.2f}G"
        )
    print(f"TOTAL round-1 module scan adds: {total_adds/1e9:.1f}G cell-updates")


if __name__ == "__main__":
    main()
