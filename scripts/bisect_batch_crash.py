#!/usr/bin/env python
"""Step-wise on-device bisect of the batched-bucket TPU worker crash.

The instrumented repro (TSALIGN_SYNC_DEBUG) attributed the fault to the
first kind launch of the batched reentry: either the vmapped same-seq
module scan (B_pre, dispatched asynchronously by _build_kind_sets) or the
vmapped chunked assembly (_kind_all_chunks).  Each invocation of this
script runs exactly ONE device program of that pipeline and prints
"STEP <name> OK" — run the steps in order in fresh processes and the first
crash identifies the program.  A TPU worker crash wedges the chip for tens
of minutes, so steps are one-per-process, cheapest-information-first.

Usage: TSALIGN_NO_PALLAS=1 python scripts/bisect_batch_crash.py STEP
  probe       tiny device op (chip health)
  bpre        vmapped _same_module_jit for kind pk=0 sk=0 dk=0
  chunks      vmapped _kind_all_chunks for kind 000 (padded assembly)
  chunks1     same, batch of 1 pair (vmap-of-1)
  unpadded    kind 000 chunks with real lengths == bucket (static plans,
              no _assembly_positive_traced)
  cross       vmapped _kind_all_chunks for the first cross kind (010)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP = sys.argv[1] if len(sys.argv) > 1 else "probe"
N_PAIRS = int(os.environ.get("BISECT_PAIRS", "8"))


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if STEP == "probe":
        x = jnp.arange(8) + 1
        log(f"probe sum={int(x.sum())}")
        log("STEP probe OK")
        return

    import bench
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner
    from tsalign_tpu.ops.jax_modules import _kind_all_chunks, _same_module_jit
    from tsalign_tpu.ops.jaxcommon import DEV_INF

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    pairs = []
    for name in bench.THROUGHPUT_PAIRS[:N_PAIRS]:
        r, qy = parse_pair_fasta_file(f"/root/reference/test_files/{name}.fa")
        pairs.append(
            (al.encode(r.sequence.upper()), al.encode(qy.sequence.upper()))
        )
    if STEP == "chunks1":
        pairs = pairs[:1]
    if STEP == "unpadded":
        # Extend every sequence with real bases to the bucket size so
        # real lengths == padded lengths -> static (unpadded) assembly.
        rng = np.random.default_rng(0)
        ext = []
        for r, q in pairs:
            r2 = np.concatenate([r, rng.integers(0, 4, 256 - len(r)).astype(r.dtype)])
            q2 = np.concatenate([q, rng.integers(0, 4, 256 - len(q)).astype(q.dtype)])
            ext.append((r2, q2))
        pairs = ext

    bt = BatchedTSAligner(
        cfg, pairs, chunk=int(os.environ.get("BISECT_CHUNK", "64"))
    )
    log(f"bucket nr={bt.nr} nq={bt.nq} B={bt.n_pairs} chunk={bt.chunk}")

    if os.environ.get("BISECT_SWEEP_FIRST"):
        # Reproduce the repro's program sequence: compile+run the vmapped
        # sweep (and optionally the summary) in this process first.
        from tsalign_tpu.parallel.batch_ts import _summ_batch_jit
        from tsalign_tpu.ops.jax_primary import _sweep_jit
        from tsalign_tpu.ops.primary_sweep import GAP_NONE
        from tsalign_tpu.costs import INF
        from tsalign_tpu.ops.jaxcommon import to_device_costs

        B = bt.n_pairs
        F = cfg.left_flank_length + cfg.right_flank_length + 1
        arrays_b = {}
        for key in ("p", "l", "r"):
            name = {"p": "primary", "l": "left", "r": "right"}[key]
            arrays_b[key] = tuple(
                jnp.stack([jnp.asarray(s._rows[name][j]) for s in bt.sweeps])
                for j in range(3)
            )
        arrays_b["ins"] = {
            nm: tuple(
                jnp.stack([jnp.asarray(s._ins[nm][j]) for s in bt.sweeps])
                for j in range(2)
            )
            for nm in ("primary", "left", "right")
        }
        seeds0 = np.full((B, F, 3, bt.nr + 1, bt.nq + 1), INF, dtype=np.int64)
        for i in range(B):
            seeds0[i, cfg.right_flank_length, GAP_NONE, 0, 0] = 0
        seeds = jnp.asarray(np.asarray(to_device_costs(seeds0)))
        sweep_v = jax.vmap(
            lambda s, a: _sweep_jit(
                s, a, L=cfg.left_flank_length, R=cfg.right_flank_length,
                climb=True,
            )
        )
        t0 = time.monotonic()
        M = sweep_v(seeds, arrays_b)
        jax.block_until_ready(M)
        log(f"sweep ok {time.monotonic()-t0:.1f}s")
        if os.environ.get("BISECT_SWEEP_FIRST") == "xfer":
            _ = np.asarray(M)
            log("xfer ok (full M to host)")
        if os.environ.get("BISECT_SWEEP_FIRST") == "summ":
            lr = jnp.asarray([r for r, _ in bt.real], jnp.int32)
            lq = jnp.asarray([q for _, q in bt.real], jnp.int32)
            E_b, tv = _summ_batch_jit(M, lr, lq)
            _ = np.asarray(E_b), np.asarray(tv)
            log("summ ok")

    want = {"bpre": 0, "chunks": 0, "chunks1": 0, "unpadded": 0, "cross": 2}[STEP]
    if os.environ.get("BISECT_KIND"):
        # e.g. BISECT_KIND=0,0,1 — overrides the step's default kind
        kind_sel = tuple(int(x) for x in os.environ["BISECT_KIND"].split(","))
    else:
        kind_sel = None

    # Build kind state by hand so B_pre is only dispatched when testing it.
    from tsalign_tpu.ops.tsm_modules import make_kind_spec
    from tsalign_tpu.ops.jax_modules import JaxKindModule

    budget = (
        int(os.environ["BISECT_BUDGET"])
        if os.environ.get("BISECT_BUDGET")
        else bt._derive_budget([50] * bt.n_pairs)
    )
    kinds_flat = []
    for pk in (0, 1):
        for sk in (0, 1):
            for dk in (0, 1):
                kinds_flat.append((pk, sk, dk))
    # kind order matches _build_kind_sets: 000 first, 010 is index 2.
    pk, sk, dk = kind_sel if kind_sel is not None else kinds_flat[want]
    kms = []
    for i in range(bt.n_pairs):
        lr, lq = bt.real[i]
        spec = make_kind_spec(
            cfg, bt.nr, bt.nq, pk, sk, dk,
            sdel_budget=budget, n_ref_real=lr, n_qry_real=lq,
        )
        assert spec is not None
        km = JaxKindModule(
            spec, cfg, bt.refs[i], bt.qrys[i], 0,
            bt.nq if pk == 0 else bt.nr, chunk=bt.chunk, batch=bt.n_pairs,
        )
        assert km.active
        kms.append(km)
    km0 = kms[0]
    st = km0._static
    log(f"kind pk={pk} sk={sk} dk={dk} same_seq={st.same_seq} padded={st.padded}")
    fixed_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[km._fixed for km in kms]
    )
    jax.block_until_ready(fixed_b)
    log("fixed_b transferred")

    if STEP == "bpre":
        t0 = time.monotonic()
        B_pre = jax.vmap(lambda f: _same_module_jit(f, st=st))(fixed_b)
        jax.block_until_ready(B_pre)
        log(f"B_pre ok {time.monotonic()-t0:.1f}s shape={B_pre.shape}")
        log("STEP bpre OK")
        return

    # chunk pipeline needs B_pre for same-seq kinds
    if st.same_seq:
        B_pre = jax.vmap(lambda f: _same_module_jit(f, st=st))(fixed_b)
        jax.block_until_ready(B_pre)
        log("B_pre ok (prereq)")
    else:
        B_pre = jnp.zeros((bt.n_pairs, 1, 1), jnp.int32)

    # Phase bisect inside the assembly: run with a subset of the segment
    # plans (BISECT_PLANS=none|neg|pos|all) to isolate which machinery
    # (banded negative / padded-positive traced / base) faults.
    sel_plans = os.environ.get("BISECT_PLANS", "all")
    if sel_plans != "all":
        keep = {
            "none": (),
            "neg": tuple(p for p in st.plans if not p.positive),
            "pos": tuple(p for p in st.plans if p.positive),
        }[sel_plans]
        st = st._replace(plans=keep)
        log(f"plans={sel_plans}: {len(keep)} segment(s)")

    n_e = st.n_p + 1 if False else km0.spec.n_anti + 1
    C = km0.chunk
    e_bases = jnp.asarray(
        [np.int32(min(e0, n_e - C) if n_e >= C else 0) for e0 in range(0, n_e, C)],
        jnp.int32,
    )
    if os.environ.get("BISECT_A"):
        A = np.load(os.environ["BISECT_A"])[: bt.n_pairs]
        log(f"A loaded from {os.environ['BISECT_A']} {A.shape}")
    else:
        A = np.zeros((bt.n_pairs, bt.nr + 1, bt.nq + 1), np.int32)  # all live
    A_mod = A if pk == 0 else A.transpose(0, 2, 1)
    PAD = max(0, -km0.s_lo)
    width = PAD + km0.spec.n_anti + 1 + max(0, C - 1 + km0.s_hi)
    Rk0 = jnp.full((bt.n_pairs, km0.spec.n_p + 1, width), DEV_INF, jnp.int32)
    A_dev = jnp.asarray(A_mod)
    t0 = time.monotonic()
    out = jax.lax.map(
        lambda args: _kind_all_chunks(
            args[0], args[1], args[2], e_bases, args[3], st=st, PAD=PAD
        ),
        (A_dev, Rk0, fixed_b, B_pre),
    )
    jax.block_until_ready(out)
    log(f"chunks ok {time.monotonic()-t0:.1f}s shape={out.shape}")
    log(f"STEP {STEP} OK")


if __name__ == "__main__":
    main()
