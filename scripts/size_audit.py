"""Static device-memory audit for the TPU-crash cases (CPU-only, no relay).

For each case, build the real kind modules (JaxKindModule under the CPU
backend) and print the per-kind static dimensions plus byte estimates of
the dominant in-jit intermediates of one chunk step:

  T carry      3 x (n_p+1) x C x W int32   (module scan carry, cross kinds)
  B emit       (L+1) x (n_p+1) x C         (scan stacked output)
  D3pad        (n_p+1) x C x LL            (sheared exit table)
  sliding mins len(plans) x D3pad          (one per ldiff segment)
  U/V          (n_p+1) x C x (S + C)       (assembly output + skew fold)

The batched bucket case multiplies every per-chunk intermediate by B
(vmapped pairs).  Usage:

  env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/size_audit.py [case...]

cases: heli ari bucket (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tsalign_tpu.alphabet import get_alphabet  # noqa: E402
from tsalign_tpu.config import TemplateSwitchConfig  # noqa: E402
from tsalign_tpu.fasta import parse_pair_fasta_file  # noqa: E402

TF = "/root/reference/test_files"


def _mb(n):
    return f"{n / 2**20:8.1f} MB"


def audit_engine(label, eng, batch=1):
    print(f"\n=== {label} (n_r={eng.n_r} n_q={eng.n_q} batch={batch}) ===")
    kinds = eng._build_kinds(None)
    tot_fixed = 0
    tot_peak = 0
    for km in kinds:
        st = km._static
        C = st.chunk
        npp, W, L, S, LL = st.n_p + 1, st.W, st.L, st.S, st.LL
        fixed = sum(int(np.asarray(v).nbytes) for v in km._fixed.values())
        carry = 3 * npp * C * W * 4 if not st.same_seq else 3 * npp * W * 4
        emit = (L + 1) * npp * C * 4 if not st.same_seq else (L + 1) * npp * 4
        d3pad = npp * C * LL * 4
        # per-plan window buffers are folded before the next plan is built,
        # and sliced to S + w - 1 source width; only the widest is live.
        max_w = max((p.b - p.a + 1 for p in st.plans), default=1)
        slides = npp * C * (S + max_w) * 4 * 2  # pre+suf cummin pair
        uv = npp * C * (S + C) * 4
        peak = (2 * carry + emit + d3pad + slides + uv) * batch
        tot_fixed += fixed
        tot_peak = max(tot_peak, peak)
        spec = km.spec
        print(
            f"kind pk={spec.pk} sk={spec.sk} dk={spec.dk} same={st.same_seq}"
            f" n_p={st.n_p} n_s={st.n_s} W={W} L={L} S={S} LL={LL}"
            f" chunk={C} plans={len(st.plans)}"
        )
        print(
            f"  fixed {_mb(fixed)} | carryx2 {_mb(2 * carry * batch)}"
            f" emit {_mb(emit * batch)} d3pad {_mb(d3pad * batch)}"
            f" slides {_mb(slides * batch)} uv {_mb(uv * batch)}"
            f" => step peak {_mb(peak)}"
        )
    field = 0
    F = eng.config.left_flank_length + eng.config.right_flank_length + 1
    field = F * 3 * (eng.n_r + 1) * (eng.n_q + 1) * 4 * batch
    print(f"primary field M: {_mb(field)} (x2-3 live during sweep)")
    print(f"TOTAL resident fixed: {_mb(tot_fixed * batch)}")
    print(f"MAX single-kind step peak: {_mb(tot_peak)}")


def case_pair(name, cfgdir):
    """Load a golden TOML's embedded sequences + its recorded range."""
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.postprocess import _advance
    from tsalign_tpu.result import AlignmentResult

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(f"{cfgdir}/config.tsa", al)
    rec = AlignmentResult.from_toml(open(f"{TF}/{name}.toml").read())
    ref = al.encode(rec.sequences.reference.upper())
    qry = al.encode(rec.sequences.query.upper())
    ro, qo = rec.reference_offset, rec.query_offset
    rl, ql = _advance(ro, qo, rec.alignment.entries)
    rng = AlignmentRange(ro, qo, rl, ql)
    return cfg, ref, qry, rng


def main():
    want = sys.argv[1:] or ["heli", "ari", "bucket"]
    from tsalign_tpu.jax_engine import JaxAligner

    if "heli" in want:
        cfg, r, q, rng = case_pair("twin_heli_MDC1-AS1_10", f"{TF}/config/experiments")
        audit_engine(
            "heli 493x419 experiments",
            JaxAligner(cfg, r, q, range_=rng, chunk=128, keep_fields=False),
        )
    if "ari" in want:
        cfg, r, q, rng = case_pair(
            "twin_ari_chrX_146823507_146823598", f"{TF}/config/experiments"
        )
        audit_engine(
            "ari 1099x1099 experiments",
            JaxAligner(cfg, r, q, range_=rng, chunk=128, keep_fields=False),
        )
    if "bucket" in want:
        import bench
        from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

        al = get_alphabet("dna-n")
        cfg = TemplateSwitchConfig.from_path(
            "/root/reference/sample_tsa_config/config.tsa", al
        )
        pairs = []
        for name in bench.THROUGHPUT_PAIRS:
            r, qy = parse_pair_fasta_file(f"{TF}/{name}.fa")
            pairs.append(
                (al.encode(r.sequence.upper()), al.encode(qy.sequence.upper()))
            )
        bt = BatchedTSAligner(cfg, pairs)
        # the batched aligner builds per-kind sets lazily; reuse a
        # single-pair engine at the bucket shape for the static audit and
        # scale intermediates by B.
        eng = JaxAligner(cfg, pairs[0][0], pairs[0][1], keep_fields=False)
        print(f"bucket: B={len(pairs)} nr={bt.nr} nq={bt.nq}")
        audit_engine("bucket pair[0] sample cfg", eng, batch=len(pairs))


if __name__ == "__main__":
    main()
