#!/usr/bin/env python
"""Device (TPU) validation of the real-locus regression family under the
exact reference scenarios (NoPrune primary range): TSNAX-DISC1_473 must
cost 10 (asserted upstream, lib_tsalign/src/tests.rs:38-194); GNG12-AS1_200
and LINC00271_92 are pinned at 8 and 16 from NoPrune engine runs
(tests/test_real_loci.py carries the fast CPU RangePrune equivalents).

Usage:
  python scripts/validate_loci.py            # TPU (or default backend)
  JAX_PLATFORMS=cpu PYTHONPATH= python scripts/validate_loci.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    ("TSNAX-DISC1_473", "-", (196, 196, 219, 212), 10),
    ("GNG12-AS1_200", "-", (196, 196, 219, 215), 8),
    ("LINC00271_92", "N-", (196, 196, 227, 202), 16),
]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=0,
                    help="repeat N times after the cold run; report best")
    args = ap.parse_args()

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file, strip_skip_characters
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.jax_engine import JaxAligner

    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/bench/config.tsa", al
    )
    ok_all = True
    for name, skip, rng4, expected in CASES:
        r1, r2 = parse_pair_fasta_file(f"/root/reference/test_files/{name}.fa")
        ref = al.encode(strip_skip_characters(r1.sequence, skip).upper())
        qry = al.encode(strip_skip_characters(r2.sequence, skip).upper())
        rng = AlignmentRange(*rng4)
        t0 = time.time()
        res = JaxAligner(
            cfg, ref, qry, range_=rng, chunk=64, keep_fields=False
        ).align()
        ok = res.cost == expected
        ok_all &= ok
        print(
            f"{name}: cost={res.cost} (assert {expected}) ok={ok} "
            f"rounds={res.rounds} {time.time()-t0:.1f}s",
            flush=True,
        )
        if args.warm:
            warm = float("inf")
            for _ in range(args.warm):
                t0 = time.time()
                rw = JaxAligner(
                    cfg, ref, qry, range_=rng, chunk=64, keep_fields=False
                ).align()
                warm = min(warm, time.time() - t0)
                assert rw.cost == res.cost
            print(f"{name}: warm_wall={warm:.2f}s", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
