#!/usr/bin/env python
"""Device runs of the twin_1000 fixture family (sample config).

These 1000 bp synthetic pairs (test_files/twin_1000_*.fa) are in the
BASELINE target list but ship without golden TOMLs; this records engine
costs + wall times on the device (the CPU backends are impractically slow
at the sample config's wide windows — CLAUDE.md).

Usage: python scripts/validate_twin1000.py [case ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ["twin_1000_5ts", "twin_1000_gap100", "twin_1000_0.01_ts"]


def main():
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file
    from tsalign_tpu.jax_engine import JaxAligner

    args = [a for a in sys.argv[1:] if a != "--traceback"]
    with_tb = "--traceback" in sys.argv[1:]
    cases = args or CASES
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    for name in cases:
        r1, r2 = parse_pair_fasta_file(f"/root/reference/test_files/{name}.fa")
        ref = al.encode(r1.sequence.upper())
        qry = al.encode(r2.sequence.upper())
        t0 = time.time()
        if with_tb:
            from tsalign_tpu.pricing import price_alignment

            ja = JaxAligner(cfg, ref, qry, chunk=128, keep_fields=True)
            cost, alignment = ja.align_with_traceback()
            priced = price_alignment(cfg, ref, qry, alignment)
            print(
                f"{name}: n=({len(ref)},{len(qry)}) cost={cost} "
                f"repriced={priced} ok={priced == cost} "
                f"rounds={ja.last_rounds} {time.time()-t0:.1f}s",
                flush=True,
            )
            # TSM parameters (offsets/lengths in the TS brackets) feed the
            # narrowed-window CPU pins in tests/test_twin_fixtures.py.
            print(f"{name} cigar: {alignment.cigar()}", flush=True)
        else:
            res = JaxAligner(cfg, ref, qry, chunk=128, keep_fields=False).align()
            print(
                f"{name}: n=({len(ref)},{len(qry)}) cost={res.cost} "
                f"rounds={res.rounds} {time.time()-t0:.1f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
