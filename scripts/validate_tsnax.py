#!/usr/bin/env python
"""The reference's flagship regression: TSNAX-DISC1 locus with range
R196..219 Q196..212 must cost exactly 10 under test_files/config/bench
(lib_tsalign/src/tests.rs:38-194, asserted for four different min-length
strategies — strategy-invariant, so one dense run checks it)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.jax_engine import JaxAligner

    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/bench/config.tsa", al
    )
    # the locus sequences as embedded in the reference test
    # (lib_tsalign/src/tests.rs:45-47); the fa file carries gap dashes
    from tsalign_tpu.fasta import strip_skip_characters

    r1, r2 = parse_pair_fasta_file("/root/reference/test_files/TSNAX-DISC1_473.fa")
    ref = al.encode(strip_skip_characters(r1.sequence, "-").upper())
    qry = al.encode(strip_skip_characters(r2.sequence, "-").upper())
    rng = AlignmentRange(196, 196, 219, 212)
    t0 = time.time()
    res = JaxAligner(cfg, ref, qry, range_=rng, chunk=64, keep_fields=False).align()
    ok = res.cost == 10
    print(
        f"TSNAX-DISC1 R196..219 Q196..212: cost={res.cost} (assert 10) "
        f"ok={ok} rounds={res.rounds} {time.time()-t0:.1f}s"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
