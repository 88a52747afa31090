"""Chained-mode validation at reference scale (~230 kb).

The reference validates its chain aligner on
test_files/homo_sapiens.12.74743744.74973891.sub.fa (230147/236216 bp);
in this environment that file is a 317-byte stub (the headers claim the
full region but only 120 bp per record are shipped), so this script
builds an equivalent-scale synthetic pair instead: a seeded random
230 kb reference and a query derived from it with SNPs, short indels and
planted reverse-complement TSM stretches, then runs the full chained
pipeline (anchors -> chain -> segment cuts -> per-segment dense engine ->
verification pass) and checks:

  * the run completes and the stitched alignment re-prices exactly,
  * every planted TSM is reported (one entrance per planted stretch),
  * the verification pass stays green (no suboptimal cuts at double-
    segment scale),
  * the total cost equals the constructed optimum.

Usage: python scripts/validate_chain_scale.py [length] [--engine jax|numpy]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tsalign_tpu.alignment import is_template_switch_entrance
from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.chain.driver import chain_align
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.pricing import price_alignment

# Narrow-window scenario config (same shape as tests/test_chain.py): jump
# offsets and anti-gaps within +-24, TS length 6..24 - keeps segment
# context windows small so the 230 kb run stays tractable while the cost
# structure (base costs, affine gaps, length pricing) matches the
# reference's model.
CONFIG = """# Limits

left_flank_length = 0
right_flank_length = 0

# Base Cost

rrf_cost = 3
rqf_cost = 2
qrf_cost = 2
qqf_cost = 3
rrr_cost = 3
rqr_cost = 2
qrr_cost = 2
qqr_cost = 3

# Jump Costs

RQQROffset
 -inf -12 13
  inf   0 inf

RRQQOffset
 -inf -12 13
  inf   0 inf

Length
   0 5 6 7 8 9
 inf 5 3 1 0 inf

LengthDifference
 -inf -4 5
  inf  0 inf

ForwardAntiPrimaryGap
 -inf   1
    0 inf

ReverseAntiPrimaryGap
 -inf
    0

# Primary Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  2  2  2  0
C |  2  0  2  2  0
G |  2  2  0  2  0
T |  2  2  2  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 3 3 3 3 3

GapExtendCostVector
 A C G T N
 1 1 1 1 1

# Secondary Forward Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  8  8  8  4
C |  8  0  8  8  4
G |  8  8  0  8  4
T |  8  8  8  0  4
N |  4  4  4  4  4

GapOpenCostVector
 A C G T N
 9 9 9 9 9

GapExtendCostVector
 A C G T N
 2 2 2 2 2

# Secondary Reverse Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  8  8  8  4
C |  8  0  8  8  4
G |  8  8  0  8  4
T |  8  8  8  0  4
N |  4  4  4  4  4

GapOpenCostVector
 A C G T N
 9 9 9 9 9

GapExtendCostVector
 A C G T N
 2 2 2 2 2

# Left Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  3  3  3  0
C |  3  0  3  3  0
G |  3  3  0  3  0
T |  3  3  3  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 4 4 4 4 4

GapExtendCostVector
 A C G T N
 1 1 1 1 1

# Right Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  3  3  3  0
C |  3  0  3  3  0
G |  3  3  0  3  0
T |  3  3  3  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 4 4 4 4 4

GapExtendCostVector
 A C G T N
 1 1 1 1 1
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("length", type=int, nargs="?", default=230_000)
    ap.add_argument("--engine", default="numpy", choices=["numpy", "jax", "auto"])
    ap.add_argument("--target-segment", type=int, default=1024)
    args = ap.parse_args()

    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.parse_plain(CONFIG, get_alphabet("dna-n"))
    comp = get_alphabet("dna-n").complement_array()

    n = args.length
    rng = np.random.default_rng(230147)
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()

    # planted reverse-complement TSMs every ~23 kb (length 8 = Length cost
    # 0, reverse base cost 2 under the narrow config)
    ts_sites = list(range(n // 20, n - 50, max(n // 10, 100)))
    for p in ts_sites:
        qry[p : p + 8] = [comp[c] for c in qry[p : p + 8]][::-1]
    # SNPs every ~2.3 kb away from TSM sites (cost 2 each)
    snp_sites = [
        p
        for p in range(n // 40, n - 50, max(n // 100, 50))
        if all(abs(p - t) > 60 for t in ts_sites)
    ]
    for p in snp_sites:
        qry[p] = (qry[p] + 1) % 4

    expected = 2 * len(ts_sites) + 2 * len(snp_sites)
    print(
        f"n={n}: {len(ts_sites)} planted TSMs, {len(snp_sites)} SNPs, "
        f"expected cost {expected}",
        flush=True,
    )

    t0 = time.monotonic()
    res = chain_align(
        cfg,
        ref,
        qry,
        engine=args.engine,
        target_segment=args.target_segment,
        verify=True,
        progress=True,  # partial output is evidence when a run times out
    )
    wall = time.monotonic() - t0
    print(
        f"chain_align: cost={res.cost} segments={res.segments} "
        f"anchors={res.anchors} cuts_rejoined={res.cuts_rejoined} "
        f"wall={wall:.1f}s",
        flush=True,
    )

    priced = price_alignment(cfg, ref, qry, res.alignment)
    assert priced == res.cost, f"re-pricing mismatch: {priced} != {res.cost}"
    n_ts = sum(1 for _, t in res.alignment.entries if is_template_switch_entrance(t))
    assert n_ts == len(ts_sites), f"TSM count: {n_ts} != {len(ts_sites)}"
    assert res.cost == expected, f"cost: {res.cost} != {expected}"
    print("OK: stitched alignment re-prices exactly, all planted TSMs found,",
          "cost equals the constructed optimum", flush=True)


if __name__ == "__main__":
    main()
