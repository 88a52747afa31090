"""K-scaled tie-break soundness guard (aligner._run_engine).

The maximise-total-TS-length tie-break encodes the lexicographic
(cost, -ts_total_length) optimum as K*cost - tsl, which is exact only if
tsl < K on every represented path.  With a rewinding anti-gap window
(negative finite gap) AND a possibly-zero-cost TSM, tsl is unbounded: the
search can spawn free TSMs that re-consume primary positions, so the
discount can buy down the *cost* component — the reference's
label-correcting A* would never terminate on such a config, and the naive
scaling silently reported a wrong (lower) cost.  Found by
scripts/fuzz_engines.py e2e seed=777 trial=657: aligner said 3, oracle 5.

The guard (aligner.py) drops the tie-break for rewind+zero-cost configs and
post-hoc checks rounds*l_max < K otherwise (escalating K when violated).
"""

import numpy as np

from tsalign_tpu.aligner import Aligner
from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import min_tsm_cost_bound
from tsalign_tpu.oracle import OracleAligner

# Captured from fuzz e2e seed=777 trial=657 (display() round-trip).
CFG_TEXT = """\
# Limits

left_flank_length = 0
right_flank_length = 0

# Base Cost

rrf_cost = inf
rqf_cost = 0
qrf_cost = 1
qqf_cost = inf
rrr_cost = inf
rqr_cost = 0
qrr_cost = 0
qqr_cost = 3

# Jump Costs

RQQROffset
 -inf -1 0 1 2   3
  inf  2 0 2 4 inf

RRQQOffset
 -inf -7 -6 -5 -4 -3 -2 -1 0 1   2
  inf  6  6  5  2  2  1  0 0 1 inf

Length
   0 1 4 7   8
 inf 0 2 0 inf

LengthDifference
 -inf -4 -3 -2 -1 0 1 2 3 4   5
  inf  4  4  0  0 0 2 3 3 6 inf

ForwardAntiPrimaryGap
 -inf -3 -2 -1 0 1 2 3 4   5
  inf  5  5  1 0 1 4 5 5 inf

ReverseAntiPrimaryGap
 -inf -5 -4 -3 -2 -1 0 1   2
  inf  5  4  4  1  0 0 4 inf

# Primary Edit Costs

SubstitutionCostTable
  |  A  C  G  T
--+------------
A |  0  1  1  3
C |  5  0  6  1
G |  2  5  0  6
T |  2  6  4  0

GapOpenCostVector
 A C G T
 7 4 5 7

GapExtendCostVector
 A C G T
 3 1 1 1

# Secondary Forward Edit Costs

SubstitutionCostTable
  |  A  C  G  T
--+------------
A |  0  3  3  3
C |  2  0  3  4
G |  3  5  0  5
T |  6  3  6  0

GapOpenCostVector
 A C G T
 3 7 3 1

GapExtendCostVector
 A C G T
 3 3 1 2

# Secondary Reverse Edit Costs

SubstitutionCostTable
  |  A  C  G  T
--+------------
A |  0  3  6  5
C |  5  0  1  1
G |  4  1  0  4
T |  2  1  2  0

GapOpenCostVector
 A C G T
 2 6 6 7

GapExtendCostVector
 A C G T
 2 3 3 1

# Left Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T
--+------------
A |  0  3  3  1
C |  6  0  2  3
G |  2  6  0  1
T |  4  6  4  0

GapOpenCostVector
 A C G T
 5 4 7 1

GapExtendCostVector
 A C G T
 2 2 2 1

# Right Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T
--+------------
A |  0  6  2  4
C |  1  0  6  5
G |  5  2  0  5
T |  2  2  4  0

GapOpenCostVector
 A C G T
 2 4 7 6

GapExtendCostVector
 A C G T
 2 3 2 3
"""

REF = np.array([2, 2, 3, 3, 1, 2], dtype=np.int8)
QRY = np.array([1, 2, 0, 0, 1, 1], dtype=np.int8)


def test_rewind_zero_cost_tsm_drops_tiebreak():
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.parse_plain(CFG_TEXT, al)
    assert cfg.can_rewind()
    assert min_tsm_cost_bound(cfg) <= 0

    oc, _ = OracleAligner(cfg, REF, QRY).align()
    assert oc == 5

    a = Aligner(costs=cfg, alphabet="dna", engine="numpy")
    res = a.align(al.decode(REF), al.decode(QRY))
    assert res.has_target()
    assert int(res.stats()["cost"]) == oc


def test_default_config_keeps_tiebreak():
    # The default config is rewindable (free negative forward anti-gaps) but
    # every TSM costs > 0, so the degenerate branch does not trigger and the
    # post-hoc rounds*l_max < K check keeps the tie-break exact.
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    assert cfg.can_rewind()
    assert min_tsm_cost_bound(cfg) > 0
    a = Aligner(costs=cfg, alphabet="dna", engine="numpy")
    res = a.align("ACGTACGTAC", "ACCTACGTAC")
    oc, _ = OracleAligner(
        cfg, al.encode("ACGTACGTAC"), al.encode("ACCTACGTAC")
    ).align()
    assert int(res.stats()["cost"]) == oc
