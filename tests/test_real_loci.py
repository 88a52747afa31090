"""Real-locus regression pins (the reference's flagship regression family).

The reference asserts TSNAX-DISC1_473 with range R196..219 Q196..212 under
test_files/config/bench costs exactly 10, invariant across four min-length
strategies (lib_tsalign/src/tests.rs:38-194).  GNG12-AS1_200 and
LINC00271_92 are the sibling loci exercised by the shipped shell harnesses
(test_files/GNG12-AS1_200.sh, LINC00271_92.sh) with their script ranges;
their optima (8 and 16) are pinned here from NoPrune engine runs and
verified equal under RangePrune (the fast path used below —
strategies/primary_range.rs semantics; NoPrune device runs live in
scripts/validate_loci.py).
"""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.fasta import parse_pair_fasta_file, strip_skip_characters
from tsalign_tpu.geometry import AlignmentRange

from conftest import has_reference, reference_path

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

CASES = [
    # (fixture, skip_chars, range, optimal cost)
    ("TSNAX-DISC1_473", "-", AlignmentRange(196, 196, 219, 212), 10),
    ("GNG12-AS1_200", "-", AlignmentRange(196, 196, 219, 215), 8),
    ("LINC00271_92", "N-", AlignmentRange(196, 196, 227, 202), 16),
]


def _load(name, skip):
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", "bench", "config.tsa"), al
    )
    r1, r2 = parse_pair_fasta_file(reference_path("test_files", f"{name}.fa"))
    ref = al.encode(strip_skip_characters(r1.sequence, skip).upper())
    qry = al.encode(strip_skip_characters(r2.sequence, skip).upper())
    return cfg, ref, qry


@pytest.mark.parametrize("name,skip,rng,expected", CASES)
def test_real_locus_cost(name, skip, rng, expected):
    cfg, ref, qry = _load(name, skip)
    res = DenseAligner(cfg, ref, qry, range_=rng, prune_range=True).align()
    assert res.cost == expected


def test_tsnax_disc1_473_noprune():
    """The exact reference-asserted scenario (NoPrune primary range,
    lib_tsalign/src/tests.rs:38-97): optimal cost 10."""
    cfg, ref, qry = _load("TSNAX-DISC1_473", "-")
    rng = AlignmentRange(196, 196, 219, 212)
    res = DenseAligner(cfg, ref, qry, range_=rng).align()
    assert res.cost == 10
