"""Traceback validation: the reconstructed alignment re-prices to the
optimal cost under the independent re-pricer (pricing.py), and the oracle's
own alignments price exactly too."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.costs import INF
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.geometry import AlignmentRange
from tsalign_tpu.oracle import OracleAligner
from tsalign_tpu.pricing import price_alignment

from util import random_config, random_pair, related_pair


def test_oracle_alignments_price_exactly():
    rng = np.random.default_rng(1)
    al = get_alphabet("dna")
    checked = 0
    for trial in range(60):
        cfg = random_config(rng, al, flanks=False)
        ref, qry = related_pair(rng, al, max_len=9)
        c, aln = OracleAligner(cfg, ref, qry).align()
        if c is None:
            continue
        checked += 1
        assert price_alignment(cfg, ref, qry, aln) == c
    assert checked > 30


@pytest.mark.parametrize("seed", [9, 23])
def test_traceback_reprices_to_engine_cost(seed):
    rng = np.random.default_rng(seed)
    al = get_alphabet("dna")
    tsm_cases = 0
    for trial in range(60):
        cfg = random_config(rng, al, flanks=False)
        if trial % 4:
            ref, qry = related_pair(rng, al, max_len=10)
        else:
            ref, qry = random_pair(rng, al, max_len=9, min_len=0)
        mts = [None, 0, 1, 2][trial % 4]
        rng_obj = None
        if trial % 5 == 2 and len(ref) > 2 and len(qry) > 2:
            ro = int(rng.integers(0, len(ref) // 2))
            rl = int(rng.integers(ro + 1, len(ref) + 1))
            qo = int(rng.integers(0, len(qry) // 2))
            ql = int(rng.integers(qo + 1, len(qry) + 1))
            rng_obj = AlignmentRange(ro, qo, rl, ql)
        da = DenseAligner(cfg, ref, qry, max_template_switches=mts, range_=rng_obj)
        c, aln = da.align_with_traceback()
        if c >= INF:
            continue
        if any(not isinstance(t, str) for _, t in aln.entries):
            tsm_cases += 1
        assert price_alignment(cfg, ref, qry, aln, range_=rng_obj) == c
    assert tsm_cases > 3


def test_traceback_planted_tsm_structure():
    """The planted reverse-complement stretch comes back as a reverse-direction
    TSM with the expected secondary run length."""
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(5)
    n = 30
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    qry[10:20] = [comp[c] for c in qry[10:20]][::-1]
    c, aln = DenseAligner(cfg, ref, qry).align_with_traceback()
    assert price_alignment(cfg, ref, qry, aln) == c
    ents = [t for _, t in aln.entries if not isinstance(t, str)]
    assert len(ents) == 2  # one entrance + one exit
    assert ents[0].direction == "Reverse"
    sec = sum(n for n, t in aln.entries if isinstance(t, str) and t.startswith("Secondary"))
    assert sec >= 10
