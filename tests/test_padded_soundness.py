"""Poison-padding soundness: bucketed problems must price like the real one.

The bucketed batch/chain paths run engines on poison-suffix-padded
sequences with the target range at the real lengths so equal-shaped
problems share compiled programs.  Padding is sound for char-touching ops
(poison table rows price INF), but the STRUCTURAL feasibilities — seed
walk bounds (b + fo <= n_s), strict reentry (j2 < n_anti), and the exit
anti-gap walk (p2 + ldiff <= Ah) — must derive from the REAL lengths;
deriving them from the padded lengths widens the reachable state space
and can underreport costs (found by scripts/fuzz_engines.py batch
seed=4242: a rewinding config priced a 7x6 pair at 5 in a 64-bucket vs
the true optimum 10).

Fixtures: tests/fixtures/padded_rewind_{cfg.tsa,pairs.json} capture that
case.  The randomized counterpart is scripts/fuzz_engines.py padded.
"""

import json
import os

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.geometry import AlignmentRange
from tsalign_tpu.jax_engine import JaxAligner
from tsalign_tpu.oracle import OracleAligner
from tsalign_tpu.pricing import price_alignment

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def case():
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.parse_plain(
        open(os.path.join(HERE, "fixtures", "padded_rewind_cfg.tsa")).read(),
        al,
    )
    pairs = json.load(
        open(os.path.join(HERE, "fixtures", "padded_rewind_pairs.json"))
    )["pairs"]
    enc = [(al.encode(r), al.encode(q)) for r, q in pairs]
    return al, cfg, enc


def _pad(seq, n, P):
    out = np.full(n, P, dtype=seq.dtype)
    out[: len(seq)] = seq
    return out


def test_padded_engines_match_oracle(case):
    al, cfg, enc = case
    r, q = enc[1]
    oc, _ = OracleAligner(cfg, r, q).align()
    assert oc == 10
    P = al.size
    rp, qp = _pad(r, 64, P), _pad(q, 64, P)
    rng = AlignmentRange(0, 0, len(r), len(q))
    assert DenseAligner(cfg, rp, qp, range_=rng).align().cost == oc
    assert JaxAligner(cfg, rp, qp, range_=rng, chunk=64).align().cost == oc


def test_padded_batch_matches_oracle(case):
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

    al, cfg, enc = case
    want = [OracleAligner(cfg, r, q).align()[0] for r, q in enc]
    bt = BatchedTSAligner(cfg, enc, chunk=64)
    assert bt.costs().tolist() == want == [4, 10, 4]


def test_padded_batch_traceback_reprices(case):
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

    al, cfg, enc = case
    bt = BatchedTSAligner(cfg, enc, chunk=64, keep_fields=True)
    for i, (comp, aln) in enumerate(bt.align_with_traceback()):
        assert price_alignment(cfg, enc[i][0], enc[i][1], aln) == comp
