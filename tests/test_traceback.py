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


@pytest.mark.parametrize("seed", range(6))
def test_exit_module_prices_equal_forward_columns(seed):
    """_ExitModule (the backward/adjoint candidate pricer) must equal the
    forward _ModuleColumn spec on B[l] for every (l, b) — randomized over
    configs, pairs, kinds and exit positions."""
    from tsalign_tpu.ops.tsm_modules import make_kind_spec
    from tsalign_tpu.traceback import _ExitModule, _ModuleColumn

    rng = np.random.default_rng(900 + seed)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    ref, qry = related_pair(rng, al, max_len=26)
    allow_sdel = bool(seed % 2)
    checked = 0
    for pk in (0, 1):
        for sk in (0, 1):
            for dk in (0, 1):
                spec = make_kind_spec(cfg, len(ref), len(qry), pk, sk, dk)
                if spec is None:
                    continue
                p2 = int(rng.integers(1, spec.n_p + 1))
                em = _ExitModule(spec, cfg, ref, qry, p2, allow_sdel)
                for b in range(0, spec.n_s + 1, max(1, spec.n_s // 4)):
                    col = _ModuleColumn(
                        spec, cfg, ref, qry, b, p2 - min(spec.l_max, p2),
                        allow_sdel,
                    )
                    # col is anchored at p1 = p2 - L; its level l consumes
                    # P[p1..p1+l) which matches the exit only at l == L,
                    # so compare per-l with per-l columns instead:
                    for l in range(0, min(spec.l_max, p2) + 1):
                        colL = _ModuleColumn(
                            spec, cfg, ref, qry, b, p2 - l, allow_sdel
                        )
                        want = int(colL.B[l])
                        got = em.price(l, b)
                        assert got == want, (
                            pk, sk, dk, p2, b, l, got, want
                        )
                        checked += 1
    assert checked > 0
