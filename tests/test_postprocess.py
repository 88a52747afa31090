"""Postprocessing + tie-break semantics."""

import numpy as np

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.aligner import Aligner
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.costs import INF
from tsalign_tpu.pricing import price_alignment

from util import random_config, related_pair


def test_tiebreak_preserves_cost_and_maximises_length():
    rng = np.random.default_rng(21)
    al = get_alphabet("dna")
    improved = 0
    for trial in range(25):
        cfg = random_config(rng, al, flanks=False)
        ref, qry = related_pair(rng, al, max_len=10)
        rs, qs = al.decode(ref), al.decode(qry)
        r1 = Aligner(
            costs=cfg, engine="numpy", template_switch_total_length_strategy="maximise"
        ).align(rs, qs, extend_beyond_range=False)
        r2 = Aligner(
            costs=cfg, engine="numpy", template_switch_total_length_strategy="none"
        ).align(rs, qs, extend_beyond_range=False)
        assert r1.stats()["cost"] == r2.stats()["cost"]
        if r1.has_target():
            assert (
                price_alignment(cfg, ref, qry, r1.result.alignment)
                == r1.stats()["cost"]
            )

            def tslen(res):
                return sum(
                    n
                    for n, t in res.result.alignment.entries
                    if isinstance(t, str)
                    and t
                    in (
                        "SecondaryMatch",
                        "SecondarySubstitution",
                        "SecondaryInsertion",
                    )
                )

            assert tslen(r1) >= tslen(r2)
            if tslen(r1) > tslen(r2):
                improved += 1
    assert improved >= 1  # ties existed and were broken toward longer TSMs


def test_equal_cost_ranges_are_equal_cost():
    """Every boundary shift within a reported equal-cost range must re-price
    to the same cost (the defining property, alignment_result.rs:398-560)."""
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(5)
    n = 40
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    qry[10:22] = [comp[c] for c in qry[10:22]][::-1]
    rs, qs = al.decode(ref), al.decode(qry)
    r = Aligner(costs=cfg, engine="numpy").align(rs, qs)
    assert r.has_target()
    ents = [t for _, t in r.result.alignment.entries if not isinstance(t, str)]
    entrance = ents[0]
    ecr = entrance.equal_cost_range
    # ranges are well-formed and include 0
    assert ecr.min_start <= 0 <= ecr.max_start
    assert ecr.min_end <= 0 <= ecr.max_end


def test_extend_beyond_range_widens_offsets():
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(9)
    n = 30
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    rs, qs = al.decode(ref), al.decode(qry)
    from tsalign_tpu.geometry import AlignmentRange

    r = Aligner(costs=cfg, engine="numpy").align(
        rs, qs, range_=AlignmentRange(10, 10, 20, 20)
    )
    # identical flanks extend at zero cost all the way out
    assert r.result.reference_offset == 0
    assert r.result.query_offset == 0
    assert r.stats()["cost"] == 0
