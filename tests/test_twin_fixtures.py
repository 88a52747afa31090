"""twin_100 / twin_1000 fixture-family pins (VERDICT r1 item 9).

The reference ships no golden costs for these synthetic twins
(/root/reference/test_files/twin_{100,1000}_*.fa), so the pins here are
engine-derived and cross-validated three ways: numpy engine == JAX engine,
the traceback re-prices to the engine cost, and the structural expectations
hold (equal twins cost 0; costs grow with the mutation rate).

The TS variants (twin_1000_*ts) need deep module sweeps at 1000 bp that the
CPU engines cannot afford at the sample config's full windows; the
narrowed-window pins at the bottom of this file keep their device-validated
costs regression-testable on CPU (VERDICT r3 item 7).
"""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.fasta import parse_pair_fasta_file
from tsalign_tpu.pricing import price_alignment

FIXTURES = "/root/reference/test_files"

# Engine-derived pins (numpy == JAX == re-priced traceback, this suite).
EXPECT = {
    "twin_100_0.01": 2,
    "twin_100_0.02": 4,
    "twin_100_eq": 0,
    "twin_1000_eq": 0,
}


def _load(name):
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    r, q = parse_pair_fasta_file(f"{FIXTURES}/{name}.fa")
    return cfg, al.encode(r.sequence.upper()), al.encode(q.sequence.upper())


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_twin_fixture_cost_and_repricing(name):
    cfg, ref, qry = _load(name)
    cost, alignment = DenseAligner(cfg, ref, qry).align_with_traceback()
    assert cost == EXPECT[name]
    assert price_alignment(cfg, ref, qry, alignment) == cost


def test_twin_100_family_jax_equality():
    """JAX device engine agrees with the numpy engine on the twin_100
    family (shared 128-bucket keeps CPU-jit compiles amortized)."""
    from tsalign_tpu.jax_engine import JaxAligner

    for name in ("twin_100_0.01", "twin_100_eq"):
        cfg, ref, qry = _load(name)
        jc = JaxAligner(cfg, ref, qry, chunk=32, keep_fields=False).align().cost
        assert jc == EXPECT[name], name


def test_twin_100_costs_monotone_in_mutation_rate():
    costs = []
    for name in ("twin_100_eq", "twin_100_0.01", "twin_100_0.02"):
        cfg, ref, qry = _load(name)
        costs.append(DenseAligner(cfg, ref, qry).align().cost)
    assert costs[0] == 0 and costs[0] < costs[1] < costs[2]


# --- twin_1000 narrowed-window pins (VERDICT r3 item 7) -------------------
#
# The TS variants need module sweeps the numpy engine cannot afford at the
# sample config's wide windows (offsets ±100, lengths to 100), so their
# costs were only pinned by device runs — unverifiable when the TPU relay
# is down.  These pins narrow the config's cost-function windows around
# the TSM parameters of the device-validated optimal alignments
# (TPU_SESSION_LOG.jsonl round-4 `twin1000` step, cigars with re-priced
# costs 16 / 22).  Narrowing is sound for pinning: every narrowed function
# is a restriction of the original (same finite values inside the window,
# INF outside), so narrowing can only REMOVE paths — the cost cannot drop
# below the device-validated optimum — while the device-found optimal
# alignment stays feasible at its exact price — the cost cannot rise
# either.  Equality with the device pin is therefore a real regression
# surface for the 1 kb engine path that survives relay outages.
#
# twin_1000_gap100 (pin 7) is excluded: its optimum uses forward TSMs at
# offsets −60 and +100, so no narrowing keeps the numpy sweeps fast.

def _window(lo, hi):
    from tsalign_tpu.costs import INF, CostFunction

    return CostFunction([(-(2**62), INF), (lo, 0), (hi + 1, INF)])


def _narrowed_1000(cfg, rq_qr, rr_qq, max_len, rev_gap, ldiff):
    import dataclasses

    from tsalign_tpu.costs import INF, CostFunction

    inf_fn = CostFunction([(-(2**62), INF)])
    length = CostFunction(
        [(0, INF), (5, 5), (6, 3), (7, 1), (8, 0), (max_len + 1, INF)]
    )
    return dataclasses.replace(
        cfg,
        rq_qr_offset_costs=_window(*rq_qr) if rq_qr else inf_fn,
        rr_qq_offset_costs=_window(*rr_qq) if rr_qq else inf_fn,
        length_costs=length,
        # ldiff = anti_primary_gap - inner length (pricing.py:19)
        length_difference_costs=_window(*ldiff),
        forward_anti_primary_gap_costs=inf_fn,  # optima are all-reverse
        reverse_anti_primary_gap_costs=_window(*rev_gap),
    )


@pytest.mark.slow  # ~290 s: 38% of the whole default suite (VERDICT r4 #4);
# the cheaper 001ts pin below keeps the narrowed-window 1 kb class in CI
def test_twin_1000_5ts_narrowed_pin():
    """Device-validated optimum 16: 5 reverse TSMs with offsets in
    {-20..-19, +11, +14}, inner lengths 9-14, anti-gaps -5..17."""
    cfg, ref, qry = _load("twin_1000_5ts")
    # Windows stay contiguous through the walk origins: the entrance
    # offset walk starts at ±1 and the exit anti-gap walk at 0, so a
    # window that excludes the path from the origin to the target offset
    # makes the target unreachable even when its own cost is finite.
    cfgN = _narrowed_1000(
        cfg, rq_qr=(-22, 17), rr_qq=(-23, 2), max_len=16, rev_gap=(-8, 20),
        ldiff=(-20, 7),
    )
    res = DenseAligner(cfgN, ref, qry).align()
    assert res.cost == 16


def test_twin_1000_001ts_narrowed_pin():
    """Device-validated optimum 22: 10 substitutions (cost 2 each) plus
    one reverse RQ TSM (base 2) at offset -17, length 13, gap 11."""
    cfg, ref, qry = _load("twin_1000_0.01_ts")
    cfgN = _narrowed_1000(
        cfg, rq_qr=(-18, 1), rr_qq=None, max_len=14, rev_gap=(-2, 12),
        ldiff=(-3, 0),
    )
    res = DenseAligner(cfgN, ref, qry).align()
    assert res.cost == 22


def test_twin_1000_gap100_device_alignment_reprices():
    """twin_1000_gap100 pin (VERDICT r4 weak #6): the device-validated
    optimum uses forward TSMs at offsets -60 and +100 plus a reverse TSM at
    -22, so no window narrowing keeps the CPU module sweeps tractable (a
    sliced 320x220 sub-problem with the required 161-wide windows exceeds
    900 s on the numpy engine).  This pin reconstructs the device-found
    optimal alignment (TPU_SESSION_LOG.jsonl round-4 `twin1000`, cigar
    177=[TSQRF:100:52=:-1]1=[TSQRR:-22:7=:100][TSRQF:-60:8=:-52]715=) and
    re-prices it exactly at 7 under the sample config — pinning the fixture
    content, the pricing algebra, and that cost 7 is ACHIEVABLE on CPU.
    (Optimality itself remains device-verified: cost 7, rounds 4.)"""
    from tsalign_tpu.alignment import (
        PRIMARY_MATCH,
        SECONDARY_MATCH,
        Alignment,
        EqualCostRange,
        TemplateSwitchEntrance,
        TemplateSwitchExit,
    )

    cfg, ref, qry = _load("twin_1000_gap100")
    assert (len(ref), len(qry)) == (1000, 900)

    ecr = EqualCostRange.new_invalid()

    def ts(primary, secondary, direction, offset, length, gap):
        return [
            (1, TemplateSwitchEntrance(offset, ecr, primary, secondary, direction)),
            (length, SECONDARY_MATCH),
            (1, TemplateSwitchExit(gap)),
        ]

    entries = [(177, PRIMARY_MATCH)]
    entries += ts("Query", "Reference", "Forward", 100, 52, -1)
    entries += [(1, PRIMARY_MATCH)]
    entries += ts("Query", "Reference", "Reverse", -22, 7, 100)
    entries += ts("Reference", "Query", "Forward", -60, 8, -52)
    entries += [(715, PRIMARY_MATCH)]
    aln = Alignment(entries)

    assert price_alignment(cfg, ref, qry, aln) == 7
