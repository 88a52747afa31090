"""twin_100 / twin_1000 fixture-family pins (VERDICT r1 item 9).

The reference ships no golden costs for these synthetic twins
(/root/reference/test_files/twin_{100,1000}_*.fa), so the pins here are
engine-derived and cross-validated three ways: numpy engine == JAX engine,
the traceback re-prices to the engine cost, and the structural expectations
hold (equal twins cost 0; costs grow with the mutation rate).

The TS variants (twin_1000_*ts) need deep module sweeps at 1000 bp that are
device work, not CPU suite work — they are covered by
scripts/validate_goldens.py-style device runs, not here.
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
