import os

import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.costs import INF, CostFunction

from conftest import has_reference, reference_path

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

SAMPLE = reference_path("sample_tsa_config", "config.tsa")


def test_parse_sample_config():
    cfg = TemplateSwitchConfig.from_path(SAMPLE, get_alphabet("dna-n"))
    assert cfg.left_flank_length == 0
    assert cfg.right_flank_length == 0
    assert cfg.base_cost == {
        "rrf": 3, "rqf": 2, "qrf": 2, "qqf": 3,
        "rrr": 3, "rqr": 2, "qrr": 2, "qqr": 3,
    }
    assert cfg.template_switch_min_length == 5
    assert cfg.length_costs.evaluate(4) == INF
    assert cfg.length_costs.evaluate(5) == 5
    assert cfg.length_costs.evaluate(7) == 1
    assert cfg.length_costs.evaluate(8) == 0
    assert cfg.length_costs.evaluate(99) == 0
    assert cfg.length_costs.evaluate(100) == INF
    assert cfg.rq_qr_offset_costs.evaluate(0) == 0
    assert cfg.rq_qr_offset_costs.evaluate(-100) == 0
    assert cfg.rq_qr_offset_costs.evaluate(-101) == INF
    assert cfg.rq_qr_offset_costs.evaluate(100) == 0
    assert cfg.rq_qr_offset_costs.evaluate(101) == INF
    assert cfg.reverse_anti_primary_gap_costs.evaluate(-(10**9)) == 0
    assert cfg.forward_anti_primary_gap_costs.evaluate(0) == 0
    assert cfg.forward_anti_primary_gap_costs.evaluate(1) == INF

    a = cfg.alphabet
    pec = cfg.primary_edit_costs
    assert pec.match_or_substitution_cost(a.index("A"), a.index("A")) == 0
    assert pec.match_or_substitution_cost(a.index("A"), a.index("C")) == 2
    assert pec.match_or_substitution_cost(a.index("A"), a.index("N")) == 0
    assert pec.gap_cost(a.index("G"), is_first=True) == 3
    assert pec.gap_cost(a.index("G"), is_first=False) == 1
    assert cfg.secondary_reverse_edit_costs.gap_cost(a.index("T"), True) == 9


def test_roundtrip_sample_config():
    cfg = TemplateSwitchConfig.from_path(SAMPLE, get_alphabet("dna-n"))
    text = cfg.display()
    cfg2 = TemplateSwitchConfig.parse_plain(text, get_alphabet("dna-n"))
    assert cfg == cfg2


@pytest.mark.parametrize(
    "variant,alphabet",
    [
        ("bench", "dna"),
        ("small", "dna-n"),
        ("range", "dna-n"),
        ("experiments", "dna-n"),
        ("chainalign", "dna"),
        ("chainalignn", "dna-n"),
        ("no_intra_forward_jump", "dna-n"),
    ],
)
def test_parse_config_variants(variant, alphabet):
    path = reference_path("test_files", "config", variant, "config.tsa")
    if not os.path.exists(path):
        pytest.skip(f"missing {path}")
    try:
        cfg = TemplateSwitchConfig.from_path(path, get_alphabet(alphabet))
    except ValueError as e:
        if "alphabet" in str(e).lower():
            other = "dna" if alphabet == "dna-n" else "dna-n"
            cfg = TemplateSwitchConfig.from_path(path, get_alphabet(other))
        else:
            raise
    cfg.verify()
    text = cfg.display()
    cfg2 = TemplateSwitchConfig.parse_plain(text, cfg.alphabet)
    assert cfg == cfg2


def test_bench_config_values():
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", "bench", "config.tsa"),
        get_alphabet("dna"),
    )
    assert cfg.base_cost["rrf"] == INF
    assert cfg.base_cost["rrr"] == 2
    assert cfg.template_switch_min_length == 10
    assert cfg.length_difference_costs.evaluate(-15) == 2
    assert cfg.length_difference_costs.evaluate(0) == 0
    assert cfg.length_difference_costs.evaluate(15) == 2
    assert cfg.length_difference_costs.evaluate(50) == 4
    assert cfg.length_difference_costs.evaluate(101) == INF


def test_default_config_matches_reference_default():
    cfg = TemplateSwitchConfig.default(get_alphabet("dna-n"))
    cfg.verify()
    assert cfg.template_switch_min_length == 5
    assert cfg.rr_qq_offset_costs.evaluate(0) == 0
    assert cfg.rr_qq_offset_costs.evaluate(1) == INF


def test_cost_function_min_semantics():
    # Mirrors the reference's exhaustive min() test (cost_function.rs:237-351).
    f = CostFunction([(2, 100), (3, 1), (4, 2), (6, 1), (8, 3), (70, 2), (100, 100)])
    assert f.min_in(0, 2) is None
    assert f.min_in(2, 2) is None
    assert f.min_in(2, 3) == 100
    assert f.min_in(3, 4) == 1
    assert f.min_in(4, 5) == 2
    assert f.min_in(5, 6) == 2
    assert f.min_in(6, 7) == 1
    assert f.min_in(22, 33) == 3
    assert f.min_from(0) == 1
    assert f.min_from(7) == 1
    assert f.min_from(8) == 2
    assert f.min_from(99) == 2
    assert f.min_from(100) == 100
    assert f.min_from(101) == 100


def test_v_shape():
    assert CostFunction([(-2, 2), (0, 1), (2, 3)]).is_v_shaped()
    assert CostFunction([(-2, 3), (0, 3), (2, 3)]).is_v_shaped()
    assert not CostFunction([(-2, 2), (0, 3), (2, 3)]).is_v_shaped()
    assert not CostFunction([(-2, 3), (0, 3), (2, 2)]).is_v_shaped()
    assert CostFunction([(-2, 2), (0, 2), (2, 3)]).is_v_shaped()
    assert CostFunction([(-2, 2), (1, 3), (2, 3)]).is_v_shaped()


def test_maximum_finite_input():
    f = CostFunction([(0, INF), (5, 0), (100, INF)])
    assert f.minimum_finite_input() == 5
    assert f.maximum_finite_input() == 99
    g = CostFunction([(-(2**62), 0)])
    assert g.maximum_finite_input() is None
