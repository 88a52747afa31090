"""Shipped scenario configs and fixtures beyond the goldens: the exactness
chain under every parseable test_files/config/* cost model, plus the
min-length regression pairs (test_files/min_length_test.sh scenario).

config/indel is skipped: it uses the legacy 4-key base-cost format
(`rr_cost = ...`) that the reference's own strict parser (config/io.rs:41-48
expects rrf_cost...) cannot read either.
"""

import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.fasta import parse_pair_fasta_file
from tsalign_tpu.geometry import AlignmentRange
from tsalign_tpu.jax_engine import JaxAligner
from tsalign_tpu.oracle import OracleAligner

from conftest import has_reference, reference_path

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


@pytest.mark.parametrize(
    "cdir,alname,expect",
    [
        ("no_intra_forward_jump", "dna", 12),
        ("small", "dna-n", 4),
        ("range", "dna-n", 7),
    ],
)
def test_scenario_config_exactness_chain(cdir, alname, expect):
    """oracle == numpy == jax on twin_10_ts under each scenario cost model
    (asymmetric offset windows, inf forward kinds, min-length-1 smalls)."""
    al = get_alphabet(alname)
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", cdir, "config.tsa"), al
    )
    r, q = parse_pair_fasta_file(reference_path("test_files", "twin_10_ts.fa"))
    ref, qry = al.encode(r.sequence.upper()), al.encode(q.sequence.upper())
    oc, _ = OracleAligner(cfg, ref, qry).align()
    nc = DenseAligner(cfg, ref, qry).align().cost
    jc = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False).align().cost
    assert oc == nc == jc == expect


@pytest.mark.parametrize(
    "fixture,expect",
    [("twin_min_length_test1.fa", 2), ("twin_min_length_test2.fa", 6)],
)
def test_min_length_fixtures(fixture, expect):
    """The min_length_test.sh pairs under config/experiments with
    R40..75 Q41..75 (regression pin; all reference min-length strategies
    produce the same optimum by construction)."""
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", "experiments", "config.tsa"), al
    )
    r, q = parse_pair_fasta_file(reference_path("test_files", fixture))
    ref, qry = al.encode(r.sequence.upper()), al.encode(q.sequence.upper())
    rng = AlignmentRange(40, 41, 75, 75)
    res = JaxAligner(cfg, ref, qry, range_=rng, chunk=32, keep_fields=False).align()
    assert res.cost == expect
