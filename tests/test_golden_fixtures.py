"""End-to-end checks on the reference's shipped fixtures with the shipped
cost model: all three engines agree with the exact oracle, alignments
re-price exactly, and the CLI produces consumable TOML."""

import os
import subprocess
import sys

import numpy as np
import pytest

# CLI subprocesses don't inherit conftest's in-process CPU forcing; without
# this they would initialise JAX against the (exclusive) TPU relay.
_CPU_ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.fasta import parse_pair_fasta_file
from tsalign_tpu.jax_engine import JaxAligner
from tsalign_tpu.oracle import OracleAligner
from tsalign_tpu.pricing import price_alignment

from conftest import has_reference, reference_path

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def _load(fixture):
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("sample_tsa_config", "config.tsa"), al
    )
    r1, r2 = parse_pair_fasta_file(reference_path("test_files", fixture))
    return cfg, al.encode(r1.sequence.upper()), al.encode(r2.sequence.upper())


@pytest.mark.parametrize(
    "fixture",
    ["twin_10_eq.fa", "twin_10_ts.fa", "twin_10_ts_only.fa", "twin_10_no_anchors.fa",
     "twin_10_repetitive.fa", "twin_20_badends.fa"],
)
def test_fixture_engines_agree_with_oracle(fixture):
    cfg, ref, qry = _load(fixture)
    oc, oaln = OracleAligner(cfg, ref, qry).align()
    nc, naln = DenseAligner(cfg, ref, qry).align_with_traceback()
    jc = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False).align().cost
    assert oc == nc == jc, (fixture, oc, nc, jc)
    assert price_alignment(cfg, ref, qry, naln) == nc
    assert price_alignment(cfg, ref, qry, oaln) == oc


def test_fixture_ts_beats_no_ts():
    cfg, ref, qry = _load("twin_10_ts.fa")
    with_ts = DenseAligner(cfg, ref, qry).align().cost
    no_ts = DenseAligner(cfg, ref, qry, max_template_switches=0).align().cost
    assert with_ts < no_ts


def test_cli_roundtrip(tmp_path):
    out = tmp_path / "out.toml"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "tsalign_tpu.cli",
            "align",
            "-p",
            reference_path("test_files", "twin_10_ts.fa"),
            "-c",
            reference_path("sample_tsa_config"),
            "--engine",
            "numpy",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=_CPU_ENV,
    )
    assert r.returncode == 0, r.stderr
    assert "cost:" in r.stdout
    from tsalign_tpu.result import AlignmentResult

    res = AlignmentResult.from_toml(out.read_text())
    assert res.has_target
    # show consumes the TOML
    r2 = subprocess.run(
        [sys.executable, "-m", "tsalign_tpu.cli", "show", "-i", str(out)],
        capture_output=True,
        text=True,
        timeout=120,
        env=_CPU_ENV,
    )
    assert r2.returncode == 0, r2.stderr
    assert "Showing template switch 1" in r2.stdout
    assert "Switch process:" in r2.stdout


def test_cli_matrix_and_gap_affine():
    for method, expect in (("matrix", "Cost:"), ("a-star-gap-affine", "cost:")):
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "tsalign_tpu.cli",
                "align",
                "-p",
                reference_path("test_files", "twin_10_ts.fa"),
                "-c",
                reference_path("sample_tsa_config"),
                "--alignment-method",
                method,
                "--engine",
                "numpy",
            ],
            capture_output=True,
            text=True,
            timeout=300,
            env=_CPU_ENV,
        )
        assert r.returncode == 0, (method, r.stderr)
        assert expect in r.stdout


@pytest.mark.parametrize(
    "name,expect",
    [
        ("twin_heli_MDC1-AS1_10", 24),
        ("twin_heli_linc01237_114", 25),
        ("underscore", 23),
        ("twin_ari_chrX_146823507_146823598", 6),
    ],
)
def test_golden_alignment_reprices_exactly(name, expect):
    """The reference's shipped golden alignments re-price to exactly their
    recorded costs under our cost model (config/experiments), pinning our
    edge semantics to the reference's on real 500-1100 bp data."""
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.postprocess import _advance
    from tsalign_tpu.result import AlignmentResult

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", "experiments", "config.tsa"), al
    )
    rec = AlignmentResult.from_toml(
        open(reference_path("test_files", f"{name}.toml")).read()
    )
    ref = al.encode(rec.sequences.reference.upper())
    qry = al.encode(rec.sequences.query.upper())
    ro, qo = rec.reference_offset, rec.query_offset
    rl, ql = _advance(ro, qo, rec.alignment.entries)
    rng = AlignmentRange(ro, qo, rl, ql)
    assert price_alignment(cfg, ref, qry, rec.alignment, range_=rng) == expect


@pytest.mark.parametrize(
    "name",
    [
        "twin_heli_MDC1-AS1_10",
        "twin_heli_linc01237_114",
        "underscore",
        "twin_ari_chrX_146823507_146823598",
    ],
)
def test_golden_equal_cost_ranges_match(name):
    """Our equal-cost-range postprocessing reproduces the reference's
    recorded ranges exactly on all shipped golden alignments."""
    import copy

    from tsalign_tpu.alignment import TemplateSwitchEntrance
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.postprocess import _advance, compute_ts_equal_cost_ranges
    from tsalign_tpu.result import AlignmentResult

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("test_files", "config", "experiments", "config.tsa"), al
    )
    rec = AlignmentResult.from_toml(
        open(reference_path("test_files", f"{name}.toml")).read()
    )
    ref = al.encode(rec.sequences.reference.upper())
    qry = al.encode(rec.sequences.query.upper())
    ro, qo = rec.reference_offset, rec.query_offset
    rl, ql = _advance(ro, qo, rec.alignment.entries)
    rng = AlignmentRange(ro, qo, rl, ql)
    golden = [
        t.equal_cost_range
        for _, t in rec.alignment.entries
        if isinstance(t, TemplateSwitchEntrance)
    ]
    work = copy.deepcopy(rec.alignment)
    compute_ts_equal_cost_ranges(work, cfg, ref, qry, rng)
    ours = [
        t.equal_cost_range
        for _, t in work.entries
        if isinstance(t, TemplateSwitchEntrance)
    ]
    assert golden == ours


def test_cli_cost_limit_without_target(tmp_path):
    """--cost-limit below the optimum yields WithoutTarget/ExceededCostLimit
    (generic_a_star lib.rs:167-187 result semantics)."""
    out = tmp_path / "out.toml"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "tsalign_tpu.cli",
            "align",
            "-p",
            reference_path("test_files", "twin_10_ts.fa"),
            "-c",
            reference_path("sample_tsa_config"),
            "--engine",
            "numpy",
            "--cost-limit",
            "3",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=_CPU_ENV,
    )
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert 'type = "WithoutTarget"' in text
    assert 'astar_result_type = "ExceededCostLimit"' in text
