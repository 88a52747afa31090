"""Column-arrangement model (show/arrangement.py vs ts_arrangement.rs
semantics) + PNG rasterization, driven by the reference's golden TOMLs."""

import os
import subprocess
import sys

import pytest

from tsalign_tpu.result import AlignmentResult
from tsalign_tpu.show.arrangement import SRC, TsArrangement
from tsalign_tpu.show.png import render_png
from tsalign_tpu.show.svg import build_plan, plan_to_svg

GOLDENS = [
    "twin_heli_MDC1-AS1_10",
    "twin_heli_linc01237_114",
    "underscore",
    "twin_ari_chrX_146823507_146823598",
]

TF = "/root/reference/test_files"


def _load(name):
    with open(f"{TF}/{name}.toml") as f:
        return AlignmentResult.from_toml(f.read())


def _arrangement(rec, **kw):
    return TsArrangement(
        rec.reference_offset,
        rec.query_offset,
        len(rec.sequences.reference),
        len(rec.sequences.query),
        rec.alignment.iter_flat(),
        **kw,
    )


@pytest.mark.parametrize("name", GOLDENS)
def test_rows_share_one_column_axis(name):
    rec = _load(name)
    arr = _arrangement(rec)
    w = arr.width()
    assert len(arr.query) == w
    assert len(arr.reference_complement) == w
    assert len(arr.query_complement) == w
    for inner in arr.inners:
        assert len(inner.sequence) == w


@pytest.mark.parametrize("name", GOLDENS)
def test_source_rows_cover_the_sequences_in_order(name):
    """Every source character appears exactly once, in order (source.rs:
    the arrangement is a supersequence of the input with gaps/copies)."""
    rec = _load(name)
    arr = _arrangement(rec)
    for seq_cells, n in (
        (arr.reference, len(rec.sequences.reference)),
        (arr.query, len(rec.sequences.query)),
    ):
        cols = [c.column for c in seq_cells if c.is_char() and c.copy is None]
        assert cols == list(range(n))


@pytest.mark.parametrize("name", GOLDENS)
def test_hidden_chars_match_inner_lengths(name):
    """The primary row hides exactly the TSM inner stretches
    (source.rs:321-334)."""
    rec = _load(name)
    arr = _arrangement(rec)
    hidden_ref = sum(1 for c in arr.reference if c.is_hidden())
    hidden_qry = sum(1 for c in arr.query if c.is_hidden())
    want_ref = want_qry = 0
    for ts in arr.template_switches():
        n = sum(1 for c in ts.inner if c.is_char())
        if ts.primary == "Reference":
            want_ref += n
        else:
            want_qry += n
    assert (hidden_ref, hidden_qry) == (want_ref, want_qry)


@pytest.mark.parametrize("name", GOLDENS)
def test_reverse_inner_matches_complement_columns(name):
    """At secondary-match columns of a reverse TSM, the inner row's
    (primary) character equals the complement row's character - the
    column-exact alignment the reference's inner.rs guarantees."""
    rec = _load(name)
    arr = _arrangement(rec)
    ref_c = rec.sequences.reference_rc[::-1]
    qry_c = rec.sequences.query_rc[::-1]
    checked = 0
    for inner in arr.inners:
        if not inner.complement:
            continue
        ts = inner.template_switch
        comp_cells = (
            arr.reference_complement if ts.secondary == "Reference" else arr.query_complement
        )
        comp_seq = ref_c if ts.secondary == "Reference" else qry_c
        prim_seq = (
            rec.sequences.reference if ts.primary == "Reference" else rec.sequences.query
        )
        for col, c in enumerate(inner.sequence):
            if c.kind == SRC and not c.lower and not c.optional and c.copy is None:
                cc = comp_cells[col]
                if cc.kind == SRC and not cc.lower:
                    assert prim_seq[c.column] == comp_seq[cc.column]
                    checked += 1
    assert checked > 0


@pytest.mark.parametrize("name", GOLDENS)
def test_remove_empty_columns_preserves_content(name):
    rec = _load(name)
    arr = _arrangement(rec)
    before = ["".join(ch.kind for ch in row if not ch.is_blank_or_hidden()) for row in
              (arr.reference, arr.query)]
    arr.remove_empty_columns()
    after = ["".join(ch.kind for ch in row if not ch.is_blank_or_hidden()) for row in
             (arr.reference, arr.query)]
    assert before == after
    w = arr.width()
    assert all(len(x.sequence) == w for x in arr.inners)


def test_limit_context_trims_and_keeps_interesting_columns():
    rec = _load("twin_ari_chrX_146823507_146823598")
    arr = _arrangement(rec)
    arr.remove_empty_columns()
    full = arr.width()
    ref_range, qry_range = arr.limit_context_to(25)
    assert arr.width() < full
    assert ref_range.start > 0
    # The trimmed arrangement still holds every TSM's inner characters.
    for inner in arr.inners:
        assert any(c.is_char() for c in inner.sequence)


def test_equal_cost_range_marks_optional_chars():
    rec = _load("twin_ari_chrX_146823507_146823598")  # nonzero equal-cost ranges
    arr = _arrangement(rec, visualise_equal_cost_ranges=True)
    n_opt = sum(
        1 for x in arr.inners for c in x.sequence if getattr(c, "optional", False)
    )
    assert n_opt > 0


@pytest.mark.parametrize("name", GOLDENS[:2])
def test_png_renders(tmp_path, name):
    rec = _load(name)
    plan = build_plan(rec, arrows=True, context=25, equal_cost_ranges=True)
    out = tmp_path / "out.png"
    render_png(plan, str(out), zoom=1.5)
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 1000


def test_show_cli_png(tmp_path):
    out_png = tmp_path / "heli.png"
    out_svg = tmp_path / "heli.svg"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "tsalign_tpu.cli",
            "show",
            "-i",
            f"{TF}/twin_heli_MDC1-AS1_10.toml",
            "-n",
            f"{TF}/twin_heli_MDC1-AS1_10_no_ts.toml",
            "-s",
            str(out_svg),
            "-p",
            str(out_png),
            "-a",
            "-z",
            "30",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert out_png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    svg = out_svg.read_text()
    assert "Reference complement:" in svg


def test_svg_renders_no_ts_block():
    rec = _load("twin_heli_MDC1-AS1_10")
    with open(f"{TF}/twin_heli_MDC1-AS1_10_no_ts.toml") as f:
        no_ts = AlignmentResult.from_toml(f.read())
    plan = build_plan(rec, no_ts, context=20)
    svg = plan_to_svg(plan)
    # two Reference: labels - the TS arrangement and the no-TS arrangement
    assert svg.count("Reference:") == 2
    assert svg.count("Query:") == 2
