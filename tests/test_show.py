"""Visualization: TSM parsing, plain text, SVG output."""

import io
import xml.dom.minidom

import numpy as np

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.aligner import Aligner
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.show.parse_template_switches import parse
from tsalign_tpu.show.plain_text import show_template_switches
from tsalign_tpu.show.svg import create_error_svg, create_ts_svg


def _result_with_tsm():
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(5)
    n = 30
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    qry[10:20] = [comp[c] for c in qry[10:20]][::-1]
    r = Aligner(costs=cfg, engine="numpy").align(al.decode(ref), al.decode(qry))
    assert r.has_target()
    return r.result


def test_parse_template_switches_coordinates():
    res = _result_with_tsm()
    switches = parse(res)
    assert len(switches) == 1
    ts = switches[0]
    assert ts.length >= 10
    assert ts.exit.anti_primary_gap == ts.sp4_query - ts.sp1_query or (
        ts.entrance.primary == "Query"
        and ts.exit.anti_primary_gap == ts.sp4_reference - ts.sp1_reference
    )


def test_plain_text_render():
    res = _result_with_tsm()
    out = io.StringIO()
    show_template_switches(out, res)
    text = out.getvalue()
    assert "Showing template switch 1" in text
    assert "Direction: reverse" in text
    assert "Switch process:" in text


def test_svg_is_wellformed_xml():
    res = _result_with_tsm()
    svg = create_ts_svg(res)
    doc = xml.dom.minidom.parseString(svg)
    assert doc.documentElement.tagName == "svg"
    # full row set of the reference renderer (svg.rs:394-627)
    for label in ("Reference:", "Query:", "Reference complement:",
                  "Query complement:", "TS-A inner:", "Legend:"):
        assert label in svg, label
    # jump arrows SP1->SP2 / SP3->SP4 with the reference's marker
    assert svg.count("arrow_head_red") >= 3


def test_error_svg():
    svg = create_error_svg("boom & <bust>")
    xml.dom.minidom.parseString(svg)


def test_svg_complements_and_equal_cost_ranges():
    res = _result_with_tsm()
    svg = create_ts_svg(res, complements=True, equal_cost_ranges=True)
    xml.dom.minidom.parseString(svg)
    assert "Reference complement:" in svg and "Query complement:" in svg
