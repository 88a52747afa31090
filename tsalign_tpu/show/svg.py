"""SVG rendering of template-switch alignments.

Counterpart of lib_tsshow/src/svg.rs (create_ts_svg): rows for the reference
and query with the primary alignment, lowercase-styled secondary stretches,
jump arrows SP1->SP2 and SP3->SP4, and per-TSM inner rows showing the 2-3
alignment against the (complemented) ancestor.  The reference embeds
hand-digitized vector fonts (svg/font.rs); this renderer uses standard SVG
<text> with a monospace font - same information, portable output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from ..result import AlignmentResult
from .parse_template_switches import TSShow, parse

CW = 8.0  # character cell width
CH = 16.0  # row height
PAD = 24.0

_STYLE = """
  text { font-family: "DejaVu Sans Mono", monospace; font-size: 13px; }
  .label { fill: #555; }
  .match { fill: #111; }
  .sub { fill: #c22; font-weight: bold; }
  .gap { fill: #999; }
  .secondary { fill: #06c; }
  .inner { fill: #067; }
  .arrow { stroke: #d70; stroke-width: 1.4; fill: none; marker-end: url(#ah); }
  .comp { fill: #888; }
  .ecr { stroke: #0a8; stroke-width: 3.0; opacity: 0.7; }
"""


@dataclass
class _Row:
    label: str
    cells: List[tuple]  # (char, css_class)


def _esc(c: str) -> str:
    return {"<": "&lt;", ">": "&gt;", "&": "&amp;"}.get(c, c)


def _alignment_rows(result: AlignmentResult) -> tuple:
    """Top-level reference/query rows of the primary alignment, with
    secondary stretches marked; returns (ref_row, qry_row, ts_spans)."""
    seqs = result.sequences
    ref, qry = seqs.reference, seqs.query
    i, j = result.reference_offset, result.query_offset
    rrow: List[tuple] = []
    qrow: List[tuple] = []
    spans = []  # (col_start, col_end) per TSM in alignment columns
    col = 0
    in_ts = None
    p_idx = 0
    for count, t in result.alignment.entries if result.alignment else []:
        if not isinstance(t, str):
            if hasattr(t, "first_offset"):  # entrance
                in_ts = {
                    "start_col": col,
                    "primary": t.primary,
                    "p_idx": i if t.primary == "Reference" else j,
                    "sp1": (i, j),
                }
                p_idx = in_ts["p_idx"]
            else:  # exit
                ag = t.anti_primary_gap
                if in_ts["primary"] == "Reference":
                    i, j = p_idx, in_ts["sp1"][1] + ag
                else:
                    i, j = in_ts["sp1"][0] + ag, p_idx
                spans.append((in_ts["start_col"], col))
                in_ts = None
            continue
        for _ in range(count):
            if in_ts is not None:
                # secondary ops: show the primary (descendant) chars in the
                # primary's row, blank in the other row
                if t in ("SecondaryMatch", "SecondarySubstitution", "SecondaryInsertion"):
                    ch = (ref if in_ts["primary"] == "Reference" else qry)[p_idx]
                    cell = (ch.lower(), "secondary")
                    blank = (" ", "gap")
                    if in_ts["primary"] == "Reference":
                        rrow.append(cell)
                        qrow.append(blank)
                    else:
                        rrow.append(blank)
                        qrow.append(cell)
                    p_idx += 1
                    col += 1
                # secondary deletions consume no primary char: no column
                continue
            if t.endswith(("Match", "Substitution")):
                cls = "match" if ref[i] == qry[j] else "sub"
                rrow.append((ref[i], cls))
                qrow.append((qry[j], cls))
                i += 1
                j += 1
            elif t.endswith("Deletion"):
                rrow.append((ref[i], "match"))
                qrow.append(("-", "gap"))
                i += 1
            else:  # insertion
                rrow.append(("-", "gap"))
                qrow.append((qry[j], "match"))
                j += 1
            col += 1
    return rrow, qrow, spans


def create_ts_svg(
    result: AlignmentResult,
    no_ts_result: Optional[AlignmentResult] = None,
    arrows: bool = True,
    context: Optional[int] = None,
    complements: bool = False,
    equal_cost_ranges: bool = False,
) -> str:
    """Render the alignment as an SVG document string
    (lib_tsshow/src/svg.rs:69 create_ts_svg counterpart).

    complements: render complement rows across the whole alignment instead
    of just around the template switches (show.rs:57-59 -c); equal_cost_
    ranges: mark how far each TSM's switchpoints can shift at equal cost
    (show.rs:66-68 -e)."""
    if not result.has_target:
        return create_error_svg("alignment has no target")
    switches = parse(result)
    rrow, qrow, spans = _alignment_rows(result)

    rows: List[_Row] = [
        _Row("ref", rrow),
        _Row("qry", qrow),
    ]
    # Complement rows: the bare minimum (TSM neighbourhoods) by default,
    # the full sequences with complements=True.
    if switches or complements:
        near = set()
        if not complements:
            for s, e in spans:
                near.update(range(max(0, s - 4), e + 4))

        def comp_row(cells):
            out = []
            for col, (ch, cls) in enumerate(cells):
                show = complements or col in near
                cc = _complement(ch.upper()).lower() if ch.isalpha() else " "
                out.append((cc if show else " ", "comp"))
            return out

        rows.insert(1, _Row("ref~", comp_row(rrow)))
        rows.insert(3, _Row("qry~", comp_row(qrow)))
    # Per-TSM inner rows (the 2-3 alignment vs the complemented ancestor).
    seqs = result.sequences
    for k, ts in enumerate(switches, 1):
        e = ts.entrance
        secondary_seq = (
            seqs.reference if e.secondary == "Reference" else seqs.query
        )
        cells = []
        pos = ts.sp2_secondary
        for count, t in ts.inner:
            for _ in range(count):
                if t.endswith(("Match", "Substitution", "Deletion")):
                    if e.direction == "Forward":
                        ch = secondary_seq[pos] if 0 <= pos < len(secondary_seq) else "?"
                        pos += 1
                    else:
                        ch = (
                            _complement(secondary_seq[pos - 1])
                            if 0 < pos <= len(secondary_seq)
                            else "?"
                        )
                        pos -= 1
                    cells.append((ch, "inner"))
                else:
                    cells.append(("-", "gap"))
        rows.append(
            _Row(
                f"TS{k} 2-3 ({'R' if e.secondary == 'Reference' else 'Q'}"
                f"{'rc' if e.direction == 'Reverse' else ''})",
                cells,
            )
        )

    if context is not None and spans:
        lo = max(0, min(s for s, _ in spans) - context)
        hi = max(e for _, e in spans) + context
        for r in rows:
            if r.label in ("ref", "qry", "ref~", "qry~"):
                r.cells = r.cells[lo:hi]
        spans = [(s - lo, e - lo) for s, e in spans]

    ncols = max((len(r.cells) for r in rows), default=0)
    label_w = max((len(r.label) for r in rows), default=3) * 7.5 + 12
    width = label_w + ncols * CW + 2 * PAD
    height = (len(rows) + 2) * CH + 2 * PAD

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
        f'height="{height:.0f}" viewBox="0 0 {width:.0f} {height:.0f}">',
        f"<style>{_STYLE}</style>",
        '<defs><marker id="ah" markerWidth="8" markerHeight="8" refX="6" refY="3" '
        'orient="auto"><path d="M0,0 L6,3 L0,6 z" fill="#d70"/></marker></defs>',
        f'<rect width="{width:.0f}" height="{height:.0f}" fill="white"/>',
    ]
    y = PAD + CH
    out.append(
        f'<text x="{PAD}" y="{y}" class="label">cost {int(result.cost)}'
        + (f" (no-ts {int(no_ts_result.cost)})" if no_ts_result else "")
        + f", {len(switches)} template switch(es)</text>"
    )
    y += CH
    row_y = {}
    for r in rows:
        y += CH
        row_y[r.label] = y
        out.append(f'<text x="{PAD}" y="{y}" class="label">{_esc(r.label)}</text>')
        buf = []
        cur_cls = None
        x0 = PAD + label_w
        col0 = 0
        for col, (ch, cls) in enumerate(r.cells):
            if cls != cur_cls and buf:
                out.append(
                    f'<text x="{x0 + col0 * CW:.1f}" y="{y}" class="{cur_cls}" '
                    f'textLength="{len(buf) * CW:.1f}">{"".join(map(_esc, buf))}</text>'
                )
                buf = []
            if not buf:
                col0, cur_cls = col, cls
            buf.append(ch)
        if buf:
            out.append(
                f'<text x="{x0 + col0 * CW:.1f}" y="{y}" class="{cur_cls}" '
                f'textLength="{len(buf) * CW:.1f}">{"".join(map(_esc, buf))}</text>'
            )
    if arrows:
        x0 = PAD + label_w
        ytop = row_y.get("ref", PAD) - CH * 0.8
        for s, e in spans:
            xs = x0 + s * CW
            xe = x0 + e * CW
            mid = (xs + xe) / 2
            out.append(
                f'<path class="arrow" d="M{xs:.1f},{ytop + 4:.1f} '
                f"Q{mid:.1f},{ytop - 8:.1f} {xe:.1f},{ytop + 4:.1f}\"/>"
            )
    if equal_cost_ranges:
        # Bars under the query row marking how far each switchpoint pair can
        # shift at equal cost (EqualCostRange quadruple per TSM).
        x0 = PAD + label_w
        ybar = row_y.get("qry", PAD) + CH * 0.35
        for (s, e), ts in zip(spans, switches):
            ecr = ts.entrance.equal_cost_range
            for base, lo_d, hi_d in (
                (s, ecr.min_start, ecr.max_start),
                (e, ecr.min_end, ecr.max_end),
            ):
                xs = x0 + (base + lo_d) * CW
                xe = x0 + (base + hi_d) * CW + CW * 0.5
                out.append(
                    f'<line class="ecr" x1="{xs:.1f}" y1="{ybar:.1f}" '
                    f'x2="{xe:.1f}" y2="{ybar:.1f}"/>'
                )
    out.append("</svg>")
    return "\n".join(out)


def create_error_svg(message: str) -> str:
    """svg.rs:1043 create_error_svg counterpart."""
    return (
        '<svg xmlns="http://www.w3.org/2000/svg" width="640" height="60">'
        f'<style>{_STYLE}</style><rect width="640" height="60" fill="#fee"/>'
        f'<text x="16" y="35" class="sub">{"".join(map(_esc, message))}</text></svg>'
    )


def _complement(c: str) -> str:
    return {"A": "T", "T": "A", "G": "C", "C": "G", "U": "A"}.get(c, c)
