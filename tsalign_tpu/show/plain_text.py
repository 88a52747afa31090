"""Plain-text rendering of template switches.

Counterpart of lib_tsshow/src/plain_text.rs: for each TSM, render the
primary alignment context around SP1/SP4 together with the secondary (2-3)
alignment against the (complemented) ancestor, with gap characters.
"""

from __future__ import annotations

from typing import Optional, TextIO

from ..result import AlignmentResult
from .parse_template_switches import TSShow, parse

_GAP = "-"


def _expand(seq: str, start: int, ops, consume: str, direction: int = 1) -> str:
    """Render one side of an alignment: characters of `seq` starting at
    `start`, consuming on ops named in `consume`, gaps otherwise."""
    out = []
    pos = start
    for count, t in ops:
        for _ in range(count):
            if any(t.endswith(sfx) for sfx in ("Match", "Substitution")):
                out.append(seq[pos] if 0 <= pos < len(seq) else "?")
                pos += direction
            elif t.endswith(consume):
                out.append(seq[pos] if 0 <= pos < len(seq) else "?")
                pos += direction
            else:
                out.append(_GAP)
    return "".join(out)


def render_ts(out: TextIO, result: AlignmentResult, ts: TSShow, index: int) -> None:
    e = ts.entrance
    seqs = result.sequences
    primary_seq = seqs.reference if e.primary == "Reference" else seqs.query
    secondary_seq = seqs.reference if e.secondary == "Reference" else seqs.query
    p_label = "reference" if e.primary == "Reference" else "query"
    s_label = "reference" if e.secondary == "Reference" else "query"

    kind = (
        f"TS{'R' if e.primary == 'Reference' else 'Q'}"
        f"{'R' if e.secondary == 'Reference' else 'Q'}"
        f"{'F' if e.direction == 'Forward' else 'R'}"
    )
    out.write(
        f"Template switch {index}: {kind}  "
        f"SP1=(R{ts.sp1_reference},Q{ts.sp1_query}) "
        f"SP2={s_label}[{ts.sp2_secondary}] "
        f"SP3={s_label}[{ts.sp3_secondary}] "
        f"SP4=(R{ts.sp4_reference},Q{ts.sp4_query}) "
        f"first_offset={e.first_offset} "
        f"anti_primary_gap={ts.exit.anti_primary_gap} "
        f"length={ts.length}\n"
    )

    p1 = ts.sp1_reference if e.primary == "Reference" else ts.sp1_query
    prow = _expand(primary_seq, p1, ts.inner, "Insertion")
    if e.direction == "Forward":
        srow = _expand(secondary_seq, ts.sp2_secondary, ts.inner, "Deletion")
    else:
        comp = _COMPLEMENT_TABLE
        rendered = []
        pos = ts.sp2_secondary
        for count, t in ts.inner:
            for _ in range(count):
                if t.endswith(("Match", "Substitution", "Deletion")):
                    c = secondary_seq[pos - 1] if 0 < pos <= len(secondary_seq) else "?"
                    rendered.append(comp.get(c, c))
                    pos -= 1
                else:
                    rendered.append(_GAP)
        srow = "".join(rendered)
    mid = "".join(
        "|" if a == b and a != _GAP else " " for a, b in zip(prow, srow)
    )
    out.write(f"  {p_label} (descendant) [{p1}..{ts.sp4_primary}): {prow}\n")
    out.write(f"  {' ' * (len(p_label) + 14 + len(str(p1)) + len(str(ts.sp4_primary)))}  {mid}\n")
    out.write(f"  {s_label} (ancestor, {'fwd' if e.direction == 'Forward' else 'rev-comp'}): {srow}\n")
    out.write("\n")


_COMPLEMENT_TABLE = {
    "A": "T", "T": "A", "G": "C", "C": "G", "U": "A", "N": "N",
}


def show_template_switches(
    out: TextIO,
    result: AlignmentResult,
    no_ts_result: Optional[AlignmentResult] = None,
) -> None:
    if not result.has_target:
        out.write("alignment has no target (search did not finish)\n")
        return
    switches = parse(result)
    out.write(f"CIGAR: {result.cigar()}\n")
    out.write(f"cost: {int(result.cost)}\n")
    if no_ts_result is not None:
        out.write(f"no-ts cost: {int(no_ts_result.cost)}\n")
    out.write(f"template switches: {len(switches)}\n\n")
    for k, ts in enumerate(switches, 1):
        render_ts(out, result, ts, k)
