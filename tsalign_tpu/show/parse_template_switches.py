"""Extract per-TSM views from an AlignmentResult.

Counterpart of lib_tsshow/src/plain_text/parse_template_switches.rs: walk the
RLE alignment with coordinate tracking and produce, per template switch, the
switchpoints SP1-SP4, the kind, and the op streams of the upstream primary,
the secondary (2-3) alignment and the downstream primary.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..alignment import TemplateSwitchEntrance, TemplateSwitchExit
from ..result import AlignmentResult


@dataclass
class TSShow:
    entrance: TemplateSwitchEntrance
    exit: TemplateSwitchExit
    # SP1 (entrance) / SP4 (reentry) in primary coordinates, SP2/SP3 in
    # secondary coordinates.
    sp1_reference: int = 0
    sp1_query: int = 0
    sp2_secondary: int = 0
    sp3_secondary: int = 0
    sp4_primary: int = 0
    sp4_reference: int = 0
    sp4_query: int = 0
    length: int = 0  # primary characters consumed by the 2-3 alignment
    upstream: List[Tuple[int, object]] = field(default_factory=list)
    inner: List[Tuple[int, object]] = field(default_factory=list)
    downstream: List[Tuple[int, object]] = field(default_factory=list)


def parse(result: AlignmentResult) -> List[TSShow]:
    if result.alignment is None:
        return []
    out: List[TSShow] = []
    i = result.reference_offset
    j = result.query_offset
    upstream: List[Tuple[int, object]] = []
    cur: TSShow = None  # type: ignore
    p_idx = s_idx = 0

    for count, t in result.alignment.entries:
        if isinstance(t, TemplateSwitchEntrance):
            cur = TSShow(entrance=t, exit=None)  # type: ignore
            cur.sp1_reference, cur.sp1_query = i, j
            e_s = (i if t.secondary == "Reference" else j) + t.first_offset
            cur.sp2_secondary = e_s
            p_idx = i if t.primary == "Reference" else j
            s_idx = e_s
            cur.upstream = list(upstream)
        elif isinstance(t, TemplateSwitchExit):
            assert cur is not None
            cur.exit = t
            cur.sp3_secondary = s_idx
            cur.sp4_primary = p_idx
            cur.length = p_idx - (
                cur.sp1_reference
                if cur.entrance.primary == "Reference"
                else cur.sp1_query
            )
            ag = t.anti_primary_gap
            if cur.entrance.primary == "Reference":
                i, j = p_idx, cur.sp1_query + ag
            else:
                i, j = cur.sp1_reference + ag, p_idx
            cur.sp4_reference, cur.sp4_query = i, j
            out.append(cur)
            upstream = []
        elif cur is not None and cur.exit is None:
            # inside the secondary alignment
            cur.inner.append((count, t))
            if t in ("SecondaryMatch", "SecondarySubstitution"):
                p_idx += count
                s_idx += count if cur.entrance.direction == "Forward" else -count
            elif t == "SecondaryDeletion":
                s_idx += count if cur.entrance.direction == "Forward" else -count
            elif t == "SecondaryInsertion":
                p_idx += count
        else:
            # primary ops: track coordinates, feed upstream / downstream
            if out:
                out[-1].downstream.append((count, t))
            upstream.append((count, t))
            if t.endswith(("Match", "Substitution")):
                i += count
                j += count
            elif t.endswith("Deletion"):
                i += count
            elif t.endswith("Insertion"):
                j += count
    return out
