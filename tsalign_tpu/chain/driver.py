"""Chained long-sequence alignment driver.

Counterpart of lib_ts_chainalign/src/lib.rs align() + chain_align.rs: anchor
the pair, chain, cut the pair at midpoints of confident exact-match runs,
run the dense TS engine per segment (with window-radius context so template
switches near segment borders can read their secondary stretches, mirroring
the reference's range semantics where TS inners may align outside the focus
range — README.md:239-284), and concatenate the per-segment alignments.

Segment locality is sound because every cost function window is finite: a
TSM entered inside a segment reads secondary characters at most
(offset window + max length + drift) characters away.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..alignment import Alignment
from ..config import TemplateSwitchConfig
from ..costs import INF
from ..geometry import AlignmentRange
from .anchors import Anchors, choose_k
from .chain import compute_chain, exact_match_runs
from .plan import infer_max_n, load_or_create_plan


@dataclass
class ChainAlignResult:
    cost: int
    alignment: Alignment
    segments: int
    anchors: int
    duration_seconds: float


def _window_radius(config: TemplateSwitchConfig) -> int:
    """Max distance a TSM secondary/reentry can reach from its entry cell."""
    r = 0
    for fn in (config.rq_qr_offset_costs, config.rr_qq_offset_costs):
        w = fn.finite_window()
        if w is not None:
            r = max(r, abs(int(w[0])), abs(min(int(w[1]), 2**32)))
    dmax = 0
    dw = config.length_difference_costs.finite_window()
    if dw is not None:
        dmax = max(abs(int(dw[0])), abs(min(int(dw[1]), 2**32)))
    lw = config.length_costs.maximum_finite_input()
    if lw is not None:
        lmax = int(lw)
    else:
        # Length unbounded by its own cost function, but still bounded by
        # the anti-gap window: the exit walk requires p2 + ldiff in
        # [Al, Ah] (engine semantics; context.rs:636-707), so the secondary
        # length p2 <= max Ah - min ldiff <= max |A window| + max |ldiff|.
        amax = 0
        for d in ("Forward", "Reverse"):
            aw = config.anti_primary_gap_costs(d).finite_window()
            if aw is not None:
                amax = max(amax, abs(int(aw[0])), abs(min(int(aw[1]), 2**32)))
        lmax = amax + dmax
    r += lmax + dmax
    return r + 16


def _segment_cuts(
    runs: List[Tuple[int, int, int]],
    n_r: int,
    n_q: int,
    min_run: int,
    target_segment: int,
    start: Tuple[int, int] = (0, 0),
) -> List[Tuple[int, int]]:
    """Cut points (ref, qry) in the middle of long exact runs, spaced at
    least `target_segment` apart, from `start` to (n_r, n_q)."""
    cuts = [start]
    for r0, q0, length in runs:
        if length < min_run:
            continue
        mid = length // 2
        cr, cq = r0 + mid, q0 + mid
        if cr >= n_r or cq >= n_q:
            continue
        if cr - cuts[-1][0] >= target_segment and cq - cuts[-1][1] >= target_segment:
            cuts.append((cr, cq))
    if cuts[-1] != (n_r, n_q):
        cuts.append((n_r, n_q))
    return cuts


def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b


def chain_align(
    config: TemplateSwitchConfig,
    reference: np.ndarray,
    query: np.ndarray,
    k: Optional[int] = None,
    target_segment: int = 512,
    max_template_switches: Optional[int] = None,
    engine: str = "auto",
    progress: bool = False,
    range_: Optional[AlignmentRange] = None,
    cache_directory: Optional[str] = None,
    force_no_preprocessing: bool = False,
) -> ChainAlignResult:
    t_start = time.monotonic()
    ref = np.asarray(reference)
    qry = np.asarray(query)
    n_r, n_q = len(ref), len(qry)
    if range_ is None:
        range_ = AlignmentRange.complete(n_r, n_q)
    ro, qo = range_.reference_offset, range_.query_offset
    rl, ql = range_.reference_limit, range_.query_limit
    if k is None:
        k = choose_k((rl - ro) + (ql - qo))

    # Planning data: loaded from the preprocessing cache when present, else
    # derived from the config and stored (a_star_chain_ts.rs:49-70).
    plan = load_or_create_plan(
        config,
        cache_directory,
        k,
        infer_max_n(rl - ro, ql - qo),
        force_no_preprocessing=force_no_preprocessing,
    )

    # Anchor/chain over the focus range only (the primary alignment is
    # restricted to it, lib_ts_chainalign sequences.rs primary start/end);
    # segment context below may still read secondary characters outside it.
    anchors = Anchors.build(ref[ro:rl], qry[qo:ql], k)
    chain = compute_chain(
        anchors, match_score=plan.match_score, drift_unit=plan.drift_unit
    )
    runs = [(r0 + ro, q0 + qo, ln) for r0, q0, ln in exact_match_runs(chain)]
    radius = plan.window_radius
    cuts = _segment_cuts(runs, rl, ql, plan.min_run, target_segment, start=(ro, qo))

    total_cost = 0
    merged = Alignment([])
    use_jax = engine in ("auto", "jax")
    if use_jax:
        try:
            from ..jax_engine import JaxAligner as Engine
        except Exception:
            from ..engine import DenseAligner as Engine
            use_jax = False
    if not use_jax:
        from ..engine import DenseAligner as Engine

    segments = 0
    for (r0, q0), (r1, q1) in zip(cuts, cuts[1:]):
        segments += 1
        # context-extended subsequences; the focus range is the segment
        cr0, cq0 = max(0, r0 - radius), max(0, q0 - radius)
        cr1, cq1 = min(n_r, r1 + radius), min(n_q, q1 + radius)
        sub_r = ref[cr0:cr1]
        sub_q = qry[cq0:cq1]
        # Pad to power-of-two buckets with the poison char (index ==
        # alphabet size, pricing INF against everything) so device compiles
        # are shared across segments while padding stays unreachable.
        if use_jax:
            P = config.alphabet.size
            br, bq = _bucket(len(sub_r)), _bucket(len(sub_q))
            sub_r = np.concatenate(
                [sub_r, np.full(br - len(sub_r), P, sub_r.dtype)]
            )
            sub_q = np.concatenate(
                [sub_q, np.full(bq - len(sub_q), P, sub_q.dtype)]
            )
        rng = AlignmentRange(r0 - cr0, q0 - cq0, r1 - cr0, q1 - cq0)
        if progress:
            print(
                f"segment {segments}: R[{r0}..{r1}] Q[{q0}..{q1}] "
                f"(ctx {len(sub_r)}x{len(sub_q)})",
                flush=True,
            )
        eng = Engine(
            config,
            sub_r,
            sub_q,
            range_=rng,
            # The numpy engine prunes to the focus range (exact context
            # bounding); the device engine runs NoPrune over the poisoned
            # bucket so segment shapes share compilations — primary roaming
            # within the context matches the full-pair NoPrune semantics.
            prune_range=not use_jax,
            max_template_switches=max_template_switches,
        )
        cost, aln = eng.align_with_traceback()
        if cost >= INF:
            raise RuntimeError(
                f"chain_align: segment R[{r0}..{r1}] Q[{q0}..{q1}] has no alignment"
            )
        total_cost += cost
        for nmul, t in aln.entries:
            merged.push(t, nmul)

    return ChainAlignResult(
        cost=total_cost,
        alignment=merged,
        segments=segments,
        anchors=len(anchors),
        duration_seconds=time.monotonic() - t_start,
    )
