"""Shared test helpers: random configs and sequences for oracle-vs-dense checks."""

import numpy as np

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.costs import INF, CostFunction, GapAffineCostTable


def random_table(rng, alphabet, name, lo=0, hi=6, allow_nonzero_match=False):
    n = alphabet.size
    sub = rng.integers(lo + 1, hi + 1, size=(n, n)).astype(np.int64)
    match_hi = 2 if allow_nonzero_match else 0
    diag = rng.integers(0, match_hi + 1, size=n).astype(np.int64)
    np.fill_diagonal(sub, diag)
    return GapAffineCostTable(
        name=name,
        alphabet=alphabet,
        substitution=sub,
        gap_open=rng.integers(1, hi + 2, size=n).astype(np.int64),
        gap_extend=rng.integers(1, 4, size=n).astype(np.int64),
    )


def random_v_shaped(rng, span=8, max_cost=6):
    """Random 0-centred V-shaped cost function with an INF tail on both sides."""
    lo = -int(rng.integers(1, span + 1))
    hi = int(rng.integers(1, span + 1))
    left_costs = np.sort(rng.integers(0, max_cost + 1, size=-lo))[::-1]
    zero_cost = int(rng.integers(0, left_costs.min() + 1 if len(left_costs) else max_cost + 1))
    right_costs = np.sort(rng.integers(zero_cost, max_cost + 1, size=hi))
    pts = [(-(2**62), INF)]
    for k, c in enumerate(left_costs):
        pts.append((lo + k, int(c)))
    pts.append((0, zero_cost))
    for k, c in enumerate(right_costs):
        pts.append((k + 1, int(c)))
    pts.append((hi + 1, INF))
    # enforce v-shape: left non-ascending toward 0 handled above
    f = CostFunction(pts)
    assert f.is_v_shaped(), f.points
    return f


def random_length_costs(rng, min_len=None, max_len=None):
    min_len = int(rng.integers(1, 5)) if min_len is None else min_len
    max_len = min_len + int(rng.integers(1, 8)) if max_len is None else max_len
    pts = [(0, INF)]
    x = min_len
    while x <= max_len:
        pts.append((x, int(rng.integers(0, 4))))
        x += int(rng.integers(1, 4))
    pts.append((max_len + 1, INF))
    return CostFunction(pts)


def random_config(rng, alphabet=None, flanks=False):
    alphabet = alphabet or get_alphabet("dna")
    L = int(rng.integers(0, 3)) if flanks else 0
    R = int(rng.integers(0, 3)) if flanks else 0
    base = {}
    for key in ("rrf", "rqf", "qrf", "qqf", "rrr", "rqr", "qrr", "qqr"):
        base[key] = INF if rng.random() < 0.35 else int(rng.integers(0, 5))
    cfg = TemplateSwitchConfig(
        alphabet=alphabet,
        left_flank_length=L,
        right_flank_length=R,
        base_cost=base,
        primary_edit_costs=random_table(rng, alphabet, "Primary Edit Costs"),
        secondary_forward_edit_costs=random_table(rng, alphabet, "Secondary Forward Edit Costs"),
        secondary_reverse_edit_costs=random_table(rng, alphabet, "Secondary Reverse Edit Costs"),
        left_flank_edit_costs=random_table(rng, alphabet, "Left Flank Edit Costs"),
        right_flank_edit_costs=random_table(rng, alphabet, "Right Flank Edit Costs"),
        rq_qr_offset_costs=random_v_shaped(rng),
        rr_qq_offset_costs=random_v_shaped(rng),
        length_costs=random_length_costs(rng),
        length_difference_costs=random_v_shaped(rng, span=5),
        forward_anti_primary_gap_costs=random_v_shaped(rng, span=6),
        reverse_anti_primary_gap_costs=random_v_shaped(rng, span=6),
    )
    cfg.verify()
    return cfg


def random_pair(rng, alphabet, max_len=10, min_len=0):
    n1 = int(rng.integers(min_len, max_len + 1))
    n2 = int(rng.integers(min_len, max_len + 1))
    ref = rng.integers(0, alphabet.size, size=n1).astype(np.int8)
    qry = rng.integers(0, alphabet.size, size=n2).astype(np.int8)
    return ref, qry


def related_pair_scaled(rng, alphabet, n, ts_len):
    """A length-n pair with a few SNPs and one planted reverse-complement
    stretch of ts_len — low optimal cost, so the Dijkstra oracle stays
    tractable at n = 40-80 while window clipping and drift budgets bind."""
    ref = rng.integers(0, alphabet.size, size=n).astype(np.int8)
    qry = list(ref)
    for _ in range(int(rng.integers(1, 4))):
        k = int(rng.integers(0, len(qry)))
        qry[k] = int(rng.integers(0, alphabet.size))
    comp = alphabet.complement_array()
    a = int(rng.integers(4, n - ts_len - 4))
    qry[a : a + ts_len] = [int(comp[c]) for c in qry[a : a + ts_len]][::-1]
    if rng.random() < 0.4:
        k = int(rng.integers(0, len(qry) - 1))
        del qry[k]
    return ref, np.array(qry, dtype=np.int8)


def binding_window_config(rng, alphabet, left_flank, right_flank, ts_lo=5, ts_hi=12):
    """Random config with flanks up to 4 and adversarially narrow windows:
    the TS length window covers [ts_lo, ts_hi] and the drift budgets
    (length-difference, anti-primary-gap) have spans of only 2-3 so the
    engines' live-window clipping is actually exercised."""
    cfg = random_config(rng, alphabet, flanks=False)
    cfg.left_flank_length = left_flank
    cfg.right_flank_length = right_flank
    cfg.length_costs = CostFunction(
        [(0, INF), (ts_lo, int(rng.integers(0, 3))), (ts_hi + 1, INF)]
    )
    cfg.length_difference_costs = random_v_shaped(rng, span=2)
    cfg.forward_anti_primary_gap_costs = random_v_shaped(rng, span=3)
    cfg.reverse_anti_primary_gap_costs = random_v_shaped(rng, span=3)
    cfg.verify()
    return cfg


def related_pair(rng, alphabet, max_len=14):
    """A pair where query is a mutated copy of reference (more realistic)."""
    n = int(rng.integers(4, max_len + 1))
    ref = rng.integers(0, alphabet.size, size=n).astype(np.int8)
    qry = list(ref)
    for _ in range(int(rng.integers(0, 3))):
        k = int(rng.integers(0, len(qry)))
        qry[k] = int(rng.integers(0, alphabet.size))
    if rng.random() < 0.3 and len(qry) > 3:
        k = int(rng.integers(0, len(qry) - 2))
        del qry[k]
    # Sometimes plant a reverse-complement stretch (a TSM signal).
    if rng.random() < 0.5 and len(qry) >= 6:
        a = int(rng.integers(0, len(qry) - 4))
        b = a + int(rng.integers(3, min(8, len(qry) - a) + 1))
        comp = alphabet.complement_array()
        qry[a:b] = [int(comp[c]) for c in qry[a:b]][::-1]
    return ref, np.array(qry, dtype=np.int8)
