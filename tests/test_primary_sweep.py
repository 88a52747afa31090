"""Property tests: dense primary sweep == oracle Dijkstra with TSMs disabled."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.geometry import AlignmentRange
from tsalign_tpu.oracle import OracleAligner
from tsalign_tpu.ops.primary_sweep import PrimarySweep

from conftest import has_reference, reference_path
from util import random_config, random_pair


def dense_no_ts_cost(cfg, ref, qry, range_=None):
    sweep = PrimarySweep(cfg, ref, qry, range_=range_, allow_flank_climb=False)
    M = sweep.sweep(sweep.root_seeds())
    return sweep.target_cost(M)


def oracle_no_ts_cost(cfg, ref, qry, range_=None):
    cost, _ = OracleAligner(cfg, ref, qry, range_=range_, max_template_switches=0).align()
    return cost


@pytest.mark.parametrize("seed", range(30))
def test_random_no_ts(seed):
    rng = np.random.default_rng(seed)
    alpha = get_alphabet("dna")
    cfg = random_config(rng, alpha, flanks=seed % 3 == 0)
    ref, qry = random_pair(rng, alpha, max_len=9)
    dense = dense_no_ts_cost(cfg, ref, qry)
    oracle = oracle_no_ts_cost(cfg, ref, qry)
    assert dense == oracle, (
        f"seed={seed} ref={list(ref)} qry={list(qry)} dense={dense} oracle={oracle}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_random_no_ts_with_range(seed):
    rng = np.random.default_rng(1000 + seed)
    alpha = get_alphabet("dna")
    cfg = random_config(rng, alpha)
    ref, qry = random_pair(rng, alpha, max_len=9, min_len=4)
    ro = int(rng.integers(0, 2))
    qo = int(rng.integers(0, 2))
    rl = int(rng.integers(ro, len(ref) + 1))
    ql = int(rng.integers(qo, len(qry) + 1))
    range_ = AlignmentRange(ro, qo, rl, ql)
    dense = dense_no_ts_cost(cfg, ref, qry, range_)
    oracle = oracle_no_ts_cost(cfg, ref, qry, range_)
    assert dense == oracle


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_sample_config_no_ts_twin10():
    alpha = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        reference_path("sample_tsa_config", "config.tsa"), alpha
    )
    ref = alpha.encode("ACATCTGCAA")
    qry = alpha.encode("ACGCAGATAA")
    assert dense_no_ts_cost(cfg, ref, qry) == 12
    eq = alpha.encode("ACGCAGATGA")
    assert dense_no_ts_cost(cfg, eq, eq) == 0


@pytest.mark.parametrize("seed", [3, 7, 21])
def test_all_states_match_oracle(seed):
    """Every dense cell must equal the oracle's Dijkstra distance (not just target)."""
    import heapq
    from tsalign_tpu.costs import INF

    rng = np.random.default_rng(seed)
    alpha = get_alphabet("dna")
    cfg = random_config(rng, alpha, flanks=True)
    ref, qry = random_pair(rng, alpha, max_len=7)
    sweep = PrimarySweep(cfg, ref, qry, allow_flank_climb=False)
    M = sweep.sweep(sweep.root_seeds())

    o = OracleAligner(cfg, ref, qry, max_template_switches=0)
    dist = {o.root(): 0}
    heap = [(0, 0, o.root())]
    cnt = 1
    while heap:
        d, _, s = heapq.heappop(heap)
        if d != dist.get(s):
            continue
        for inc, succ, _ in o.successors(s):
            nd = d + inc
            if nd < dist.get(succ, INF):
                dist[succ] = nd
                heapq.heappush(heap, (nd, cnt, succ))
                cnt += 1

    for fi in range(M.shape[0]):
        for g in range(3):
            for i in range(M.shape[2]):
                for j in range(M.shape[3]):
                    dv = int(M[fi, g, i, j])
                    od = dist.get(("P", i, j, g, fi - sweep.R, 0), INF)
                    assert min(dv, INF) == min(od, INF), (
                        f"f={fi - sweep.R} g={g} i={i} j={j}: dense={dv} oracle={od}"
                    )
