"""JAX device engine vs numpy executable spec: exact cost equality."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.jax_engine import JaxAligner

from util import random_config, related_pair


def test_jax_engine_matches_numpy_randomized():
    rng = np.random.default_rng(42)
    al = get_alphabet("dna")
    for trial in range(6):
        cfg = random_config(rng, al, flanks=(trial % 2 == 0))
        ref, qry = related_pair(rng, al, max_len=10)
        mts = [None, 1, 2][trial % 3]
        nc = DenseAligner(cfg, ref, qry, max_template_switches=mts).align().cost
        jc = (
            JaxAligner(
                cfg, ref, qry, max_template_switches=mts, chunk=8, keep_fields=False
            )
            .align()
            .cost
        )
        assert nc == jc, f"trial={trial} mts={mts} numpy={nc} jax={jc}"


def test_jax_engine_planted_two_tsms_default_config():
    al = get_alphabet("dna")
    cfg = TemplateSwitchConfig.default(al)
    rng = np.random.default_rng(5)
    n = 40
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    qry[8:16] = [comp[c] for c in qry[8:16]][::-1]
    qry[25:34] = [comp[c] for c in qry[25:34]][::-1]
    nc = DenseAligner(cfg, ref, qry).align().cost
    jc = JaxAligner(cfg, ref, qry, chunk=16, keep_fields=False).align().cost
    assert nc == jc


def test_batched_ts_matches_single_pair():
    """Batched multi-pair TS engine (vmapped kernels over a poison bucket)
    equals the single-pair engine on every pair."""
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

    rng = np.random.default_rng(12)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    pairs = [related_pair(rng, al, max_len=12) for _ in range(4)]
    got = BatchedTSAligner(cfg, pairs, chunk=8).costs()
    for i, (r, q) in enumerate(pairs):
        exp = DenseAligner(cfg, r, q).align().cost
        g = int(got[i])
        from tsalign_tpu.costs import INF

        assert (g if g < INF else INF) == exp
