"""Device-resident traceback views (device_fields.py): keep_fields="device"
must reproduce the host-materialized traceback exactly — same cost, same
edge sequence — for the single-pair engine and the batched path.

Runs on the CPU backend (conftest forces it); the views' jitted tile
fetches are backend-agnostic.  Narrow random configs (tests/util.py) keep
the CPU module scans fast; flanked configs exercise the F > 1 tile axis."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig

from util import random_config

AL = get_alphabet("dna")


def _rand_pair(rng, n=60, ts=True):
    ref = rng.integers(0, 4, n).astype(np.int8)
    qry = ref.copy()
    # plant a reverse-complement insert so a template switch can pay off
    if ts:
        seg = AL.complement_array()[ref[20:34]][::-1].astype(np.int8)
        qry = np.concatenate([ref[:40], seg, ref[40:]]).astype(np.int8)
    return ref, qry


@pytest.mark.parametrize("seed", [0, 3, 8])
def test_device_traceback_matches_host(seed):
    from tsalign_tpu.jax_engine import JaxAligner

    rng = np.random.default_rng(seed)
    cfg = random_config(rng, AL, flanks=seed % 2 == 1)
    ref, qry = _rand_pair(rng)

    host = JaxAligner(cfg, ref, qry, chunk=16, keep_fields=True)
    c_h, a_h = host.align_with_traceback()
    dev = JaxAligner(cfg, ref, qry, chunk=16, keep_fields="device")
    c_d, a_d = dev.align_with_traceback()
    assert c_d == c_h
    assert [str(e) for _, e in a_d.entries] == [
        str(e) for _, e in a_h.entries
    ]
    assert [m for m, _ in a_d.entries] == [m for m, _ in a_h.entries]


def test_device_traceback_matches_host_max_ts():
    from tsalign_tpu.jax_engine import JaxAligner

    rng = np.random.default_rng(7)
    cfg = random_config(rng, AL, flanks=True)
    ref, qry = _rand_pair(rng)
    host = JaxAligner(
        cfg, ref, qry, chunk=16, keep_fields=True, max_template_switches=1
    )
    dev = JaxAligner(
        cfg, ref, qry, chunk=16, keep_fields="device", max_template_switches=1
    )
    c_h, a_h = host.align_with_traceback()
    c_d, a_d = dev.align_with_traceback()
    assert (c_d, [m for m, _ in a_d.entries]) == (
        c_h, [m for m, _ in a_h.entries]
    )


def test_batched_device_traceback_matches_host():
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner

    rng = np.random.default_rng(11)
    cfg = random_config(rng, AL)
    pairs = [_rand_pair(rng, n=40 + 8 * i, ts=i % 2 == 0) for i in range(3)]

    bt_h = BatchedTSAligner(cfg, pairs, chunk=16, keep_fields=True)
    out_h = bt_h.align_with_traceback()
    bt_d = BatchedTSAligner(cfg, pairs, chunk=16, keep_fields="device")
    out_d = bt_d.align_with_traceback()
    for (c_h, a_h), (c_d, a_d) in zip(out_h, out_d):
        assert c_d == c_h
        assert [m for m, _ in a_d.entries] == [m for m, _ in a_h.entries]


def test_facade_uses_device_views_and_reprices():
    """The Aligner facade's JAX path (keep_fields="device") must produce a
    record whose alignment re-prices to the reported cost — on the
    reference's shipped experiments config (the headline bench config)."""
    from tsalign_tpu.aligner import Aligner

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/experiments/config.tsa", al
    )
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 70).astype(np.int8)
    seg = al.complement_array()[ref[25:40]][::-1].astype(np.int8)
    qry = np.concatenate([ref[:45], seg, ref[45:]]).astype(np.int8)
    r_str = al.decode(ref)
    q_str = al.decode(qry)
    a = Aligner(costs=cfg, engine="jax")
    res = a.align(r_str, q_str)
    assert res.has_target()
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.pricing import price_alignment

    rng_full = AlignmentRange.complete(len(ref), len(qry))
    priced = price_alignment(cfg, ref, qry, res.result.alignment, rng_full)
    assert priced == res.result.cost
