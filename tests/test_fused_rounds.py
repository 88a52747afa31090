"""Fused batched rounds loop (parallel/fused_rounds.py) parity tests.

The fused loop compiles the whole lockstep batch iteration into one
`lax.while_loop` dispatch; these tests pin it cost-, rounds-, field-count-
and traceback-equal to the host loop (batch_ts._align_host, the executable
spec).  A narrow-window config keeps the XLA:CPU compile of the fused
program in seconds (the wide sample config takes minutes to compile on
CPU, which is why the fused path is opt-in there — TSALIGN_FUSED=1)."""

import numpy as np
import pytest

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.parallel.batch_ts import BatchedTSAligner
from tsalign_tpu.pricing import price_alignment

_NARROW = None


def _narrow_config():
    global _NARROW
    if _NARROW is None:
        import test_chain

        _NARROW = TemplateSwitchConfig.parse_plain(
            test_chain._NARROW_CONFIG, get_alphabet("dna-n")
        )
    return _NARROW


def _pairs():
    rng = np.random.default_rng(99)
    comp = get_alphabet("dna-n").complement_array()
    pairs = []
    # pair 0: one planted reverse-complement TSM (length 8 = cost 2 under
    # the narrow config) + 1 SNP
    ref = rng.integers(0, 4, 90).astype(np.int8)
    qry = ref.copy()
    qry[40:48] = [comp[c] for c in qry[40:48]][::-1]
    qry[10] = (qry[10] + 1) % 4
    pairs.append((ref, qry))
    # pair 1: identical twins (early k*delta stop, rounds == 1)
    r2 = rng.integers(0, 4, 70).astype(np.int8)
    pairs.append((r2, r2.copy()))
    # pair 2: SNPs plus a DIFFERENT planted TSM (distinct secondary
    # content per pair in one batch — regression for the cross-pair LUT
    # cache bug: the module LUTs embed each pair's secondary sequence, and
    # sharing them across pairs priced every pair with pair 0's sequences)
    r3 = rng.integers(0, 4, 120).astype(np.int8)
    q3 = r3.copy()
    comp = get_alphabet("dna-n").complement_array()
    q3[70:78] = [comp[c] for c in q3[70:78]][::-1]
    for p in (15, 100):
        q3[p] = (q3[p] + 1) % 4
    pairs.append((r3, q3))
    return pairs


def _run(monkeypatch, fused: bool, keep=False):
    if fused:
        monkeypatch.setenv("TSALIGN_FUSED", "1")
        monkeypatch.delenv("TSALIGN_NO_FUSED", raising=False)
    else:
        monkeypatch.setenv("TSALIGN_NO_FUSED", "1")
        monkeypatch.delenv("TSALIGN_FUSED", raising=False)
    bt = BatchedTSAligner(_narrow_config(), _pairs(), chunk=16,
                          keep_fields=keep)
    return bt


def test_fused_matches_host_costs_and_rounds(monkeypatch):
    res_f = _run(monkeypatch, True).align()
    res_h = _run(monkeypatch, False).align()
    assert [r.cost for r in res_f] == [r.cost for r in res_h]
    assert [r.rounds for r in res_f] == [r.rounds for r in res_h]
    assert res_f[1].cost == 0 and res_f[1].rounds == 1  # early-exit pair


def test_fused_traceback_matches_host(monkeypatch):
    tb_f = _run(monkeypatch, True).align_with_traceback()
    tb_h = _run(monkeypatch, False).align_with_traceback()
    cfg = _narrow_config()
    for (cf, af), (ch, ah), (ref, qry) in zip(tb_f, tb_h, _pairs()):
        assert cf == ch
        assert af.entries == ah.entries
        if cf < 2**60:
            assert price_alignment(cfg, ref, qry, af) == cf


def test_fused_field_counts_match_host(monkeypatch):
    bt_f = _run(monkeypatch, True, keep="device")
    rf = bt_f.align()
    bt_h = _run(monkeypatch, False, keep="device")
    rh = bt_h.align()
    for f, h in zip(rf, rh):
        assert len(f.primary_fields) == len(h.primary_fields)
        assert len(f.reentry_fields) == len(h.reentry_fields)
        # spot-check tile-view equality on the last round's entry layers
        for Mf, Mh in zip(f.primary_fields, h.primary_fields):
            from tsalign_tpu.device_fields import entry_cells_of

            np.testing.assert_array_equal(
                entry_cells_of(Mf), entry_cells_of(Mh)
            )


def test_fused_single_pair_delegation(monkeypatch):
    """JaxAligner delegates the plain NoPrune case to the B=1 fused loop
    (jax_engine._fused_delegate); cost, rounds and traceback must match
    the host single-pair loop."""
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.jax_engine import JaxAligner

    cfg = _narrow_config()
    ref, qry = _pairs()[0]
    rng = AlignmentRange(4, 4, len(ref) - 3, len(qry) - 3)

    def run(fused, **kw):
        if fused:
            monkeypatch.setenv("TSALIGN_FUSED", "1")
            monkeypatch.delenv("TSALIGN_NO_FUSED", raising=False)
        else:
            monkeypatch.setenv("TSALIGN_NO_FUSED", "1")
        return JaxAligner(cfg, ref, qry, chunk=16, **kw)

    for kw in (dict(keep_fields=False), dict(keep_fields=False, range_=rng)):
        cf = run(True, **kw).align()
        ch = run(False, **kw).align()
        assert cf.cost == ch.cost, kw
    # traceback through the fused device-view fields
    ef = run(True, keep_fields="device")
    cf, af = ef.align_with_traceback()
    eh = run(False, keep_fields="device")
    ch, ah = eh.align_with_traceback()
    assert cf == ch
    assert af.entries == ah.entries
    assert price_alignment(cfg, ref, qry, af) == cf
