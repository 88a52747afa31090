"""CLI range combination: --rq-ranges / per-sequence flags / embedded,
mirroring parse_range (tsalign/src/align.rs:516-599)."""

import argparse

import pytest

from tsalign_tpu.cli import _combine_ranges, _parse_rq_ranges
from tsalign_tpu.geometry import AlignmentRange


def _args(**kw):
    base = dict(
        rq_ranges=None,
        reference_offset=None,
        query_offset=None,
        reference_limit=None,
        query_limit=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_parse_rq_ranges_full_and_partial():
    assert _parse_rq_ranges("R1..5Q2..7") == {"R": (1, 5), "Q": (2, 7)}
    assert _parse_rq_ranges("Q2..7") == {"Q": (2, 7)}
    # whitespace is allowed after the letter only (align.rs:529-535 skips it
    # there; a space *between* groups would panic in the reference)
    assert _parse_rq_ranges("R 1..5Q 2..7") == {"R": (1, 5), "Q": (2, 7)}
    with pytest.raises(ValueError):
        _parse_rq_ranges("R1..5R2..3")
    with pytest.raises(ValueError):
        _parse_rq_ranges("X1..5")


def test_combine_nothing_given_is_no_range_mode():
    assert _combine_ranges(_args(), None, 10, 12) is None


def test_combine_flags_fill_missing_parts():
    rng = _combine_ranges(
        _args(rq_ranges="Q2..7", reference_offset=1, reference_limit=9),
        None,
        10,
        12,
    )
    assert rng == AlignmentRange(1, 2, 9, 7)


def test_combine_flag_conflicts():
    with pytest.raises(SystemExit):
        _combine_ranges(
            _args(rq_ranges="R0..10", reference_offset=2), None, 10, 12
        )
    with pytest.raises(SystemExit):
        _combine_ranges(_args(rq_ranges="Q0..12", query_limit=5), None, 10, 12)


def test_combine_embedded_conflicts_and_passthrough():
    emb = AlignmentRange(1, 1, 5, 5)
    assert _combine_ranges(_args(), emb, 10, 12) is emb
    with pytest.raises(SystemExit):
        _combine_ranges(_args(rq_ranges="R1..5"), emb, 10, 12)
    with pytest.raises(SystemExit):
        _combine_ranges(_args(query_offset=3), emb, 10, 12)
