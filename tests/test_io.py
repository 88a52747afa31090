import glob

import pytest

from tsalign_tpu.alignment import (
    Alignment,
    TemplateSwitchEntrance,
    TemplateSwitchExit,
    EqualCostRange,
)
from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.fasta import extract_embedded_range, parse_fasta_text
from tsalign_tpu.result import AlignmentResult

from conftest import has_reference, reference_path

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


GOLDEN_TOMLS = sorted(glob.glob(reference_path("test_files", "*.toml")))


def test_goldens_exist():
    assert len(GOLDEN_TOMLS) >= 8


@pytest.mark.parametrize("path", GOLDEN_TOMLS)
def test_golden_toml_roundtrip(path):
    with open(path) as f:
        text = f.read()
    result = AlignmentResult.from_toml(text)
    rendered = result.to_toml()
    result2 = AlignmentResult.from_toml(rendered)
    assert result == result2
    # Byte parity with the reference's serde/toml serialization (field
    # order, float formatting — alignment_result.rs:32-82), so golden
    # comparisons are plain `diff`s.
    assert rendered == text


def test_golden_ari_fields():
    path = reference_path("test_files", "twin_ari_chrX_146823507_146823598.toml")
    result = AlignmentResult.from_toml(open(path).read())
    assert result.has_target
    assert result.cost == 6.0
    assert result.result.type == "FoundTarget"
    assert result.result.cost == 6
    assert result.template_switch_amount == 3.0
    entries = result.alignment.entries
    assert entries[0] == (499, "PrimaryMatch")
    count, entrance = entries[1]
    assert count == 17
    assert isinstance(entrance, TemplateSwitchEntrance)
    assert entrance.first_offset == -16
    assert entrance.primary == "Query"
    assert entrance.secondary == "Reference"
    assert entrance.direction == "Reverse"
    count, ts_exit = entries[3]
    assert isinstance(ts_exit, TemplateSwitchExit)
    assert ts_exit.anti_primary_gap == 16


def test_cigar_rendering():
    a = Alignment(
        [
            (3, "PrimaryMatch"),
            (1, "PrimarySubstitution"),
            (
                2,
                TemplateSwitchEntrance(
                    first_offset=-5,
                    equal_cost_range=EqualCostRange.new_invalid(),
                    primary="Reference",
                    secondary="Query",
                    direction="Reverse",
                ),
            ),
            (4, "SecondaryMatch"),
            (1, TemplateSwitchExit(anti_primary_gap=7)),
            (2, "PrimaryMatch"),
        ]
    )
    assert a.cigar() == "3=1X[TSRQR:[-]:[-]:-5:4=:7]2="


def test_rle_from_edges_merges_flanks():
    edges = [
        "PrimaryMatch",
        "PrimaryFlankMatch",
        "PrimaryFlankSubstitution",
        "PrimarySubstitution",
        "SecondaryRoot",
        "SecondaryMatch",
    ]
    a = Alignment.from_edge_sequence(edges)
    # flank/non-flank merge; internal dropped
    assert [c for c, _ in a.entries] == [2, 2, 1]


def test_rle_entrance_keeps_final_offset():
    def ent(o):
        return TemplateSwitchEntrance(
            first_offset=o,
            equal_cost_range=EqualCostRange.new_invalid(),
            primary="Reference",
            secondary="Query",
            direction="Reverse",
        )

    edges = [ent(0), ent(-1), ent(-2), ent(-3), "SecondaryMatch"]
    a = Alignment.from_edge_sequence(edges)
    assert a.entries[0][0] == 4
    assert a.entries[0][1].first_offset == -3


def test_alphabets():
    dna = get_alphabet("dna")
    assert dna.reverse_complement_str("ACGT") == "ACGT"
    assert dna.reverse_complement_str("AAGT") == "ACTT"
    rna = get_alphabet("rna")
    assert rna.reverse_complement_str("ACGU") == "ACGU"
    dnan = get_alphabet("dna-n")
    assert dnan.complement_str("ACGTN") == "TGCAN"
    iupac = get_alphabet("dna-iupac")
    assert iupac.complement_str("ABCDGHKMNRSTVWY") == "TVGHCDMKNYSABWR"
    arr = dnan.encode("ACGTN")
    assert list(arr) == [0, 1, 2, 3, 4]
    assert dnan.decode(arr) == "ACGTN"


def test_fasta_pair_and_embedded_ranges():
    records = parse_fasta_text(">reference\nACACA|CCCAAC|GCGGG\n>query\nACAAA|CGTGTC|GCGCG\n")
    assert len(records) == 2
    seq, off, lim = extract_embedded_range(records[0].sequence, "reference")
    assert seq == "ACACACCCAACGCGGG"
    assert (off, lim) == (5, 11)
    assert seq[off:lim] == "CCCAAC"


def test_fasta_multiline_records():
    fa = open(reference_path("test_files", "twin_10_ts.fa")).read()
    records = parse_fasta_text(fa)
    assert records[0].sequence == "ACATCTGCAA"
    assert records[1].sequence == "ACGCAGATAA"
