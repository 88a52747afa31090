"""python_bindings parity: module-level align() + TSPairwiseAlignment
(reference: python_bindings/src/lib.rs:17-141, python/tsalign/__init__.py)."""

import tsalign_tpu


def test_module_level_align_roundtrip():
    res = tsalign_tpu.align("ACGTACGTAC", "ACGTACGTAC", engine="numpy")
    assert res.stats()["cost"] == 0
    assert res.cigar() == "10="
    ops = res.alignments()
    assert ops and ops[0][0] == 10


def test_align_with_substitution_and_viz(capsys):
    res = tsalign_tpu.align("ACGTACGTAC", "ACCTACGTAC", engine="numpy")
    st = res.stats()
    assert st["cost"] > 0
    # under the default config + maximise-length tie-break a TSM can beat a
    # bare substitution; with no_ts the cigar must show the X
    res_no_ts = tsalign_tpu.align(
        "ACGTACGTAC", "ACCTACGTAC", engine="numpy", no_ts=True
    )
    assert "X" in res_no_ts.cigar()
    res.viz_template_switches()  # must not raise
    capsys.readouterr()


def test_align_custom_costs_string():
    cfg_text = open("/root/reference/sample_tsa_config/config.tsa").read()
    res = tsalign_tpu.align("ACGTTT", "ACGTTT", costs=cfg_text, engine="numpy")
    assert res.stats()["cost"] == 0


def test_memory_limit_exceeded():
    """A tiny --memory-limit yields ExceededMemoryLimit/WithoutTarget
    (generic_a_star lib.rs:167-187, 333-335 semantics, field-shaped)."""
    res = tsalign_tpu.align(
        "ACGTACGTAC", "ACGTACGTAC", engine="numpy", memory_limit=16
    )
    assert res.result.result.type == "ExceededMemoryLimit"
    assert not res.result.has_target
    toml = res.result.to_toml()
    assert 'type = "WithoutTarget"' in toml
    assert "ExceededMemoryLimit" in toml
