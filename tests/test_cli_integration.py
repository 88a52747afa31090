"""CLI integration scenarios mirroring the reference's tsalign-tests crate
(tsalign-tests/tests/integration.rs:6-29): shell out to the CLI with the
same fixture + flag combinations and assert success.

Subprocesses must be CPU-forced explicitly (conftest's in-process forcing
does not inherit)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TF = "/root/reference/test_files"
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}


def _run(args):
    r = subprocess.run(
        [sys.executable, "-m", "tsalign_tpu.cli"] + args,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, f"{args}: rc={r.returncode}\n{r.stderr[-2000:]}"
    return r.stdout


def test_align_default_cfg_twin():
    out = _run(["align", "-p", f"{TF}/twin_a.fa"])
    assert "cost:" in out


def test_align_default_cfg_qr():
    out = _run(
        ["align", "-q", f"{TF}/query_a.fa", "-r", f"{TF}/reference_a.fa"]
    )
    assert "cost:" in out


def test_align_with_cost_limit_zero():
    out = _run(["align", "-p", f"{TF}/twin_100_0.01.fa", "--cost-limit", "0"])
    assert "cost:" in out


def test_align_with_memory_limit():
    out = _run(
        ["align", "-p", f"{TF}/twin_100_0.01.fa", "--memory-limit", "1000"]
    )
    assert "cost:" in out


def test_align_with_embedded_rq_ranges():
    out = _run(
        ["align", "-p", f"{TF}/twin_embedded.fa", "--use-embedded-rq-ranges"]
    )
    assert "cost:" in out


def _run_rc(args):
    return subprocess.run(
        [sys.executable, "-m", "tsalign_tpu.cli"] + args,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )


def test_strategy_flags_reject_unknown_values():
    """Unknown strategy selector values exit 2 like the reference's clap
    (align.rs:57-223): the flags are validated, not inert string sinks."""
    for flag in (
        "--ts-min-length-strategy",
        "--ts-chaining-strategy",
        "--ts-total-length-strategy",
        "--ts-descendant-strategy",
        "--ts-node-ord-strategy",
        "--chaining-open-list",
        "--chaining-closed-list",
    ):
        r = _run_rc(["align", "-p", f"{TF}/twin_a.fa", flag, "bogus"])
        assert r.returncode == 2, f"{flag}=bogus: rc={r.returncode}"
        assert "invalid choice" in r.stderr


def test_strategy_flags_accept_reference_names():
    """The reference's kebab-case clap values are all accepted
    (template_switch_distance_type_selectors.rs:47-81)."""
    out = _run(
        [
            "align", "-p", f"{TF}/twin_a.fa",
            "--ts-min-length-strategy", "preprocess-lookahead",
            "--ts-chaining-strategy", "lower-bound",
            "--ts-total-length-strategy", "maximise",
            "--ts-descendant-strategy", "allow-any",
            "--chaining-open-list", "std-heap",
            "--chaining-closed-list", "fx-hash-map",
        ]
    )
    assert "cost:" in out


def test_descendant_strategy_reference_name_only_equal():
    """allow-only-all-equal maps to the only-equal engine path."""
    out = _run(
        [
            "align", "-p", f"{TF}/twin_a.fa",
            "--ts-descendant-strategy", "allow-only-all-equal",
        ]
    )
    assert "cost:" in out
