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
