#!/usr/bin/env python
"""TPU session orchestrator: run the blocked device queue in safe-first order.

The axon relay dies and TPU-worker crashes wedge the chip for 30+ minutes
(CLAUDE.md), so device experiments must be planned: this script runs each
queued item as an isolated child process with a timeout, appends one JSON
line per step to TPU_SESSION_LOG.jsonl, and STOPS at the first
timeout/crash (the chip is then presumed wedged; crash-risky steps are
ordered last so a wedge costs the least).

Usage:
  python scripts/tpu_session.py                 # full queue
  python scripts/tpu_session.py heli_bench ari  # selected steps

Round-5 steps in default order (safe -> risky):
  probe            tiny device op (relay liveness)
  fused_probe(_host)  fused while_loop canary at tiny shape (+cross-check)
  heli_bench       headline + record, staged in one process (bench._measure)
  goldens_warm     heli/linc/underscore with warm walls (per-case table)
  ari_warm         the 1099x1099 golden with warm walls
  loci             flanked real loci (TSNAX/GNG12/LINC00271, bench config)
  bucket8p         batched bucket through the fused loop
  chain30k/100k/230k  device chained mode, segments batched per bucket
  corpus           multi-bucket corpus throughput
  heli_host        host-loop heli comparison point (fused off)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "TPU_SESSION_LOG.jsonl")

PROBE = (
    "import jax, jax.numpy as jnp;"
    "print('devices', jax.devices());"
    "print('probe', int(jnp.arange(8).sum()))"
)

STEPS = [
    # (name, argv, timeout_s, extra_env) — round-5 queue, safe -> risky.
    # 1800 s, deliberately huge: a cold/recovering relay can take >5 min to
    # serve the first trivial op (round-4 measurements: 326 s, then >600 s),
    # and KILLING a TPU client on timeout re-wedges the chip for 10-40 min
    # (CLAUDE.md) — a vicious cycle where every impatient probe causes the
    # wedge the next probe times out on.  Wait the probe out instead.
    ("probe", [sys.executable, "-c", PROBE], 1800, {}),
    # Canary for the NEW fused while_loop program at a tiny shape (the
    # single-pair engine now delegates to it on device): compiles + runs
    # the fused loop before anything measurement-critical depends on it.
    ("fused_probe", [sys.executable, "scripts/fused_canary.py"], 1500, {}),
    # Same tiny case through the HOST loop for a cost cross-check.
    ("fused_probe_host", [sys.executable, "scripts/fused_canary.py",
                          "--host"], 1200, {}),
    # NB: bench._measure stages cost_cold -> cost -> record_cold -> record
    # in ONE process (the record shares the cost path's compiled
    # executables), so heli_bench covers the record measurement too.
    # Drain with get(timeout=...), not q.empty() — the mp.Queue feeder
    # thread makes empty() race the last put (round-4 lesson).
    ("heli_bench", [sys.executable, "-c", (
        "import sys; sys.path.insert(0, %r);"
        "import multiprocessing as mp, queue, bench;"
        "q = mp.Queue(); bench._measure(q)\n"
        "while True:\n"
        "    try: print('RESULT', q.get(timeout=5))\n"
        "    except queue.Empty: break"
    ) % REPO], 2400, {}),
    # Per-case device-vs-reference table (VERDICT r4 item 3): warm walls.
    ("goldens_warm", [sys.executable, "scripts/validate_goldens.py",
                      "--cases", "twin_heli_MDC1-AS1_10",
                      "twin_heli_linc01237_114", "underscore",
                      "--chunk", "128", "--warm", "2"], 2400, {}),
    ("ari_warm", [sys.executable, "scripts/validate_goldens.py", "--cases",
                  "twin_ari_chrX_146823507_146823598", "--chunk", "128",
                  "--warm", "2"], 2400, {}),
    ("loci", [sys.executable, "scripts/validate_loci.py"], 1800, {}),
    # Batched bucket through the fused loop (BENCH batched_* preview).
    ("bucket8p", [sys.executable, "scripts/repro_batch_crash.py", "8"],
     1500, {}),
    # Device chained mode, now batched per bucket (VERDICT r4 item 2):
    # 30 kb first (the round-2 scale), then reference scale.
    ("chain30k", [sys.executable, "scripts/validate_chain_scale.py",
                  "30000", "--engine", "jax"], 2400, {}),
    ("chain100k", [sys.executable, "scripts/validate_chain_scale.py",
                   "100000", "--engine", "jax"], 3000, {}),
    ("chain230k", [sys.executable, "scripts/validate_chain_scale.py",
                   "230000", "--engine", "jax"], 3600, {}),
    ("corpus", [sys.executable, "scripts/validate_corpus.py", "520"],
     2400, {}),
    # Host-loop comparison points (fused off), if time permits.
    ("heli_host", [sys.executable, "scripts/validate_goldens.py", "--cases",
                   "twin_heli_MDC1-AS1_10", "--chunk", "128", "--warm", "2"],
     1800, {"TSALIGN_NO_FUSED": "1"}),
    # Follow-up steps (invoked by name in later session runs).
    ("loci_warm", [sys.executable, "scripts/validate_loci.py", "--warm", "2"],
     2400, {}),
    ("record_prof", [sys.executable, "scripts/profile_record.py"], 1500, {}),
    ("heli_bench2", [sys.executable, "-c", (
        "import sys; sys.path.insert(0, %r);"
        "import multiprocessing as mp, queue, bench;"
        "q = mp.Queue(); bench._measure(q)\n"
        "while True:\n"
        "    try: print('RESULT', q.get(timeout=5))\n"
        "    except queue.Empty: break"
    ) % REPO], 2400, {}),
    ("ari_warm2", [sys.executable, "scripts/validate_goldens.py", "--cases",
                   "twin_ari_chrX_146823507_146823598", "--chunk", "128",
                   "--warm", "2"], 2400, {}),
    ("twin1000", [sys.executable, "scripts/validate_twin1000.py",
                  "--traceback"], 2400, {}),
]


def relay_alive() -> bool:
    out = subprocess.run(
        ["ps", "ax", "-o", "command"], capture_output=True, text=True
    ).stdout
    return any("tpu_init" in line for line in out.splitlines())


def log(entry):
    entry["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


def main():
    want = sys.argv[1:]
    if want:
        # honour the COMMAND-LINE order (follow-up steps live at the end
        # of STEPS; a filter in STEPS order ran chains before the
        # measurement steps in round 5's second session)
        by_name = {s[0]: s for s in STEPS}
        steps = [by_name[w] for w in want if w in by_name]
    else:
        steps = STEPS
    if not relay_alive():
        log({"step": "relay_check", "ok": False, "note": "tpu_init not in ps"})
        return 1
    for name, argv, timeout, extra_env in steps:
        env = {**os.environ, **extra_env}
        t0 = time.monotonic()
        # Stream the child's output to a file so a kill-on-timeout still
        # leaves the per-segment progress as evidence (subprocess's
        # capture_output buffers are lost on TimeoutExpired — the round-4
        # AND round-5 chain100k timeouts both left empty tails).
        outpath = os.path.join("/tmp", f"tpu_step_{name}.out")
        try:
            with open(outpath, "w") as outf:
                p = subprocess.run(
                    argv, cwd=REPO, env=env, stdout=outf,
                    stderr=subprocess.STDOUT, text=True, timeout=timeout,
                )
            wall = time.monotonic() - t0
            tail = open(outpath).read()[-2000:]
            log({"step": name, "rc": p.returncode, "wall_s": round(wall, 1),
                 "tail": tail})
            if p.returncode != 0:
                log({"step": "STOP", "after": name,
                     "note": "nonzero exit; chip may be wedged"})
                return 1
        except subprocess.TimeoutExpired:
            wall = time.monotonic() - t0
            try:
                tail = open(outpath).read()[-2000:]
            except OSError:
                tail = ""
            log({"step": name, "rc": "timeout", "wall_s": round(wall, 1),
                 "tail": tail})
            log({"step": "STOP", "after": name,
                 "note": "timeout; chip presumed wedged"})
            return 1
    log({"step": "DONE", "ok": True})
    return 0


if __name__ == "__main__":
    sys.exit(main())
