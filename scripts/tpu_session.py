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

Steps in default order (safe -> risky):
  probe          tiny device op (relay liveness)
  heli_bench     headline bench case, cold + best-of-3 warm
  goldens        heli/linc/underscore engine runs vs golden costs
  loci           flanked real loci (TSNAX/GNG12/LINC00271, bench config)
  chain_scale    30 kb chained mode on the device engine (padded buckets)
  twin1000       twin_1000 family device pins (sample config)
  ari            the 1099x1099 golden (crashed the worker in round 1/2)
  bucket2/4/8    batched bucket ladder, XLA module path (NO_PALLAS=1)
  bucket8p       batched bucket, Pallas module kernel (the known crasher)
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
    # (name, argv, timeout_s, extra_env)
    # 1800 s, deliberately huge: a cold/recovering relay can take >5 min to
    # serve the first trivial op (round-4 measurements: 326 s, then >600 s),
    # and KILLING a TPU client on timeout re-wedges the chip for 10-40 min
    # (CLAUDE.md) — a vicious cycle where every impatient probe causes the
    # wedge the next probe times out on.  Wait the probe out instead.
    ("probe", [sys.executable, "-c", PROBE], 1800, {}),
    # NB: drain with get(timeout=...), not q.empty() — the mp.Queue feeder
    # thread makes empty() race the last put (a warm measurement was lost
    # to this in round 4).
    ("heli_bench", [sys.executable, "-c", (
        "import sys; sys.path.insert(0, %r);"
        "import multiprocessing as mp, queue, bench;"
        "q = mp.Queue(); bench._measure(q)\n"
        "while True:\n"
        "    try: print('RESULT', q.get(timeout=5))\n"
        "    except queue.Empty: break"
    ) % REPO], 1800, {}),
    # NB: bench._measure now stages cost_cold -> cost -> record_cold ->
    # record in one process (the record shares the cost path's compiled
    # executables), so heli_bench covers the record measurement too.
    ("goldens", [sys.executable, "scripts/validate_goldens.py", "--cases",
                 "twin_heli_MDC1-AS1_10", "twin_heli_linc01237_114",
                 "underscore", "--chunk", "128"], 1800, {}),
    ("loci", [sys.executable, "scripts/validate_loci.py"], 1800, {}),
    ("chain_scale", [sys.executable, "scripts/validate_chain_scale.py",
                     "30000", "--engine", "jax"], 2400, {}),
    ("twin1000", [sys.executable, "scripts/validate_twin1000.py",
                  "--traceback"], 2400, {}),
    ("ari", [sys.executable, "scripts/validate_goldens.py", "--cases",
             "twin_ari_chrX_146823507_146823598", "--chunk", "128"], 2400, {}),
    ("bucket2", [sys.executable, "scripts/repro_batch_crash.py", "2"], 1200,
     {"TSALIGN_NO_PALLAS": "1"}),
    ("bucket4", [sys.executable, "scripts/repro_batch_crash.py", "4"], 1200,
     {"TSALIGN_NO_PALLAS": "1"}),
    ("bucket8", [sys.executable, "scripts/repro_batch_crash.py", "8"], 1500,
     {"TSALIGN_NO_PALLAS": "1"}),
    # Round-4 throughput experiments (risk-ordered): bigger e-chunks on the
    # XLA scan path (the 128 MB assembly clamp pre-dates the round-3 gather
    # root-cause fix, so C=16 at the 256 bucket is likely over-conservative),
    # then the Pallas module kernel under lax.map (the round-3 rewrites
    # removed the gather fault class this path was blamed for).
    ("bucket8_c64", [sys.executable, "scripts/repro_batch_crash.py", "8"],
     1500, {"TSALIGN_NO_PALLAS": "1", "TSALIGN_ASM_BUDGET_MB": "512"}),
    ("bucket8p", [sys.executable, "scripts/repro_batch_crash.py", "8"], 1500, {}),
    ("bucket8p_c64", [sys.executable, "scripts/repro_batch_crash.py", "8"],
     1500, {"TSALIGN_ASM_BUDGET_MB": "512"}),
    # Device-engine chained mode at reference scale (VERDICT r3 item 4).
    ("chain100k", [sys.executable, "scripts/validate_chain_scale.py",
                   "100000", "--engine", "jax"], 3000, {}),
    ("chain230k", [sys.executable, "scripts/validate_chain_scale.py",
                   "230000", "--engine", "jax"], 3600, {}),
    # Round-4 attribution + corpus throughput.
    ("record_prof", [sys.executable, "scripts/profile_record.py"], 1200, {}),
    ("corpus", [sys.executable, "scripts/validate_corpus.py", "520"],
     2400, {}),
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
    steps = [s for s in STEPS if not want or s[0] in want]
    if not relay_alive():
        log({"step": "relay_check", "ok": False, "note": "tpu_init not in ps"})
        return 1
    for name, argv, timeout, extra_env in steps:
        env = {**os.environ, **extra_env}
        t0 = time.monotonic()
        try:
            p = subprocess.run(
                argv, cwd=REPO, env=env, capture_output=True, text=True,
                timeout=timeout,
            )
            wall = time.monotonic() - t0
            tail = (p.stdout + p.stderr)[-2000:]
            log({"step": name, "rc": p.returncode, "wall_s": round(wall, 1),
                 "tail": tail})
            if p.returncode != 0:
                log({"step": "STOP", "after": name,
                     "note": "nonzero exit; chip may be wedged"})
                return 1
        except subprocess.TimeoutExpired as e:
            wall = time.monotonic() - t0
            tail = ((e.stdout or "") + (e.stderr or ""))[-2000:] if (
                isinstance(e.stdout, str) or isinstance(e.stderr, str)
            ) else ""
            log({"step": name, "rc": "timeout", "wall_s": round(wall, 1),
                 "tail": tail})
            log({"step": "STOP", "after": name,
                 "note": "timeout; chip presumed wedged"})
            return 1
    log({"step": "DONE", "ok": True})
    return 0


if __name__ == "__main__":
    sys.exit(main())
