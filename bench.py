"""Headline benchmark: full template-switch alignment of the reference's
hardest shipped case, twin_heli_MDC1-AS1_10 (493/419 bp, 2 TSMs), which the
reference solves in 69.62 s single-core (test_files/twin_heli_MDC1-AS1_10.toml
statistics block; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline case, with the batched corpus throughput (pairs/sec through the
full record pipeline + DP cells/sec on device) folded in as batched_* keys.

Each measurement runs in a child process with a hard timeout and one retry:
the TPU relay in this environment occasionally wedges on compile bursts, and
a wedged child must be replaced, not waited on.
"""

import json
import multiprocessing as mp
import os
import sys
import time
import tomllib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GOLDEN = "/root/reference/test_files/twin_heli_MDC1-AS1_10.toml"
BASELINE_SECONDS = 69.622919049
GOLDEN_COST = 24


def _measure(q):
    with open(GOLDEN, "rb") as f:
        g = tomllib.load(f)
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.jax_engine import JaxAligner

    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.postprocess import _advance
    from tsalign_tpu.result import AlignmentResult

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/experiments/config.tsa", al
    )
    ref = al.encode(g["sequences"]["reference"].upper())
    qry = al.encode(g["sequences"]["query"].upper())
    rec = AlignmentResult.from_toml(open(GOLDEN).read())
    ro, qo = rec.reference_offset, rec.query_offset
    rl, ql = _advance(ro, qo, rec.alignment.entries)
    rng = AlignmentRange(ro, qo, rl, ql)

    def run():
        return JaxAligner(
            cfg, ref, qry, range_=rng, chunk=128, keep_fields=False
        ).align()

    res = run()  # cold (compiles; server-side cache persists across runs)
    # best-of-3 warm runs: the TPU relay in this environment adds several
    # seconds of run-to-run jitter (RPC queue state), so the minimum is the
    # stable estimate of the engine's wall time
    wall = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        res = run()
        wall = min(wall, time.monotonic() - t0)
    q.put({"cost": res.cost, "wall": wall})


THROUGHPUT_PAIRS = [
    "twin_100_0.01",
    "twin_100_0.02",
    "twin_100_0.03",
    "twin_100_eq",
    "twin_100_gap10",
    "twin_200_0.01",
    "twin_200_0.02",
    "twin_200_0.03",
]


def _measure_throughput(q):
    """Batched corpus throughput: a bucket of twin pairs through the full
    batched record pipeline (BatchedTSAligner rounds on device + traceback
    + TOML-ready records), BASELINE.md's pairs/sec + cells/sec metrics.

    Runs with the XLA module path: the vmapped Pallas module kernel at this
    bucket shape deterministically crashes the TPU worker on this relay
    (scripts/repro_batch_crash.py), and a crash here would wedge the chip
    for the rest of the bench."""
    import os

    os.environ.setdefault("TSALIGN_NO_PALLAS", "1")
    import numpy as np

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file
    from tsalign_tpu.parallel.batch_ts import BatchedTSAligner, align_pairs

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    pairs = []
    for name in THROUGHPUT_PAIRS:
        r, qy = parse_pair_fasta_file(f"/root/reference/test_files/{name}.fa")
        pairs.append((r.sequence.upper(), qy.sequence.upper()))
    enc = [(al.encode(r), al.encode(qy)) for r, qy in pairs]

    # Device rounds throughput (cost field sweeps), warm after one run.
    bt = BatchedTSAligner(cfg, enc)
    bt.align()
    t0 = time.monotonic()
    results = BatchedTSAligner(cfg, enc).align()
    rounds_wall = time.monotonic() - t0
    sweeps = sum(r.rounds for r in results)
    F = cfg.left_flank_length + cfg.right_flank_length + 1
    cells = sweeps * F * 3 * (bt.nr + 1) * (bt.nq + 1)

    # Full record pipeline throughput (records with traceback, extension,
    # equal-cost ranges), warm.
    align_pairs(cfg, pairs)
    t0 = time.monotonic()
    records = align_pairs(cfg, pairs)
    records_wall = time.monotonic() - t0
    q.put(
        {
            "pairs": len(pairs),
            "pairs_per_sec": len(pairs) / records_wall,
            "cells_per_sec": cells / rounds_wall,
            "all_found": all(r.has_target for r in records),
        }
    )


def _run_child(target, timeout0):
    for attempt in range(3):
        q = mp.Queue()
        p = mp.Process(target=target, args=(q,))
        p.start()
        p.join(timeout=timeout0 if attempt == 0 else 900)
        if p.is_alive():
            p.kill()
            p.join()
            time.sleep(90)  # give the relay time to recover
            continue
        if not q.empty():
            return q.get()
        time.sleep(60)
    return None


def main():
    """ONE JSON line: the heli headline metric, with the batched corpus
    throughput folded in as extra keys.  The driver records the LAST JSON
    line, so the headline must be the only line — a throughput failure must
    degrade to an annotation, never mask the headline (round-2 lesson:
    BENCH_r02 recorded null because a second line failed)."""
    out = {
        "metric": "twin_heli_MDC1-AS1_10_ts_align_wall",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
    }
    result = _run_child(_measure, 1500)
    if result is None:
        out["error"] = "TPU unavailable/wedged after retries"
    else:
        wall = result["wall"]
        out.update(
            value=round(wall, 4),
            vs_baseline=round(BASELINE_SECONDS / wall, 2),
            cost=result["cost"],
            cost_ok=result["cost"] <= GOLDEN_COST,
        )

    # Batched corpus throughput (pairs/sec through the full record pipeline
    # + DP cells/sec on device, BASELINE.md metrics).  No shipped reference
    # corpus number exists, so no vs_baseline for these keys.
    tp = _run_child(_measure_throughput, 1800)
    if tp is None:
        out["batched_error"] = "TPU unavailable/wedged after retries"
    else:
        out.update(
            batched_pairs=tp["pairs"],
            batched_pairs_per_sec=round(tp["pairs_per_sec"], 3),
            batched_cells_per_sec=int(tp["cells_per_sec"]),
            batched_all_found=tp["all_found"],
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
