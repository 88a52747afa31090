"""Randomized differential fuzz harness (longer-running than the suite).

Two modes:
  engines  — oracle (Dijkstra spec) == numpy dense == JAX device costs over
             random configs/pairs/flags (max_ts, sdel).
  e2e      — full Aligner facade (K-scaled tie-break, traceback, extension,
             equal-cost ranges): the final cost must equal the oracle's
             optimum and the emitted alignment must re-price to it exactly
             (pricing.py), including after extension.

Usage:
  env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/fuzz_engines.py engines 540 12345
  env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/fuzz_engines.py e2e 540 777
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

from tsalign_tpu.costs import INF  # noqa: E402


def fuzz_engines(budget_s: float, seed0: int) -> int:
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.engine import DenseAligner
    from tsalign_tpu.jax_engine import JaxAligner
    from tsalign_tpu.oracle import OracleAligner
    from util import random_config, related_pair

    al = get_alphabet("dna")
    rng = np.random.default_rng(seed0)
    t0, trials, fails = time.time(), 0, 0
    while time.time() - t0 < budget_s:
        trials += 1
        cfg = random_config(rng, al, flanks=bool(rng.integers(2)))
        ref, qry = related_pair(rng, al, max_len=12)
        mts = [None, 0, 1, 2, 3][int(rng.integers(5))]
        sdel = bool(rng.integers(2))
        kw = dict(max_template_switches=mts, allow_secondary_deletions=sdel)
        try:
            if sdel:
                # The oracle is the always-allow-sdel spec.
                oc, _ = OracleAligner(
                    cfg, ref, qry, max_template_switches=mts
                ).align()
                oc = oc if oc is not None else INF
            nc = DenseAligner(cfg, ref, qry, **kw).align().cost
            jc = JaxAligner(cfg, ref, qry, chunk=8, keep_fields=False, **kw).align().cost
            if not sdel:
                oc = nc  # numpy-vs-jax only for the no-sdel strategy
        except Exception as e:  # noqa: BLE001
            print(f"FAIL trial={trials} EXC {type(e).__name__}: {e}", flush=True)
            fails += 1
            continue
        if not (oc == nc == jc):
            print(
                f"FAIL trial={trials} mts={mts} sdel={sdel} "
                f"oracle={oc} numpy={nc} jax={jc}",
                flush=True,
            )
            print("ref", ref.tolist(), "qry", qry.tolist(), flush=True)
            fails += 1
    print(f"done mode=engines trials={trials} fails={fails} seed={seed0}")
    return fails


def fuzz_e2e(budget_s: float, seed0: int) -> int:
    from tsalign_tpu.aligner import Aligner
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.oracle import OracleAligner
    from tsalign_tpu.pricing import price_alignment
    from util import random_config, related_pair

    al = get_alphabet("dna")
    rng = np.random.default_rng(seed0)
    t0, trials, fails = time.time(), 0, 0
    while time.time() - t0 < budget_s:
        trials += 1
        cfg = random_config(rng, al, flanks=bool(rng.integers(2)))
        ref, qry = related_pair(rng, al, max_len=11)
        try:
            oc, _ = OracleAligner(cfg, ref, qry).align()
            oc = oc if oc is not None else INF
            a = Aligner(costs=cfg, alphabet="dna", engine="numpy")
            res = a.align(al.decode(ref), al.decode(qry))
            cost = int(res.stats()["cost"]) if res.has_target() else None
            ok = (cost if cost is not None else INF) == oc
            flanked = (
                cfg.left_flank_length > 0 or cfg.right_flank_length > 0
            )
            # Re-pricing flanked alignments is unsupported (flank ops
            # RLE-merge lossily; the reference's compute_cost has a todo!()
            # there too) — cost equality vs the oracle still holds above.
            if ok and res.has_target() and not flanked:
                p = price_alignment(
                    cfg, ref, qry, res.result.alignment
                )
                ok = p == cost
        except Exception as e:  # noqa: BLE001
            print(f"FAIL trial={trials} EXC {type(e).__name__}: {e}", flush=True)
            fails += 1
            continue
        if not ok:
            print(
                f"FAIL trial={trials} oracle={oc} aligner={cost}",
                flush=True,
            )
            print("ref", ref.tolist(), "qry", qry.tolist(), flush=True)
            fails += 1
    print(f"done mode=e2e trials={trials} fails={fails} seed={seed0}")
    return fails


def fuzz_batch(budget_s: float, seed0: int) -> int:
    """align_pairs (batched device rounds + traceback + tie-break guard)
    must match the single-pair Aligner facade on cost for every pair, and
    each emitted alignment must re-price to its reported cost."""
    from tsalign_tpu.aligner import Aligner
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.parallel.batch_ts import align_pairs
    from tsalign_tpu.pricing import price_alignment
    from util import random_config, related_pair

    al = get_alphabet("dna")
    rng = np.random.default_rng(seed0)
    t0, trials, fails = time.time(), 0, 0
    while time.time() - t0 < budget_s:
        trials += 1
        cfg = random_config(rng, al, flanks=False)
        B = int(rng.integers(2, 5))
        pairs = []
        for _ in range(B):
            r, q = related_pair(rng, al, max_len=12)
            pairs.append((al.decode(r), al.decode(q)))
        try:
            recs = align_pairs(cfg, pairs)
            a = Aligner(costs=cfg, alphabet="dna", engine="numpy")
            for i, (r_s, q_s) in enumerate(pairs):
                want = a.align(r_s, q_s)
                wc = (
                    int(want.stats()["cost"]) if want.has_target() else None
                )
                got = (
                    int(recs[i].result.cost)
                    if recs[i].result.type == "FoundTarget"
                    else None
                )
                ok = wc == got
                if ok and got is not None:
                    # The record's entries re-price to the reported cost.
                    from tsalign_tpu.alignment import Alignment

                    aln = Alignment(list(recs[i].alignment.entries))
                    p = price_alignment(
                        cfg, al.encode(r_s), al.encode(q_s), aln
                    )
                    ok = p == got
                if not ok:
                    print(
                        f"FAIL trial={trials} pair={i} want={wc} got={got}",
                        flush=True,
                    )
                    print("ref", r_s, "qry", q_s, flush=True)
                    fails += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL trial={trials} EXC {type(e).__name__}: {e}", flush=True)
            fails += 1
    print(f"done mode=batch trials={trials} fails={fails} seed={seed0}")
    return fails


def fuzz_padded(budget_s: float, seed0: int) -> int:
    """Poison-padded problems (bucketed batch/chain emulation) must cost
    exactly the unpadded problem on BOTH engines: padding only adds INF
    moves, and the structural feasibilities (seed walks, strict reentry,
    exit anti-gap walk) must derive from the real lengths."""
    from tsalign_tpu.engine import DenseAligner
    from tsalign_tpu.jax_engine import JaxAligner
    from tsalign_tpu.geometry import AlignmentRange
    from tsalign_tpu.alphabet import get_alphabet
    from util import random_config, related_pair

    al = get_alphabet("dna")
    rng = np.random.default_rng(seed0)
    t0, trials, fails = time.time(), 0, 0
    while time.time() - t0 < budget_s:
        trials += 1
        cfg = random_config(rng, al, flanks=bool(rng.integers(2)))
        r, q = related_pair(rng, al, max_len=12)
        P = al.size
        padr, padq = int(rng.integers(0, 24)), int(rng.integers(0, 24))
        rp = np.concatenate([r, np.full(padr, P, r.dtype)])
        qp = np.concatenate([q, np.full(padq, P, q.dtype)])
        rng_ = AlignmentRange(0, 0, len(r), len(q))
        mts = [None, 0, 2][int(rng.integers(3))]
        try:
            want = DenseAligner(cfg, r, q, max_template_switches=mts).align().cost
            dp = DenseAligner(
                cfg, rp, qp, range_=rng_, max_template_switches=mts
            ).align().cost
            jp = JaxAligner(
                cfg, rp, qp, range_=rng_, max_template_switches=mts,
                chunk=8, keep_fields=False,
            ).align().cost
        except Exception as e:  # noqa: BLE001
            print(f"FAIL trial={trials} EXC {type(e).__name__}: {e}", flush=True)
            fails += 1
            continue
        if not (want == dp == jp):
            print(
                f"FAIL trial={trials} mts={mts} pads=({padr},{padq}) "
                f"want={want} dense_pad={dp} jax_pad={jp}",
                flush=True,
            )
            print("ref", r.tolist(), "qry", q.tolist(), flush=True)
            fails += 1
    print(f"done mode=padded trials={trials} fails={fails} seed={seed0}")
    return fails


def fuzz_chain(budget_s: float, seed0: int) -> int:
    """chain_align (anchors -> windowed chain -> segment cuts -> dense
    segments -> verification pass) must equal the full dense engine on
    pairs small enough to run both.  Pairs are built related (mutated
    copies with planted reverse-complement stretches) so anchors exist —
    the regime the cut heuristic actually operates in."""
    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.chain.driver import chain_align
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.engine import DenseAligner
    from tsalign_tpu.pricing import price_alignment

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    comp = al.complement_array()
    rng = np.random.default_rng(seed0)
    t0, trials, fails = time.time(), 0, 0
    while time.time() - t0 < budget_s:
        trials += 1
        n = int(rng.integers(100, 170))
        ref = rng.integers(0, 4, size=n).astype(np.int8)
        qry = ref.copy()
        # planted reverse-complement TSMs
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(10, n - 20))
            L = int(rng.integers(6, 12))
            qry[p : p + L] = [comp[c] for c in qry[p : p + L]][::-1]
        # SNPs and short indels
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, n))
            qry[p] = (qry[p] + 1 + int(rng.integers(3))) % 4
        if rng.integers(2):
            p = int(rng.integers(0, n - 3))
            qry = np.delete(qry, slice(p, p + int(rng.integers(1, 3))))
        try:
            want = DenseAligner(cfg, ref, qry).align().cost
            res = chain_align(
                cfg, ref, qry, engine="numpy",
                target_segment=int(rng.integers(48, 160)),
                verify=True, progress=False,
            )
            got = res.cost
            ok = want == got
            if ok:
                ok = price_alignment(cfg, ref, qry, res.alignment) == got
        except Exception as e:  # noqa: BLE001
            print(f"FAIL trial={trials} EXC {type(e).__name__}: {e}", flush=True)
            fails += 1
            continue
        if not ok:
            print(
                f"FAIL trial={trials} n={n} want={want} got={got}", flush=True
            )
            fails += 1
    print(f"done mode=chain trials={trials} fails={fails} seed={seed0}")
    return fails


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "engines"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 300
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    fn = {
        "engines": fuzz_engines,
        "e2e": fuzz_e2e,
        "batch": fuzz_batch,
        "padded": fuzz_padded,
        "chain": fuzz_chain,
    }[mode]
    fails = fn(budget, seed)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
