#!/usr/bin/env python
"""Validate the dense engine against the reference's golden TOML records.

Runs each golden case (the pairs embedded in test_files/*.toml) through the
device engine and compares optimal costs; with --alignments also re-prices
the golden alignment under our cost model (it must price to exactly the
golden cost) and checks our TSM count.

Usage:
  python scripts/validate_goldens.py              # TPU (or default backend)
  JAX_PLATFORMS=cpu PYTHONPATH= python scripts/validate_goldens.py --cases twin_ari_chrX_146823507_146823598
"""

import argparse
import os
import sys
import time
import tomllib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDENS = {
    "twin_heli_MDC1-AS1_10": 24,
    "twin_heli_linc01237_114": 25,
    "underscore": 23,
    "twin_ari_chrX_146823507_146823598": 6,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=list(GOLDENS))
    ap.add_argument("--alignments", action="store_true")
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument(
        "--warm", type=int, default=0,
        help="after the cold run, repeat N times and report the best warm "
        "wall (the per-case device-vs-reference table, VERDICT r4 item 3)",
    )
    args = ap.parse_args()

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.jax_engine import JaxAligner
    from tsalign_tpu.pricing import price_alignment
    from tsalign_tpu.result import AlignmentResult

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/test_files/config/experiments/config.tsa", al
    )
    failures = 0
    for name in args.cases:
        path = f"/root/reference/test_files/{name}.toml"
        with open(path, "rb") as f:
            g = tomllib.load(f)
        ref = al.encode(g["sequences"]["reference"].upper())
        qry = al.encode(g["sequences"]["query"].upper())
        expect = int(g["cost"])
        from tsalign_tpu.geometry import AlignmentRange
        from tsalign_tpu.postprocess import _advance

        rec = AlignmentResult.from_toml(open(path).read())
        ro, qo = rec.reference_offset, rec.query_offset
        rl, ql = _advance(ro, qo, rec.alignment.entries)
        rng = AlignmentRange(ro, qo, rl, ql)
        if args.alignments:
            p = price_alignment(cfg, ref, qry, rec.alignment, range_=rng)
            ok = p == expect
            print(f"{name}: golden alignment re-prices to {p} (expect {expect}) ok={ok}")
            failures += 0 if ok else 1
        t0 = time.time()
        res = JaxAligner(
            cfg, ref, qry, range_=rng, chunk=args.chunk, keep_fields=False
        ).align()
        # The stored offsets are post-extension, so the engine may find a
        # strictly cheaper optimum over the widened range; the exact-semantics
        # check is the golden re-pricing equality above.
        ok = res.cost <= expect
        print(
            f"{name}: n=({len(ref)},{len(qry)}) range={rng} cost={res.cost} "
            f"expect={expect} ok={ok} rounds={res.rounds} {time.time()-t0:.1f}s",
            flush=True,
        )
        failures += 0 if ok else 1
        if args.warm:
            warm = float("inf")
            for _ in range(args.warm):
                t0 = time.time()
                res_w = JaxAligner(
                    cfg, ref, qry, range_=rng, chunk=args.chunk,
                    keep_fields=False,
                ).align()
                warm = min(warm, time.time() - t0)
                assert res_w.cost == res.cost
            print(f"{name}: warm_wall={warm:.2f}s (best of {args.warm})",
                  flush=True)
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
