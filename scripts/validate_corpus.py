#!/usr/bin/env python
"""Corpus throughput at scale: every shipped twin_* pair up to a size cap
through the multi-bucket batched record pipeline (align_pairs).

The reference has no batch mode — users shell-script over pairs, paying the
full single-core search per pair (SURVEY.md §2.8).  This measures the
TPU-native replacement: pairs bucketed by power-of-two shape, each bucket
one lockstep batched engine run, full record post-processing (traceback,
K-scaled tie-break, extension, equal-cost ranges).

Usage: python scripts/validate_corpus.py [max_len] [--config PATH]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/test_files"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("max_len", type=int, nargs="?", default=520)
    ap.add_argument(
        "--config", default="/root/reference/sample_tsa_config/config.tsa"
    )
    args = ap.parse_args()
    max_len, cfg_path = args.max_len, args.config

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.fasta import parse_pair_fasta_file
    from tsalign_tpu.parallel.batch_ts import align_pairs

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(cfg_path, al)

    pairs, names = [], []
    for path in sorted(glob.glob(f"{FIXTURES}/twin_*.fa")):
        try:
            r, q = parse_pair_fasta_file(path)
        except Exception:
            continue  # single-record or malformed fixtures
        rs, qs = r.sequence.upper(), q.sequence.upper()
        if not rs or not qs or max(len(rs), len(qs)) > max_len:
            continue
        if any(c not in "ACGTN" for c in rs + qs):
            continue  # embedded-range/skip-char fixtures need CLI handling
        pairs.append((rs, qs))
        names.append((os.path.basename(path), ""))
    print(f"corpus: {len(pairs)} pairs <= {max_len} bp", flush=True)

    t0 = time.time()
    records = align_pairs(cfg, pairs, names=names)
    cold = time.time() - t0
    print(f"cold (compiles): {cold:.1f}s", flush=True)
    t0 = time.time()
    records = align_pairs(cfg, pairs, names=names)
    warm = time.time() - t0

    n_found = sum(1 for r in records if r.has_target)
    costs = [int(r.cost) if r.has_target else -1 for r in records]
    print(f"costs: {costs}", flush=True)
    print(
        f"warm: {warm:.1f}s  pairs/s={len(pairs) / warm:.2f}  "
        f"found={n_found}/{len(pairs)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
