"""Reproducer for the TPU worker crash in the batched throughput bucket.

Runs the bench.THROUGHPUT_PAIRS bucket through BatchedTSAligner with the
current env (honours TSALIGN_NO_PALLAS) and prints each phase so the
crashing phase is identifiable.  Usage:

  python scripts/repro_batch_crash.py [n_pairs]
  TSALIGN_NO_PALLAS=1 python scripts/repro_batch_crash.py
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BISECT_LOG"):
    logging.basicConfig(
        level=logging.DEBUG,
        format="%(asctime)s %(name)s %(message)s",
        stream=sys.stdout,
    )
    logging.getLogger("jax").setLevel(logging.WARNING)

import bench  # noqa: E402
from tsalign_tpu.alphabet import get_alphabet  # noqa: E402
from tsalign_tpu.config import TemplateSwitchConfig  # noqa: E402
from tsalign_tpu.fasta import parse_pair_fasta_file  # noqa: E402
from tsalign_tpu.parallel.batch_ts import BatchedTSAligner  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(bench.THROUGHPUT_PAIRS)
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    pairs = []
    for name in bench.THROUGHPUT_PAIRS[:n]:
        r, qy = parse_pair_fasta_file(f"/root/reference/test_files/{name}.fa")
        pairs.append((al.encode(r.sequence.upper()), al.encode(qy.sequence.upper())))
    print(f"pairs={len(pairs)} no_pallas={bool(os.environ.get('TSALIGN_NO_PALLAS'))}",
          flush=True)
    t0 = time.monotonic()
    bt = BatchedTSAligner(cfg, pairs)
    print(f"bucket nr={bt.nr} nq={bt.nq}", flush=True)
    res = bt.align()
    print("costs:", [r.cost for r in res], f"{time.monotonic()-t0:.1f}s", flush=True)
    # warm in-process repeat: jit caches hot, isolates execute time from
    # (remote) compile time
    t0 = time.monotonic()
    res = BatchedTSAligner(cfg, pairs).align()
    print("warm costs:", [r.cost for r in res], f"{time.monotonic()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
