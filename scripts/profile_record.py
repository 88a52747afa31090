#!/usr/bin/env python
"""Profile the end-to-end record run (search + traceback + extension + ECR)
on the device: one cold facade.align, then a warm run under cProfile, plus
the device-view tile-fetch counters.  Attributes the gap between the
cost-only headline (~8 s) and record_wall (52 s warm, round-4 session).

Usage: python scripts/profile_record.py [topN]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    import bench

    al, cfg, r_str, q_str, rng = bench._load_heli()
    from tsalign_tpu.aligner import Aligner

    facade = Aligner(costs=cfg, engine="jax", chunk=128)
    t0 = time.time()
    facade.align(r_str, q_str, range_=rng)
    print(f"cold: {time.time()-t0:.1f}s", flush=True)

    import tsalign_tpu.device_fields as df

    fetches = {"n": 0}
    orig = df._TileBase._tile_for

    def counting(self, i, j):
        before = len(self._tiles)
        out = orig(self, i, j)
        if len(self._tiles) != before:
            fetches["n"] += 1
        return out

    df._TileBase._tile_for = counting

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    out = facade.align(r_str, q_str, range_=rng)
    pr.disable()
    wall = time.time() - t0
    print(
        f"warm record: {wall:.2f}s cost={out.stats()['cost']} "
        f"tile_fetches={fetches['n']}",
        flush=True,
    )
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(top)
    # Keep only the table body lines to stay inside the session-log tail.
    for line in s.getvalue().splitlines():
        if line.strip():
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
