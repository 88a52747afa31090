"""Headline benchmark: full template-switch alignment of the reference's
hardest shipped case, twin_heli_MDC1-AS1_10 (493/419 bp, 2 TSMs), which the
reference solves in 69.62 s single-core (test_files/twin_heli_MDC1-AS1_10.toml
statistics block; BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
import tomllib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GOLDEN = "/root/reference/test_files/twin_heli_MDC1-AS1_10.toml"
BASELINE_SECONDS = 69.622919049
GOLDEN_COST = 24


def main():
    with open(GOLDEN, "rb") as f:
        g = tomllib.load(f)
    ref_s = g["sequences"]["reference"]
    qry_s = g["sequences"]["query"]

    from tsalign_tpu.alphabet import get_alphabet
    from tsalign_tpu.config import TemplateSwitchConfig

    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.from_path(
        "/root/reference/sample_tsa_config/config.tsa", al
    )
    ref = al.encode(ref_s.upper())
    qry = al.encode(qry_s.upper())

    from tsalign_tpu.jax_engine import JaxAligner

    def run():
        return JaxAligner(cfg, ref, qry, chunk=64, keep_fields=False).align()

    # warmup (compiles cached afterwards)
    res = run()
    t0 = time.monotonic()
    res = run()
    wall = time.monotonic() - t0

    ok = res.cost == GOLDEN_COST
    out = {
        "metric": "twin_heli_MDC1-AS1_10_ts_align_wall",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 2),
        "cost": res.cost,
        "cost_ok": ok,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
