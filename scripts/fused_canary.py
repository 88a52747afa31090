#!/usr/bin/env python
"""Tiny-canary for the fused while_loop program on the real device.

The single-pair engine delegates to the B=1 fused rounds loop on device
(jax_engine._fused_delegate), so this compiles + runs the NEW program
class at a tiny shape BEFORE anything measurement-critical depends on it.
The pair carries a planted reverse-complement TSM so the rounds loop
actually iterates (an exact-match canary would stop before the fused
program ever launched).

Usage: python scripts/fused_canary.py [--host]   (--host: TSALIGN_NO_FUSED)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--host" in sys.argv:
    os.environ["TSALIGN_NO_FUSED"] = "1"

import numpy as np

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.jax_engine import JaxAligner

al = get_alphabet("dna-n")
cfg = TemplateSwitchConfig.from_path(
    "/root/reference/sample_tsa_config/config.tsa", al
)
rng = np.random.default_rng(5)
comp = al.complement_array()
ref = rng.integers(0, 4, 48).astype(np.int8)
qry = ref.copy()
qry[20:28] = [comp[c] for c in qry[20:28]][::-1]
qry[5] = (qry[5] + 1) % 4

eng = JaxAligner(cfg, ref, qry, chunk=16, keep_fields=False)
res = eng.align()
mode = "host" if os.environ.get("TSALIGN_NO_FUSED") else "fused"
print(f"{mode} canary: cost={res.cost} rounds={res.rounds}", flush=True)
# traceback canary (device tile views / fused field buffers)
eng2 = JaxAligner(cfg, ref, qry, chunk=16, keep_fields="device")
cost, aln = eng2.align_with_traceback()
from tsalign_tpu.pricing import price_alignment

priced = price_alignment(cfg, ref, qry, aln)
print(f"{mode} canary traceback: cost={cost} reprices={priced == cost}",
      flush=True)
assert priced == cost
