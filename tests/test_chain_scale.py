"""Multi-kb chained-mode exactness in the suite (VERDICT r1 item 3).

A scaled-down version of scripts/validate_chain_scale.py (which runs the
same construction at 230 kb): a seeded multi-kb pair with planted
reverse-complement TSMs and SNPs whose optimal cost is known by
construction; the chained pipeline (anchors -> chain -> segment cuts ->
dense segments -> verification pass) must stitch to exactly that optimum,
report every planted TSM, and re-price exactly.
"""

import importlib.util
import os

import numpy as np

from tsalign_tpu.alignment import is_template_switch_entrance
from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.chain.driver import chain_align
from tsalign_tpu.config import TemplateSwitchConfig
from tsalign_tpu.pricing import price_alignment

_spec = importlib.util.spec_from_file_location(
    "chain_scale_script",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "validate_chain_scale.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_chain_align_multikb_planted_optimum():
    al = get_alphabet("dna-n")
    cfg = TemplateSwitchConfig.parse_plain(_mod.CONFIG, al)
    comp = al.complement_array()

    n = 1500
    rng = np.random.default_rng(3000)
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    ts_sites = list(range(n // 20, n - 50, max(n // 10, 100)))
    for p in ts_sites:
        qry[p : p + 8] = [comp[c] for c in qry[p : p + 8]][::-1]
    snp_sites = [
        p
        for p in range(n // 40, n - 50, max(n // 100, 50))
        if all(abs(p - t) > 60 for t in ts_sites)
    ]
    for p in snp_sites:
        qry[p] = (qry[p] + 1) % 4
    expected = 2 * len(ts_sites) + 2 * len(snp_sites)

    res = chain_align(
        cfg, ref, qry, engine="numpy", target_segment=512,
        verify=True, progress=False,
    )
    assert res.cost == expected
    assert price_alignment(cfg, ref, qry, res.alignment) == expected
    n_ts = sum(
        1 for _, t in res.alignment.entries if is_template_switch_entrance(t)
    )
    # At least every planted TSM (co-optimal alignments may trade a SNP for
    # an equal-cost fortuitous TSM, and the maximise-total-length tie-break
    # prefers them — an 11th TSM at this seed is correct behavior).
    assert n_ts >= len(ts_sites)
