"""Chained long-sequence mode: anchors, chain, and segment-stitch driver."""

import numpy as np

from tsalign_tpu.alphabet import get_alphabet
from tsalign_tpu.chain import chain_align
from tsalign_tpu.chain.anchors import Anchors, choose_k
from tsalign_tpu.chain.chain import compute_chain, exact_match_runs
from tsalign_tpu.engine import DenseAligner
from tsalign_tpu.pricing import price_alignment

from util import random_config


def test_anchor_native_matches_numpy():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n1, n2 = int(rng.integers(0, 150)), int(rng.integers(0, 150))
        k = int(rng.integers(2, 12))
        r = rng.integers(0, 5, size=n1).astype(np.int8)  # includes N
        q = rng.integers(0, 5, size=n2).astype(np.int8)
        a = Anchors.build(r, q, k, use_native=True)
        b = Anchors.build(r, q, k, use_native=False)
        assert np.array_equal(a.ref_pos, b.ref_pos)
        assert np.array_equal(a.qry_pos, b.qry_pos)


def test_anchor_exactness():
    rng = np.random.default_rng(3)
    r = rng.integers(0, 4, size=60).astype(np.int8)
    q = rng.integers(0, 4, size=60).astype(np.int8)
    k = 5
    a = Anchors.build(r, q, k)
    expected = {
        (i, j)
        for i in range(len(r) - k + 1)
        for j in range(len(q) - k + 1)
        if np.array_equal(r[i : i + k], q[j : j + k])
    }
    assert set(zip(a.ref_pos.tolist(), a.qry_pos.tolist())) == expected


def test_chain_follows_diagonal():
    rng = np.random.default_rng(5)
    n = 400
    r = rng.integers(0, 4, size=n).astype(np.int8)
    q = r.copy()
    q[200] = (q[200] + 1) % 4
    a = Anchors.build(r, q, choose_k(2 * n))
    ch = compute_chain(a)
    assert len(ch) > 10
    assert np.array_equal(ch.ref_pos, ch.qry_pos)  # identical pair: main diagonal
    runs = exact_match_runs(ch)
    assert 1 <= len(runs) <= 3


def test_chain_align_matches_full_engine():
    """Chained mode equals the full dense engine when TSMs are local
    (small-window config keeps the numpy engine fast)."""
    rng = np.random.default_rng(11)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    n = 160
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    a, b = 60, 60 + max(3, cfg.template_switch_min_length + 1)
    qry[a:b] = [comp[c] for c in qry[a:b]][::-1]
    qry[20] = (qry[20] + 1) % 4

    res = chain_align(cfg, ref, qry, target_segment=48, engine="numpy")
    assert res.segments >= 2
    assert price_alignment(cfg, ref, qry, res.alignment) == res.cost
    full = DenseAligner(cfg, ref, qry).align().cost
    assert res.cost == full


_NARROW_CONFIG = """# Limits

left_flank_length = 0
right_flank_length = 0

# Base Cost

rrf_cost = 3
rqf_cost = 2
qrf_cost = 2
qqf_cost = 3
rrr_cost = 3
rqr_cost = 2
qrr_cost = 2
qqr_cost = 3

# Jump Costs

RQQROffset
 -inf -12 13
  inf   0 inf

RRQQOffset
 -inf -12 13
  inf   0 inf

Length
   0 5 6 7 8 9
 inf 5 3 1 0 inf

LengthDifference
 -inf -4 5
  inf  0 inf

ForwardAntiPrimaryGap
 -inf   1
    0 inf

ReverseAntiPrimaryGap
 -inf
    0

# Primary Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  2  2  2  0
C |  2  0  2  2  0
G |  2  2  0  2  0
T |  2  2  2  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 3 3 3 3 3

GapExtendCostVector
 A C G T N
 1 1 1 1 1

# Secondary Forward Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  8  8  8  4
C |  8  0  8  8  4
G |  8  8  0  8  4
T |  8  8  8  0  4
N |  4  4  4  4  4

GapOpenCostVector
 A C G T N
 9 9 9 9 9

GapExtendCostVector
 A C G T N
 2 2 2 2 2

# Secondary Reverse Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  8  8  8  4
C |  8  0  8  8  4
G |  8  8  0  8  4
T |  8  8  8  0  4
N |  4  4  4  4  4

GapOpenCostVector
 A C G T N
 9 9 9 9 9

GapExtendCostVector
 A C G T N
 2 2 2 2 2

# Left Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  3  3  3  0
C |  3  0  3  3  0
G |  3  3  0  3  0
T |  3  3  3  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 4 4 4 4 4

GapExtendCostVector
 A C G T N
 1 1 1 1 1

# Right Flank Edit Costs

SubstitutionCostTable
  |  A  C  G  T  N
--+---------------
A |  0  3  3  3  0
C |  3  0  3  3  0
G |  3  3  0  3  0
T |  3  3  3  0  0
N |  0  0  0  0  0

GapOpenCostVector
 A C G T N
 4 4 4 4 4

GapExtendCostVector
 A C G T N
 1 1 1 1 1
"""


def test_chain_cli(tmp_path):
    """CLI wiring of the chained method (narrow-window config so the numpy
    engine stays fast; TSM planted near the start keeps jump offsets inside
    the +-12 window)."""
    import os
    import subprocess
    import sys as _sys

    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "config.tsa").write_text(_NARROW_CONFIG)

    rng = np.random.default_rng(4)
    al = get_alphabet("dna-n")
    n = 80
    ref = rng.integers(0, 4, size=n)
    qry = ref.copy()
    comp = al.complement_array()
    qry[4:12] = [comp[c] for c in qry[4:12]][::-1]
    qry[60] = (qry[60] + 1) % 4
    fa = tmp_path / "pair.fa"
    fa.write_text(
        ">ref\n" + al.decode(ref) + "\n>qry\n" + al.decode(qry) + "\n"
    )
    out = tmp_path / "out.toml"
    r = subprocess.run(
        [
            _sys.executable,
            "-m",
            "tsalign_tpu.cli",
            "align",
            "-p",
            str(fa),
            "-c",
            str(cfgdir),
            "--alignment-method",
            "a-star-chain-ts",
            "--engine",
            "numpy",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=500,
        # The subprocess does not inherit conftest's in-process CPU forcing;
        # without this it would initialise JAX against the (exclusive) TPU
        # relay and hang if another client holds it.
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert "segments:" in r.stdout
    from tsalign_tpu.result import AlignmentResult

    res = AlignmentResult.from_toml(out.read_text())
    assert res.has_target


def test_chain_align_jax_engine_matches_full():
    """Chained mode through the device-engine path (poison-bucketed
    segments, NoPrune over the bucket) equals the full dense engine."""
    rng = np.random.default_rng(11)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    n = 160
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    a, b = 60, 60 + max(3, cfg.template_switch_min_length + 1)
    qry[a:b] = [comp[c] for c in qry[a:b]][::-1]
    qry[20] = (qry[20] + 1) % 4

    res = chain_align(cfg, ref, qry, target_segment=48, engine="jax")
    assert res.segments >= 2
    assert price_alignment(cfg, ref, qry, res.alignment) == res.cost
    assert res.cost == DenseAligner(cfg, ref, qry).align().cost


def test_preprocess_cli_and_force_no_preprocessing(tmp_path):
    """preprocess writes the sha1-{k}-{max_n}-keyed plan ladder; chained
    align CONSUMES it (--force-no-preprocessing succeeds against the
    populated cache, refuses against an empty one) — the load-else-compute
    -and-store protocol of a_star_chain_ts.rs:49-70 + util.rs:46-66."""
    import os
    import subprocess
    import sys as _sys

    cfgdir = tmp_path / "cfg"
    cfgdir.mkdir()
    (cfgdir / "config.tsa").write_text(_NARROW_CONFIG)
    cache = tmp_path / "cache"
    cache.mkdir()
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [
            _sys.executable, "-m", "tsalign_tpu.cli", "preprocess",
            "-c", str(cfgdir), "--cache-directory", str(cache),
            "--max-n", "256",
        ],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr
    plans = sorted(cache.glob("*.tsc.json"))
    # ladder 256, 128, 64
    assert len(plans) == 3, plans

    fa = tmp_path / "p.fa"
    fa.write_text(">r\nACGTACGTACGT\n>q\nACGTACGTACGT\n")
    # --force-no-preprocessing against the populated cache: the align run
    # must load the matching (k, max_n) plan instead of recomputing.
    # n=12 -> max_n=16... below the preprocess ladder floor of 64, so run
    # the ladder down via a direct plan check instead: the CLI align uses
    # max_n inferred from the input; make an input long enough to land on
    # the 64 bucket.
    seq = "ACGTACGTAC" * 6  # n=60 -> max_n=64, k=choose_k(120)=4
    fa.write_text(f">r\n{seq}\n>q\n{seq}\n")
    r1 = subprocess.run(
        [
            _sys.executable, "-m", "tsalign_tpu.cli", "align",
            "-p", str(fa), "-c", str(cfgdir),
            "--alignment-method", "a-star-chain-ts", "--engine", "numpy",
            "--force-no-preprocessing", "--cache-directory", str(cache),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r1.returncode == 0, r1.stderr

    # --force-no-preprocessing with an EMPTY cache dir must refuse.
    empty = tmp_path / "empty"
    empty.mkdir()
    r2 = subprocess.run(
        [
            _sys.executable, "-m", "tsalign_tpu.cli", "align",
            "-p", str(fa), "-c", str(cfgdir),
            "--alignment-method", "a-star-chain-ts", "--engine", "numpy",
            "--force-no-preprocessing", "--cache-directory", str(empty),
        ],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r2.returncode == 2
    assert "no cache file found" in r2.stderr

    # Without the flag, a cache miss computes AND stores (store-on-miss).
    r3 = subprocess.run(
        [
            _sys.executable, "-m", "tsalign_tpu.cli", "align",
            "-p", str(fa), "-c", str(cfgdir),
            "--alignment-method", "a-star-chain-ts", "--engine", "numpy",
            "--cache-directory", str(empty),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r3.returncode == 0, r3.stderr
    assert list(empty.glob("*.tsc.json"))


def test_chain_align_tiebreak_matches_full_engine():
    """Chained mode applies the maximise-total-length tie-break (K-scaled
    per segment, align.rs:115-117): (cost, ts_total_length) equals the full
    engine's scaled run."""
    rng = np.random.default_rng(21)
    al = get_alphabet("dna")
    cfg = random_config(rng, al, flanks=False)
    n = 140
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = al.complement_array()
    a, b = 50, 50 + max(4, cfg.template_switch_min_length + 2)
    qry[a:b] = [comp[c] for c in qry[a:b]][::-1]

    res = chain_align(cfg, ref, qry, target_segment=40, engine="numpy")

    K = 1
    while K < 2 * n + 2:
        K *= 2
    comp_full = DenseAligner(cfg.scaled_for_length_tiebreak(K), ref, qry).align().cost
    cost_full = -(-comp_full // K)
    len_full = K * cost_full - comp_full
    assert (res.cost, res.ts_total_length) == (cost_full, len_full)


def test_chain_align_verification_fuzz():
    """Fuzz the cut heuristic: with the verification pass, the stitched
    (cost, ts_total_length) must equal the full engine's for every random
    pair — suboptimal cuts are detected and rejoined
    (chain_align.rs:157-282 convergence analog)."""
    al = get_alphabet("dna")
    comp = al.complement_array()
    for seed in range(4):
        rng = np.random.default_rng(300 + seed)
        cfg = random_config(rng, al, flanks=False)
        n = 100 + int(rng.integers(0, 50))
        ref = rng.integers(0, 4, size=n).astype(np.int8)
        qry = ref.copy()
        # sprinkle mutations + a planted rc stretch
        for _ in range(int(rng.integers(1, 5))):
            p = int(rng.integers(0, n))
            qry[p] = (qry[p] + 1 + int(rng.integers(0, 3))) % 4
        a = int(rng.integers(10, n - 20))
        b = a + max(3, cfg.template_switch_min_length + 1)
        qry[a:b] = [comp[c] for c in qry[a:b]][::-1]

        res = chain_align(cfg, ref, qry, target_segment=24, engine="numpy")
        assert price_alignment(cfg, ref, qry, res.alignment) == res.cost

        K = 1
        while K < 2 * n + 2:
            K *= 2
        comp_full = DenseAligner(
            cfg.scaled_for_length_tiebreak(K), ref, qry
        ).align().cost
        cost_full = -(-comp_full // K)
        assert res.cost == cost_full, f"seed {seed}: {res.cost} != {cost_full}"
        assert res.ts_total_length == K * cost_full - comp_full, f"seed {seed}"


def test_chain_align_multi_kb_planted():
    """Multi-kb chained run (the scale case the segment design exists for):
    a 6 kb near-identical pair with planted TSM stretches and SNPs aligns
    at the constructed optimal cost, with one TSM per planted stretch, and
    the verification pass stays green.  Exact-run interiors short-circuit,
    so only the divergent islands pay for engine runs."""
    rng = np.random.default_rng(77)
    al = get_alphabet("dna")
    from tsalign_tpu.config import TemplateSwitchConfig

    cfg = TemplateSwitchConfig.parse_plain(_NARROW_CONFIG, get_alphabet("dna-n"))
    n = 3000
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    comp = get_alphabet("dna-n").complement_array()
    # 3 planted rc stretches of length 8 (reverse TSM cost = base 2) and
    # 5 SNPs (cost 2 each with the narrow config) spread far apart
    ts_sites = [500, 1500, 2500]
    for p in ts_sites:
        qry[p : p + 8] = [comp[c] for c in qry[p : p + 8]][::-1]
    snp_sites = [250 + 550 * i for i in range(5)]
    for p in snp_sites:
        qry[p] = (qry[p] + 1) % 4
    expected = 2 * len(ts_sites) + 2 * len(snp_sites)

    res = chain_align(cfg, ref, qry, target_segment=256, engine="numpy")
    assert res.cost == expected, (res.cost, expected)
    assert price_alignment(cfg, ref, qry, res.alignment) == res.cost
    n_ts = sum(
        1
        for _, t in res.alignment.entries
        if getattr(t, "__class__", None).__name__ == "TemplateSwitchEntrance"
        or t == "TemplateSwitchEntrance"
    )
    from tsalign_tpu.alignment import is_template_switch_entrance

    n_ts = sum(1 for _, t in res.alignment.entries if is_template_switch_entrance(t))
    assert n_ts == len(ts_sites), n_ts


def test_chain_align_flanked_config_matches_full_engine():
    """Chained mode with nonzero flanks: the reference's chainalign cost
    conversion cannot represent flanked configs (costs/compat.rs is a
    strict conversion); our segments run the full config, so chained
    results must equal the full engine's under the K-scaled tie-break."""
    from util import binding_window_config

    from tsalign_tpu.chain.driver import chain_align

    al = get_alphabet("dna")
    comp = al.complement_array()
    rng = np.random.default_rng(42)
    cfg = binding_window_config(rng, al, 2, 1)
    n = 300
    ref = rng.integers(0, 4, size=n).astype(np.int8)
    qry = ref.copy()
    qry[100:108] = [comp[c] for c in qry[100:108]][::-1]
    qry[30] = (qry[30] + 1) % 4
    qry[250] = (qry[250] + 1) % 4

    res = chain_align(
        cfg, ref, qry, engine="numpy", target_segment=96,
        verify=True, progress=False,
    )
    K = 1
    while K < 2 * n + 2:
        K *= 2
    comp_full = DenseAligner(
        cfg.scaled_for_length_tiebreak(K), ref, qry
    ).align().cost
    assert res.cost == -(-comp_full // K)


def test_verification_catches_three_segment_structures():
    """Adversarial chain structure spanning >= 3 segments (VERDICT r3 item
    6): a revcomp-palindromic TSM inner produces a FAKE exact-match run
    inside the template switch, so the chain DP plants two cuts in the
    middle of what must be one TSM.  The uncorrected stitch is then wrong
    across three segments (the TSM's primary footprint straddles both
    cuts, so no single segment contains it); the verification pass must
    rejoin both cuts and recover the full-engine optimum — the bounded
    counterpart of the reference's iterate-chain/evaluate convergence loop
    (chain_align.rs:157-282)."""
    import dataclasses

    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.costs import INF, CostFunction

    al5 = get_alphabet("dna-n")
    base = TemplateSwitchConfig.parse_plain(_NARROW_CONFIG, al5)

    def window(lo, hi, cost=0):
        return CostFunction([(-(2**62), INF), (lo, cost), (hi + 1, INF)])

    cfg = dataclasses.replace(
        base,
        base_cost={k: 5 for k in base.base_cost},
        rq_qr_offset_costs=window(-90, 90),
        rr_qq_offset_costs=window(-90, 90),
        length_costs=CostFunction([(0, INF), (5, 0), (90, INF)]),
        length_difference_costs=window(-4, 4),
    )
    comp = al5.complement_array()

    rng = np.random.default_rng(42)
    n = 200
    ref = rng.integers(0, 4, n).astype(np.int8)
    # revcomp-palindrome of length 48 centered at 90: the TS inner equals
    # the reference there, faking an exact run for the anchorer
    s = rng.integers(0, 4, 24).astype(np.int8)
    ref[66:114] = np.concatenate([s, comp[s][::-1]]).astype(np.int8)
    qry = ref.copy()
    qry[56:124] = comp[ref[56:124]][::-1]
    assert np.array_equal(qry[66:114], ref[66:114])  # fake exact run

    full = DenseAligner(cfg, ref, qry).align().cost
    raw = chain_align(
        cfg, ref, qry, k=6, target_segment=48, engine="numpy", verify=False
    )
    assert raw.cost > full  # the chain structure really is wrong
    fixed = chain_align(
        cfg, ref, qry, k=6, target_segment=48, engine="numpy"
    )
    assert fixed.cost == full
    assert fixed.cuts_rejoined >= 2  # both mid-TSM cuts removed
    assert price_alignment(cfg, ref, qry, fixed.alignment) == fixed.cost


def test_footprint_certificate_catches_wide_structures():
    """Adversarial structure WIDER than the fixed span ladder (VERDICT r4
    weak #5): a 60 bp revcomp-palindromic TSM inner plants THREE interior
    cuts, and with the TSM base cost above one divergent stripe's savings
    there is no partial improvement — every span-2/3 window probes clean,
    so the fixed ladder can never fire.  The per-cut footprint certificate
    (one probed window covering a full TSM-footprint radius around every
    surviving cut, chain/driver.py) must recover the optimum."""
    import dataclasses

    from tsalign_tpu.config import TemplateSwitchConfig
    from tsalign_tpu.costs import INF, CostFunction

    al5 = get_alphabet("dna-n")
    base = TemplateSwitchConfig.parse_plain(_NARROW_CONFIG, al5)

    def window(lo, hi, cost=0):
        return CostFunction([(-(2**62), INF), (lo, cost), (hi + 1, INF)])

    cfg = dataclasses.replace(
        base,
        # Base 25 > one stripe's substitution cost (20): a partial TSM
        # explaining only one stripe never pays, so no window smaller than
        # the full footprint improves anything.
        base_cost={k: 25 for k in base.base_cost},
        rq_qr_offset_costs=window(-90, 90),
        rr_qq_offset_costs=window(-90, 90),
        length_costs=CostFunction([(0, INF), (5, 0), (90, INF)]),
        length_difference_costs=window(-4, 4),
    )
    comp = al5.complement_array()

    rng = np.random.default_rng(7)
    n = 160
    ref = rng.integers(0, 4, n).astype(np.int8)
    # revcomp-palindrome of length 60 centered at 80: the TS inner equals
    # the reference on [50,110), faking one exact run that takes 3 cuts
    # (k=4 -> min_run=16, edge=12: cuts at +12, +28, +48)
    s = rng.integers(0, 4, 30).astype(np.int8)
    ref[50:110] = np.concatenate([s, comp[s][::-1]]).astype(np.int8)
    qry = ref.copy()
    qry[40:120] = comp[ref[40:120]][::-1]
    assert np.array_equal(qry[50:110], ref[50:110])  # fake exact run

    full = DenseAligner(cfg, ref, qry).align().cost
    raw = chain_align(
        cfg, ref, qry, k=4, target_segment=48, engine="numpy", verify=False
    )
    assert raw.cost > full  # the chain structure really is wrong
    limited = chain_align(
        cfg, ref, qry, k=4, target_segment=48, engine="numpy",
        verify_spans=(2, 3), certify_footprint=False,
    )
    assert limited.cost == raw.cost  # the fixed ladder finds NOTHING
    assert limited.cuts_rejoined == 0
    fixed = chain_align(cfg, ref, qry, k=4, target_segment=48, engine="numpy")
    assert fixed.cost == full
    assert fixed.cuts_rejoined >= 3  # all mid-TSM cuts removed
    assert price_alignment(cfg, ref, qry, fixed.alignment) == fixed.cost
