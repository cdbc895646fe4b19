"""Unit tests for distribution primitives vs closed forms / brute force."""

import numpy as np
import pytest

from rsem_tpu.constants import EPSILON, MINEEL
from rsem_tpu.model import LenDist, Profile, QProfile, RSPD
from rsem_tpu.model.generative import GenerativeModel
from rsem_tpu.model.spec import ModelSpec


def test_lendist_uniform_init():
    ld = LenDist(1, 10)
    assert ld.get_prob(5) == pytest.approx(0.1)
    assert ld.get_adjusted_prob(5, 100) == pytest.approx(0.1)
    # truncation: refL = 5 -> denominator = cdf(5) = 0.5
    assert ld.get_adjusted_prob(3, 5) == pytest.approx(0.1 / 0.5)
    # reference does NOT zero len > refL (callers guarantee len <= refL)
    assert ld.get_adjusted_prob(6, 5) == pytest.approx(0.1 / 0.5)
    assert ld.get_adjusted_prob(0, 100) == 0.0
    assert ld.get_adjusted_prob(11, 100) == 0.0


def test_lendist_estimate_and_trim():
    ld = LenDist(1, 1000)
    ld.init()
    ld.update(np.array([50, 50, 60]), np.array([2.0, 1.0, 1.0]))
    ld.finish()
    assert ld.get_prob(50) == pytest.approx(0.75)
    assert ld.get_prob(60) == pytest.approx(0.25)
    # trim shrinks the window to observed support
    assert ld.minL == 50 and ld.maxL == 60
    # device export over original window keeps values at the same lengths
    pdf, cdf = ld.device_arrays(0, 1000)
    assert pdf[50] == pytest.approx(0.75)
    assert pdf[60] == pytest.approx(0.25)
    assert cdf[1000] == pytest.approx(1.0)


def test_lendist_normal():
    ld = LenDist(1, 1000)
    ld.set_as_normal(200.0, 20.0, 1, 1000)
    # RANGE-clipped window centered near the mean
    assert ld.maxL - ld.minL + 1 <= 201
    assert ld.cdf[-1] == pytest.approx(1.0)
    lengths = np.arange(ld.minL, ld.maxL + 1)
    mean = (ld.pdf[1:] * lengths).sum()
    assert mean == pytest.approx(200.0, abs=0.5)

    # zero-sd: point mass
    ld2 = LenDist(1, 1000)
    ld2.set_as_normal(150.0, 0.0, 1, 1000)
    assert ld2.get_prob(150) == 1.0 and ld2.span == 1


def test_rspd_interpolation_matches_brute():
    rspd = RSPD(True, B=5)
    rspd.set_pdf(np.array([1.0, 2.0, 3.0, 2.0, 2.0]))
    full_len = 37
    # evalCDF must interpolate linearly within a bin
    for fpos in [0, 1, 7, 18, 36, 37]:
        i = fpos * 5 // full_len
        val = fpos / full_len * 5
        expected = rspd.cdf[i] + (val - i) * rspd.pdf[i + 1]
        assert rspd.eval_cdf(fpos, full_len) == pytest.approx(expected)
    # probabilities over all positions sum to cdf(fullLen)=1
    probs = [
        rspd.get_adjusted_prob(p, full_len, full_len) for p in range(full_len)
    ]
    assert sum(probs) == pytest.approx(1.0)
    # vectorized path agrees with scalar path
    fpos = np.arange(full_len)
    vec = rspd.adjusted_prob_vec(fpos, np.full(full_len, 20), np.full(full_len, full_len))
    sca = [rspd.get_adjusted_prob(p, 20, full_len) for p in range(full_len)]
    np.testing.assert_allclose(vec, sca)


def test_profile_init_rows_normalized():
    p = Profile(100).p
    np.testing.assert_allclose(p.sum(axis=2), 1.0)
    q = QProfile().p
    np.testing.assert_allclose(q.sum(axis=2), 1.0)
    # q=30 -> error prob 1e-3
    assert q[30, 0, 0] == pytest.approx((1 - 1e-3) * (1 - 1e-5))


def _eel_brute(gld: LenDist, full_len: int, tot_len: int) -> float:
    """Direct sum: eel = sum_l pdf(l) * effL(l), effL = min(fullLen,
    totLen-l+1), truncated at totLen."""
    s = 0.0
    for l in range(gld.minL, gld.maxL + 1):
        if l > tot_len:
            continue
        s += gld.get_prob(l) * min(full_len, tot_len - l + 1)
    return s if s >= MINEEL else 0.0


def test_eel_closed_form_vs_brute():
    from rsem_tpu.refprep.reference import PolyARules, Reference

    names = ["t1", "t2", "t3"]
    seqs = ["ACGT" * 60, "ACGT" * 25, "ACG"]
    ref = Reference(names, seqs, [125, 125, 125])
    spec = ModelSpec(model_type=3, minL=1, maxL=1000)
    model = GenerativeModel(spec, ref)
    gld = LenDist(1, 1000)
    gld.init()
    gld.update(np.array([180, 200, 220]), np.array([1.0, 2.0, 1.0]))
    gld.finish()
    model.gld = gld
    eel = model.calc_eel()
    for i in range(1, 4):
        brute = _eel_brute(gld, int(ref.full_len[i]), int(ref.tot_len[i]))
        assert eel[i] == pytest.approx(brute, rel=1e-12), f"transcript {i}"


def test_calc_mw_vs_brute_paired():
    """Masking weight via the vectorized path == direct python loops."""
    from rsem_tpu.refprep.reference import Reference

    ref = Reference(["t1", "t2"], ["ACGT" * 30, "AGCTTGCA" * 10], [125, 0])
    spec = ModelSpec(model_type=3, minL=1, maxL=300, seed_len=25, has_polya=True)
    model = GenerativeModel(spec, ref)
    gld = LenDist(1, 300)
    gld.init()
    gld.update(np.array([150, 180]), np.array([1.0, 1.0]))
    gld.finish()
    model.gld = gld
    model.calc_mw()

    # brute force (PairedEndQModel.h:445-479)
    for i in (1, 2):
        fl, tl = int(ref.full_len[i]), int(ref.tot_len[i])
        ms = int(ref.mask_start[i])
        end = min(fl, tl - gld.minL + 1)
        value = 0.0
        for seed_pos in range(end):
            if not (ms <= seed_pos < fl):
                continue
            for frag in range(gld.minL, min(gld.maxL, tl - seed_pos) + 1):
                effL = min(fl, tl - frag + 1)
                value += gld.get_adjusted_prob(frag, tl) * model.rspd.get_adjusted_prob(
                    seed_pos, effL, fl
                )
        expected = 1.0 - value
        if expected < 1e-8:
            expected = 0.0
        assert model.mw[i] == pytest.approx(expected, rel=1e-10), f"t{i}"
    # unmasked transcript keeps mw == 1
    assert model.mw[2] == 1.0


def test_calc_mw_vs_brute_single():
    from rsem_tpu.refprep.reference import Reference

    ref = Reference(["t1"], ["ACGTAACC" * 20], [60])
    spec = ModelSpec(
        model_type=0, minL=1, maxL=1000, seed_len=25, has_polya=True, probF=0.5
    )
    model = GenerativeModel(spec, ref)
    gld = LenDist(1, 1000)
    gld.init()
    gld.update(np.array([36, 50]), np.array([3.0, 1.0]))
    gld.finish()
    model.gld = gld
    model.freeze_windows()
    model.calc_mw()

    fl, tl = int(ref.full_len[1]), int(ref.tot_len[1])
    ms = int(ref.mask_start[1])
    seed_len = 25
    probF = probR = 0.5
    gmin, gmax = gld.minL, gld.maxL
    value = 0.0
    end = min(fl, tl - seed_len + 1)
    for sp in range(end):
        if not (ms <= sp < fl):
            continue
        for frag in range(gmin, min(gmax, tl - sp) + 1):
            effL = min(fl, tl - frag + 1)
            value += probF * gld.get_adjusted_prob(frag, tl) * model.rspd.get_adjusted_prob(sp, effL, fl)
        for frag in range(gmin, min(gmax, sp + seed_len) + 1):
            pf = sp - (frag - seed_len)
            effL = min(fl, tl - frag + 1)
            value += probR * gld.get_adjusted_prob(frag, tl) * model.rspd.get_adjusted_prob(pf, effL, fl)
    for sp in range(end, tl - seed_len + 1):
        for frag in range(max(gmin, sp + seed_len - fl + 1), min(gmax, sp + seed_len) + 1):
            pf = sp - (frag - seed_len)
            effL = min(fl, tl - frag + 1)
            value += probR * gld.get_adjusted_prob(frag, tl) * model.rspd.get_adjusted_prob(pf, effL, fl)
    expected = 1.0 - value
    if expected < 1e-8:
        expected = 0.0
    assert model.mw[1] == pytest.approx(expected, rel=1e-9)


def test_calc_lq():
    from rsem_tpu.io.reads import calc_low_quality
    from rsem_tpu.utils.seq import encode

    polya_read = "A" * 50
    normal = "ACGT" * 13
    tail_t = "T" * 50
    reads = [polya_read, normal, tail_t, "ACG"]
    L = max(len(r) for r in reads)
    codes = np.zeros((len(reads), L), dtype=np.uint8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode(r)
        lens[i] = len(r)
    lq = calc_low_quality(codes, lens, has_polya=True, seed_len=25)
    assert list(lq) == [True, False, True, True]  # last: shorter than seed
    lq2 = calc_low_quality(codes, lens, has_polya=False, seed_len=25)
    assert list(lq2) == [False, False, False, True]


def test_model_file_roundtrip(tmp_path):
    spec = ModelSpec(model_type=3, minL=1, maxL=500)
    model = GenerativeModel(spec, None)
    gld = LenDist(1, 500)
    gld.init()
    gld.update(np.array([200, 210]), np.array([1.0, 3.0]))
    gld.finish()
    model.gld = gld
    mld = LenDist(1, 500)
    mld.init()
    mld.update(np.array([75, 76]), np.array([1.0, 1.0]))
    mld.finish()
    model.mld = mld
    model.qd.update_counts(np.ones(100), np.ones((100, 100)))
    model.qd.finish()
    model.npro.calc_init_params()
    model.mw = np.array([1.0, 0.5, 1.0])

    path = str(tmp_path / "m.model")
    model.write(path)
    m2 = GenerativeModel.read(path)
    assert m2.spec.model_type == 3
    np.testing.assert_allclose(m2.gld.pdf, model.gld.pdf, rtol=1e-9)
    np.testing.assert_allclose(m2.mld.pdf, model.mld.pdf, rtol=1e-9)
    np.testing.assert_allclose(m2.mw, model.mw)
    np.testing.assert_allclose(m2.pro.p, model.pro.p, rtol=1e-9)
