"""Credibility interval tests: device CI vs a direct port of the reference's
interval search, plus end-to-end sanity on Gibbs output."""

import numpy as np
import pytest

import jax.numpy as jnp

from rsem_tpu.engine.ci import CIConfig, _ci_columns, run_ci
from rsem_tpu.refprep.transcripts import GroupInfo


def _ref_calcCI(samples, confidence):
    """Direct python port of calcCI.cpp:218-284."""
    n = len(samples)
    s = np.sort(samples)
    threshold = n - (int(confidence * n - 1e-8) + 1)
    # shortest window covering >= n - threshold points
    cover = n - threshold
    widths = s[cover - 1 :] - s[: n - cover + 1]
    p = int(np.argmin(widths))
    lb, ub = s[p], s[p + cover - 1]
    q_, r = divmod(n, 4)
    if r == 0:
        Q1 = (s[q_ - 1] + s[q_]) / 2
        Q3 = (s[3 * q_ - 1] + s[3 * q_]) / 2
    elif r == 3:
        Q1 = (s[q_] + s[q_ + 1]) / 2
        Q3 = (s[3 * q_ + 1] + s[3 * q_ + 2]) / 2
    else:
        Q1 = s[q_]
        Q3 = s[3 * q_]
    cqv = (Q3 - Q1) / (Q3 + Q1) if Q3 - Q1 > 0 else 0.0
    return lb, ub, cqv


def test_ci_columns_match_reference_port():
    rng = np.random.default_rng(3)
    for n in (100, 999, 1000, 1003):
        samples = rng.gamma(5.0, 2.0, size=(n, 7)).astype(np.float32)
        cover = int(0.95 * n - 1e-8) + 1
        lb, ub, cqv = _ci_columns(jnp.asarray(samples), cover)
        for c in range(7):
            rl, ru, rc = _ref_calcCI(samples[:, c], 0.95)
            assert float(lb[c]) == pytest.approx(rl, rel=1e-6)
            assert float(ub[c]) == pytest.approx(ru, rel=1e-6)
            assert float(cqv[c]) == pytest.approx(rc, rel=1e-5)


def test_ci_coverage_normal():
    """95% interval of N(mu, sigma) samples should be ~mu +/- 2 sigma."""
    rng = np.random.default_rng(0)
    n = 4000
    samples = rng.normal(100.0, 10.0, size=(n, 1)).astype(np.float32)
    cover = int(0.95 * n - 1e-8) + 1
    lb, ub, _ = _ci_columns(jnp.asarray(samples), cover)
    assert 75 < float(lb[0]) < 85
    assert 115 < float(ub[0]) < 125


def test_run_ci_end_to_end():
    """CI from synthetic Poisson-ish count vectors behaves sensibly."""
    rng = np.random.default_rng(1)
    M = 6
    true_counts = np.array([5.0, 300.0, 100.0, 40.0, 0.0, 10.0, 60.0])
    nCV = 40
    cvs = rng.poisson(true_counts, size=(nCV, M + 1)).astype(np.float64)
    eel = np.array([0.0, 500.0, 400.0, 300.0, 200.0, 150.0, 100.0])
    mw = np.ones(M + 1)
    gi = GroupInfo([1, 3, 5, 7])  # 3 genes of 2 isoforms
    cfg = CIConfig(nspc=25, seed=4)
    res = run_ci(cvs, eel, mw, gi, cfg)

    assert (res.tpm.lb[1:] <= res.tpm.ub[1:]).all()
    assert (res.tpm.lb >= 0).all()
    # transcript with zero counts has a CI near zero
    assert res.tpm.ub[4] < res.tpm.lb[1]
    # point TPM from the true counts should mostly fall inside
    tpm_pt = true_counts[1:] / eel[1:]
    tpm_pt = tpm_pt / tpm_pt.sum() * 1e6
    inside = (tpm_pt >= res.tpm.lb[1:]) & (tpm_pt <= res.tpm.ub[1:])
    assert inside.sum() >= 5
    # gene bounds at least as wide as any single isoform's upper bound
    assert (res.gene_tpm.ub >= np.maximum(res.tpm.ub[1::2], res.tpm.ub[2::2]) * 0.5).all()
    assert (res.fpkm.ub[1:] >= res.fpkm.lb[1:]).all()
