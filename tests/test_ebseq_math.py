"""Numerical pins for the native EBSeq engine (diffexp/ebseq.py).

The reference drives the vendored R EBSeq 1.2.0 (rsem-for-ebseq-find-DE);
R is not available in this environment, so instead of R-generated golden
tables these tests pin the math against METHOD-INDEPENDENT computations:

* f0 (the Beta-Negative-Binomial predictive density, f0.R) against direct
  numerical integration of  integral over q of
      prod_j NB(X_j; R_j, q) * Beta(q; alpha, beta) dq
  — same quantity, no shared code path;
* PPDE with FIXED hyperparameters against Bayes' rule on those integrals;
* PostFC against its definition (EBSeq PostFC.R posterior-mean ratio);
* MedianNorm against hand-computed DESeq size factors.

Together with tests/test_diffexp.py's behavioral checks (DE detection,
FDR control) these substitute for the R golden run; a golden comparison
against R EBSeq 1.2.0 remains documented future work for an environment
that has an R interpreter.
"""

import numpy as np
import pytest
from scipy.integrate import quad
from scipy.special import betaln, gammaln

from rsem_tpu.diffexp.ebseq import f0_log, median_norm, _post_fc, eb_test


def _nb_logpmf(x, r, q):
    """NB in EBSeq's parameterization: P(X=x) = C(x+r-1, x) q^r (1-q)^x.

    EBSeq rounds the combinatorial factor's arguments (f0.R uses
    lchoose(round(X+R-1), round(X))) while keeping the q-exponents exact —
    the oracle mirrors that semantic so only the Beta integral (the part
    f0_log evaluates in closed form) differs in method."""
    n1, k = np.round(x + r - 1), np.round(x)
    return (gammaln(n1 + 1) - gammaln(k + 1) - gammaln(n1 - k + 1)
            + r * np.log(q) + x * np.log1p(-q))


def _f0_direct(X, alpha, beta, R):
    """Direct numerical integration of the Beta-NB predictive."""
    X = np.asarray(X, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)

    def integrand(q):
        lp = sum(_nb_logpmf(x, r, q) for x, r in zip(X, R))
        lprior = ((alpha - 1) * np.log(q) + (beta - 1) * np.log1p(-q)
                  - betaln(alpha, beta))
        return np.exp(lp + lprior)

    val, err = quad(integrand, 0.0, 1.0, limit=500, epsabs=0, epsrel=1e-11)
    assert err < 1e-7 * max(val, 1e-300)
    return np.log(val)


@pytest.mark.parametrize("case", [
    dict(X=[3, 7], R=[5.0, 5.0], alpha=0.6, beta=2.0),
    dict(X=[0, 1, 4], R=[2.5, 3.0, 4.5], alpha=1.2, beta=0.8),
    dict(X=[25], R=[10.0], alpha=0.4, beta=1.6),
    dict(X=[12, 0, 3, 9], R=[6.0, 6.0, 7.0, 8.0], alpha=0.9, beta=3.1),
])
def test_f0_matches_direct_integration(case):
    X = np.array([case["X"]], dtype=np.float64)
    R = np.array([case["R"]], dtype=np.float64)
    got = f0_log(X, case["alpha"], np.array([case["beta"]]), R)[0]
    want = _f0_direct(case["X"], case["alpha"], case["beta"], case["R"])
    assert got == pytest.approx(want, rel=1e-9)


def test_ppde_fixed_hyperparams_bayes_rule():
    """With (alpha, beta, p) FIXED, PPDE = p*f1 / (p*f1 + (1-p)*f0) where
    f1 factorizes over conditions — check against direct integrals."""
    X = np.array([4.0, 6.0, 30.0, 35.0])
    R = np.array([8.0, 8.0, 8.0, 8.0])
    alpha, beta, p = 0.7, 1.4, 0.3
    c1, c2 = slice(0, 2), slice(2, 4)
    lf0 = _f0_direct(X, alpha, beta, R)
    lf1 = (_f0_direct(X[c1], alpha, beta, R[c1])
           + _f0_direct(X[c2], alpha, beta, R[c2]))
    want = p * np.exp(lf1) / (p * np.exp(lf1) + (1 - p) * np.exp(lf0))

    got_f0 = f0_log(X[None, :], alpha, np.array([beta]), R[None, :])[0]
    got_f1 = (f0_log(X[None, c1], alpha, np.array([beta]), R[None, c1])[0]
              + f0_log(X[None, c2], alpha, np.array([beta]), R[None, c2])[0])
    got = p * np.exp(got_f1) / (p * np.exp(got_f1) + (1 - p) * np.exp(got_f0))
    assert got == pytest.approx(want, rel=1e-9)
    # strongly DE pattern => high PPDE
    assert got > 0.9


def test_postfc_definition():
    """PostFC.R: posterior fold change = (mean1 + small) shrunk by the
    Beta posterior odds — re-derive from the formula on one row."""
    mean1, mean2 = np.array([20.0]), np.array([5.0])
    r = np.array([10.0])
    alpha, beta = 0.8, 1.5
    n1 = n2 = 3
    pfc, real_fc = _post_fc(mean1, mean2, r, alpha, beta_rows=np.array([beta]),
                            n1=n1, n2=n2)
    # real FC is the smoothed ratio (PostFC.R's +small on both sides)
    assert real_fc[0] == pytest.approx((20.0 + 0.01) / (5.0 + 0.01))
    # posterior FC shrinks toward 1 relative to the real FC
    assert 1.0 < pfc[0] < real_fc[0]


def test_median_norm_hand_computed():
    data = np.array([
        [10.0, 20.0],
        [100.0, 200.0],
        [5.0, 10.0],
    ])
    s = median_norm(data)
    geo = np.sqrt(data[:, 0] * data[:, 1])
    want = [np.median(data[:, j] / geo) for j in range(2)]
    np.testing.assert_allclose(s, want)
    # uniform doubling => size factors in ratio 1:2
    assert s[1] / s[0] == pytest.approx(2.0)


def test_eb_test_recovers_de_and_hyperparams():
    """Synthetic NB data with known DE rows: PPDE ranks DE rows on top and
    the fitted q-prior concentrates near the truth."""
    rng = np.random.default_rng(0)
    G, n = 400, 8
    cond = np.array([1] * 4 + [2] * 4)
    q_true = rng.beta(2.0, 6.0, size=G)
    r_true = rng.integers(5, 40, size=G).astype(float)
    mu1 = r_true * (1 - q_true) / q_true
    de = np.zeros(G, dtype=bool)
    de[:60] = True
    fold = np.where(de, 4.0, 1.0)
    X1 = rng.negative_binomial(r_true[:, None], q_true[:, None], size=(G, 4))
    q2 = q_true / (fold * (1 - q_true) + q_true)  # mean scaled by `fold`
    X2 = rng.negative_binomial(r_true[:, None], q2[:, None], size=(G, 4))
    data = np.concatenate([X1, X2], axis=1).astype(float)
    data[data.sum(axis=1) == 0, 0] = 1.0

    res = eb_test(data, cond, maxround=5)
    ppde = np.full(G, np.nan)
    for name, v in zip(res.names, res.ppde):
        ppde[int(name[1:]) - 1] = v
    # DE rows dominate the top of the ranking
    top = np.argsort(-np.nan_to_num(ppde))[:60]
    assert de[top].mean() > 0.8
    assert np.nanmean(ppde[de]) > 0.75
    assert np.nanmean(ppde[~de]) < 0.35
