"""Fused Pallas Gibbs sweep: parity with the XLA blocked sweep.

Runs in interpret mode on the CPU mesh (the counter-hash RNG makes the
compiled-TPU and interpreted chains bit-identical, so these tests replay
exactly what the chip executes). Reference semantics: Gibbs.cpp:265-353.
"""

import numpy as np
import pytest

from rsem_tpu.engine.gibbs import GibbsConfig, run_gibbs
from rsem_tpu.refprep.transcripts import GroupInfo


def _synthetic(N=400, M=50, seed=0, max_hits=6):
    """HitArrays + conprbs with a known uneven theta."""
    from rsem_tpu.io.hits import HitArrays

    rng = np.random.default_rng(seed)
    theta = rng.dirichlet(np.full(M, 0.4))
    nh = rng.integers(1, max_hits + 1, size=N)
    offs = np.concatenate([[0], np.cumsum(nh)])
    H = int(offs[-1])
    sid = np.empty(H, dtype=np.int32)
    lcp = np.empty(H)
    for i in range(N):
        true = rng.choice(M, p=theta) + 1
        cands = np.unique(
            np.concatenate([[true], rng.integers(1, M + 1, nh[i] - 1)])
        )
        cands = cands[: nh[i]]
        k = len(cands)
        sid[offs[i] : offs[i] + k] = cands
        lcp[offs[i] : offs[i] + k] = rng.normal(-20, 2, k)
        # fill the rest (duplicates allowed, matching real parsers)
        for j in range(k, nh[i]):
            sid[offs[i] + j] = cands[j % k]
            lcp[offs[i] + j] = rng.normal(-21, 2)
    lnp = rng.normal(-40, 3, N)  # weak noise slot
    rid = np.repeat(np.arange(N, dtype=np.int32), nh)
    hits = HitArrays(
        rid=rid,
        sid=sid,
        dir=np.zeros(H, dtype=np.int8),
        pos=np.zeros(H, dtype=np.int32),
        insert_len=None,
        read_offsets=offs.astype(np.int64),
    )
    return hits, lcp, lnp


def _gi(M):
    return GroupInfo(np.arange(1, M + 2))


def test_pallas_layout_roundtrip():
    from rsem_tpu.ops.pallas_gibbs import build_pallas_gibbs_data

    hits, lcp, lnp = _synthetic(N=300, M=40, seed=1)
    data = build_pallas_gibbs_data(hits, lcp, lnp, 40)
    # every kept hit appears exactly once across the parts
    got = []
    for p in data.parts:
        cps = np.asarray(p.cps_t)
        sids = np.asarray(p.sid_t)
        got.append(sids[cps > 0])
        # window invariants: all real sids inside the declared row windows
        n_tiles = sids.shape[0] // 256
        for t in range(n_tiles):
            tile_sid = sids[t * 256 : (t + 1) * 256]
            tile_cps = cps[t * 256 : (t + 1) * 256]
            if (tile_cps > 0).any():
                hi = tile_sid[tile_cps > 0] >> 7
                lo_w = int(np.asarray(p.win_lo)[t])
                cnt_w = int(np.asarray(p.win_cnt)[t])
                assert hi.min() >= lo_w and hi.max() < lo_w + cnt_w
    got = np.sort(np.concatenate(got))
    keep = np.isfinite(lcp)
    assert got.shape[0] == keep.sum()
    np.testing.assert_array_equal(got, np.sort(hits.sid[keep]))


def test_pallas_gibbs_counts_conserved_and_deterministic():
    hits, lcp, lnp = _synthetic(N=400, M=50, seed=2)
    M, N = 50, 400
    eel = np.full(M + 1, 80.0)
    mw = np.ones(M + 1)
    cfg = GibbsConfig(burnin=10, nsamples=40, n_chains=4, seed=7,
                      kernel="pallas")
    g1 = run_gibbs(hits, lcp, lnp, M, 25, eel, mw, _gi(M), cfg)
    # count conservation on every retained sample
    np.testing.assert_allclose(g1.countvectors.sum(axis=1), 25 + N)
    assert (g1.countvectors[:, 1:] >= 0).all()
    assert g1.pme_tpm.sum() == pytest.approx(1e6, rel=1e-3)
    g2 = run_gibbs(hits, lcp, lnp, M, 25, eel, mw, _gi(M), cfg)
    np.testing.assert_array_equal(g1.pme_c, g2.pme_c)
    np.testing.assert_array_equal(g1.countvectors, g2.countvectors)


def test_pallas_vs_xla_statistical_parity():
    """Both samplers target the same collapsed posterior: PMEs must agree
    within combined Monte-Carlo error."""
    hits, lcp, lnp = _synthetic(N=500, M=30, seed=3, max_hits=4)
    M = 30
    eel = np.full(M + 1, 80.0)
    mw = np.ones(M + 1)
    nsamples = 600
    common = dict(burnin=60, nsamples=nsamples, n_chains=4,
                  keep_countvectors=True)
    gp = run_gibbs(hits, lcp, lnp, M, 10, eel, mw, _gi(M),
                   GibbsConfig(seed=5, kernel="pallas", **common))
    gx = run_gibbs(hits, lcp, lnp, M, 10, eel, mw, _gi(M),
                   GibbsConfig(seed=6, kernel="xla", **common))
    tau = 16.0
    se = np.sqrt((gp.pve_c + gx.pve_c) * tau / nsamples)
    diff = np.abs(gp.pme_c - gx.pme_c)
    assert (diff <= 5.0 * se + 0.75).all(), (diff, se)


def test_pallas_gibbs_omit_and_prior():
    hits, lcp, lnp = _synthetic(N=300, M=40, seed=4)
    M = 40
    eel = np.full(M + 2, 80.0)
    mw = np.ones(M + 2)
    cfg = GibbsConfig(burnin=10, nsamples=40, n_chains=4, seed=5,
                      keep_countvectors=False, kernel="pallas")
    # omitted sid (hit-less extension) stays at -1 forever
    g = run_gibbs(hits, lcp, lnp, M + 1, 10, eel, mw, _gi(M + 1), cfg,
                  omit=np.array([M + 1]))
    assert g.pme_c[M + 1] == -1.0
    # a strong prior pulls shared reads toward the favored isoform
    shared_sid = int(hits.sid[0])
    prior = np.ones(M + 1)
    prior[0] = 0.0
    prior[shared_sid] = 100.0
    base = run_gibbs(hits, lcp, lnp, M, 10, eel[: M + 1], mw[: M + 1],
                     _gi(M), cfg)
    gp = run_gibbs(hits, lcp, lnp, M, 10, eel[: M + 1], mw[: M + 1],
                   _gi(M), cfg, prior=prior)
    assert gp.pme_c[shared_sid] >= base.pme_c[shared_sid]


def test_pallas_gibbs_wide_reads():
    """Reads wider than 128 slots exercise the cross-row group ops."""
    hits, lcp, lnp = _synthetic(N=80, M=300, seed=8, max_hits=180)
    M = 300
    eel = np.full(M + 1, 80.0)
    mw = np.ones(M + 1)
    cfg = GibbsConfig(burnin=5, nsamples=20, n_chains=4, seed=9,
                      kernel="pallas")
    g = run_gibbs(hits, lcp, lnp, M, 5, eel, mw, _gi(M), cfg)
    np.testing.assert_allclose(g.countvectors.sum(axis=1), 5 + 80)
    assert (g.countvectors[:, 1:] >= 0).all()
