"""Fused on-device model-round loop (ops/model_loop.py) vs the per-round
host-refit loop (engine/em.py's else branch).

Round semantics being pinned: EM.cpp:307-310 (10 update rounds),
SingleModel.h:163-209 / PairedEndQModel.h:161-178 (suffstat update),
EM.cpp:400-404 (collect/finish cycle).
"""

import copy
import os

import numpy as np
import pytest

from rsem_tpu.engine.em import EMConfig, run_em
from rsem_tpu.testing import synthetic_arrays_fast, synthetic_dataset


def _run(model0, ref, bundle, fused: bool, update_rounds: int = 10):
    # call the single-device path directly: the 8-virtual-device conftest
    # mesh would otherwise route run_em to the sharded path, which has its
    # own per-round structure
    from rsem_tpu.engine.em import _run_em_device

    os.environ["RSEM_TPU_FUSED_MODEL"] = "1" if fused else "0"
    try:
        cfg = EMConfig(backend="device",
                       update_model_rounds=update_rounds)
        return _run_em_device(copy.deepcopy(model0), ref, bundle, cfg,
                              need_posteriors=False)
    finally:
        os.environ.pop("RSEM_TPU_FUSED_MODEL", None)


@pytest.mark.parametrize("paired", [False, True])
def test_fused_one_round_matches_host(paired):
    """With a single update round both paths compute the round-1 suffstats
    from IDENTICAL initial tables, and the float64 host refit runs on both
    — results must agree to float32 scatter-order noise."""
    ref, bundle, spec, model0 = synthetic_dataset(
        n_reads=1500, M=60, read_len=36, tx_len=400, paired=paired,
        has_qual=True, mean_extra_hits=1.2, seed=7,
    )
    a = _run(model0, ref, bundle, fused=True, update_rounds=1)
    b = _run(model0, ref, bundle, fused=False, update_rounds=1)
    assert a.rounds == b.rounds
    np.testing.assert_allclose(a.theta, b.theta, rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(a.tpm, b.tpm, rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(a.counts, b.counts, rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("paired,has_qual", [(False, True), (False, False),
                                             (True, True)])
def test_fused_ten_rounds_close(paired, has_qual):
    """Full 10-round parity: the fused loop finishes intermediate tables in
    f32 on device (host refit is f64), so tolerances are looser but the
    EM trajectory must land on the same fixed point."""
    ref, bundle, spec, model0 = synthetic_dataset(
        n_reads=2000, M=80, read_len=36, tx_len=400, paired=paired,
        has_qual=has_qual, mean_extra_hits=1.5, seed=11,
    )
    a = _run(model0, ref, bundle, fused=True)
    b = _run(model0, ref, bundle, fused=False)
    np.testing.assert_allclose(a.tpm, b.tpm, rtol=5e-3, atol=0.5)
    np.testing.assert_allclose(
        a.counts / bundle.cnt.N1, b.counts / bundle.cnt.N1,
        rtol=5e-3, atol=1e-4,
    )
    # the refit model tables agree (round-10 suffstats in f32 vs f64 path)
    np.testing.assert_allclose(a.model.pro.p, b.model.pro.p,
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(a.model.npro.p, b.model.npro.p,
                               rtol=5e-3, atol=1e-5)
    if paired:
        np.testing.assert_allclose(a.model.gld.pdf, b.model.gld.pdf,
                                   rtol=5e-3, atol=1e-6)


def test_fused_gate():
    """r5: est-RSPD is fused (frozen evalCDF indices + 2-bin suffstat)
    EXCEPT the combinations whose mw/update cannot be frozen: poly(A)
    (mw depends on rspd), single-end user-mld (remarginalized update,
    SingleModel.h:178-199), and transcripts shorter than B bins."""
    from rsem_tpu.ops.layout import KernelConfig
    from rsem_tpu.ops.model_loop import fused_supported

    cfg = KernelConfig(
        paired=False, has_qual=True, est_rspd=True, use_mld=False, B=20,
        seed_len=25, gld_lb=0, gld_ub=1000, mld_lb=0, mld_ub=1,
        max_read_len=36, pro_len=100,
    )
    assert fused_supported(cfg, has_polya=False)
    assert fused_supported(cfg, has_polya=False, min_full_len=400)
    assert not fused_supported(cfg, has_polya=True)
    assert not fused_supported(cfg, has_polya=False, min_full_len=10)
    assert not fused_supported(cfg._replace(use_mld=True), has_polya=False)
    assert fused_supported(cfg._replace(use_mld=True, paired=True),
                           has_polya=False)
    assert not fused_supported(cfg._replace(est_rspd=False, paired=True),
                               has_polya=True)
    assert fused_supported(cfg._replace(est_rspd=False), has_polya=True)


@pytest.mark.parametrize("paired", [False, True])
def test_fused_est_rspd_matches_host(paired):
    """est-RSPD in the fused loop (r5): one-round exact parity plus
    10-round trajectory parity against the per-round host-refit path."""
    ref, bundle, spec, model0 = synthetic_dataset(
        n_reads=1500, M=60, read_len=36, tx_len=400, paired=paired,
        has_qual=True, mean_extra_hits=1.4, seed=23, est_rspd=True,
    )
    a1 = _run(model0, ref, bundle, fused=True, update_rounds=1)
    b1 = _run(model0, ref, bundle, fused=False, update_rounds=1)
    np.testing.assert_allclose(a1.theta, b1.theta, rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(a1.model.rspd.pdf, b1.model.rspd.pdf,
                               rtol=2e-4, atol=1e-7)
    a = _run(model0, ref, bundle, fused=True)
    b = _run(model0, ref, bundle, fused=False)
    np.testing.assert_allclose(a.tpm, b.tpm, rtol=5e-3, atol=0.5)
    np.testing.assert_allclose(a.model.rspd.pdf, b.model.rspd.pdf,
                               rtol=5e-3, atol=1e-5)


def test_preidx_long_reads():
    """Reads longer than 128bp use a 256-wide PreIdx (the r3 advisor's
    regression: the old layout asserted at 150bp)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from rsem_tpu.ops import (
        HitsDevice, KernelConfig, ReadsDevice, RefDevice,
        compute_log_conprb,
    )
    from rsem_tpu.ops.conprb import pre_cols, precompute_profile_indices

    assert pre_cols(100) == 128
    assert pre_cols(150) == 256
    assert pre_cols(260) == 384

    ref, bundle, spec, model0 = synthetic_arrays_fast(
        n_reads=500, M=40, read_len=150, tx_len=600, paired=False,
        has_qual=True, mean_extra_hits=1.0, seed=3,
    )
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model0, m1.codes.shape[1])
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model0.device_arrays().items()}
    pre = jax.jit(partial(precompute_profile_indices, kcfg))(refd, m1, None,
                                                             hd)
    assert pre.flat1.shape[1] == 256
    lcp_pre = np.asarray(
        jax.jit(partial(compute_log_conprb, kcfg))(refd, m1, None, hd, dm,
                                                   pre)
    )
    lcp_direct = np.asarray(
        jax.jit(partial(compute_log_conprb, kcfg))(refd, m1, None, hd, dm)
    )
    np.testing.assert_allclose(lcp_pre, lcp_direct, rtol=1e-5, atol=1e-5)
