"""Fused Pallas theta-round kernel vs the XLA reference implementation
(ops/fast_estep.py) — run in interpret mode on the CPU test mesh.

The kernel must reproduce fast_theta_round's (new_theta, counts) and the
final posterior fracs to float32 rounding on ragged synthetic data covering
every bucket width, noise reads and padding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rsem_tpu.io.hits import HitArrays
from rsem_tpu.ops.fast_estep import (
    build_fast_data,
    fast_final_fracs,
    fast_theta_round,
    run_fast_em_loop,
)
from rsem_tpu.ops.pallas_round import (
    build_pallas_data,
    pallas_final_fracs,
    pallas_theta_round,
    run_pallas_em_loop,
)


def _synthetic(N=700, M=300, max_hits=200, seed=0):
    rng = np.random.default_rng(seed)
    # skewed hits-per-read covering buckets K=1..256
    nh = np.minimum(
        rng.geometric(0.25, size=N) + (rng.random(N) < 0.02) * rng.integers(
            100, max_hits, size=N
        ),
        max_hits,
    ).astype(np.int64)
    H = int(nh.sum())
    offsets = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(nh, out=offsets[1:])
    sid = rng.integers(1, M + 1, size=H).astype(np.int32)
    rid = np.repeat(np.arange(N, dtype=np.int32), nh)
    hits = HitArrays(
        rid=rid,
        sid=sid,
        dir=np.zeros(H, dtype=np.int8),
        pos=np.zeros(H, dtype=np.int32),
        insert_len=None,
        read_offsets=offsets,
    )
    log_conprb = np.log(rng.random(H) * 0.9 + 0.1) - 20.0
    log_ncp = np.log(rng.random(N) * 0.5 + 0.01) - 25.0
    # a few reads with -inf noise conprb
    log_ncp[:: 97] = -np.inf
    return hits, log_conprb, log_ncp


@pytest.mark.parametrize("seed", [0, 3])
def test_round_matches_fast_estep(seed):
    hits, lcp, lnp = _synthetic(seed=seed)
    M = 300
    n0 = 17.0
    fdata = build_fast_data(hits, lcp, lnp, M, n0)
    pdata = build_pallas_data(hits, lcp, lnp, M, n0)
    theta = jnp.asarray(
        np.random.default_rng(seed + 1).dirichlet(np.ones(M + 1)),
        dtype=jnp.float32,
    )
    t_ref, c_ref = fast_theta_round(theta, fdata)
    t_new, c_new = pallas_theta_round(theta, pdata, interpret=True)
    np.testing.assert_allclose(
        np.asarray(c_new), np.asarray(c_ref), rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(t_new), np.asarray(t_ref), rtol=1e-4, atol=1e-9
    )


def test_loop_matches_fast_estep():
    hits, lcp, lnp = _synthetic(N=400, M=150, seed=5)
    M = 150
    fdata = build_fast_data(hits, lcp, lnp, M, 3.0)
    pdata = build_pallas_data(hits, lcp, lnp, M, 3.0)
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    t_ref, c_ref, r_ref, _ = run_fast_em_loop(theta0, fdata, max_round=40)
    t_new, c_new, r_new = run_pallas_em_loop(
        theta0, pdata, max_round=40, interpret=True
    )
    assert int(r_new) == int(r_ref)
    np.testing.assert_allclose(
        np.asarray(t_new), np.asarray(t_ref), rtol=5e-4, atol=1e-8
    )


def test_final_fracs_match():
    hits, lcp, lnp = _synthetic(N=300, M=120, seed=9)
    M = 120
    fdata = build_fast_data(hits, lcp, lnp, M, 0.0)
    pdata = build_pallas_data(hits, lcp, lnp, M, 0.0)
    theta = jnp.asarray(
        np.random.default_rng(2).dirichlet(np.ones(M + 1)), dtype=jnp.float32
    )
    f_ref, fn_ref = fast_final_fracs(theta, fdata)
    f_new, fn_new = pallas_final_fracs(theta, pdata)
    H = hits.n_hits
    np.testing.assert_allclose(
        np.asarray(f_new)[:H],
        np.asarray(f_ref)[:H],
        rtol=2e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(fn_new), np.asarray(fn_ref), rtol=2e-5, atol=1e-7
    )


def test_loop_jitted_like_engine():
    """Regression: the engine jits run_pallas_em_loop with pdata as an
    ARGUMENT, relying on PallasRoundData's custom pytree to keep its int
    metadata (table_rows, M, ks) concrete (aux_data). Without the pytree
    registration those ints trace to i32 tracers and shape computation
    breaks — this test mirrors the engine's dispatch so that regression
    is caught on CPU."""
    from functools import partial

    import jax

    hits, lcp, lnp = _synthetic(N=200, M=90, seed=11)
    M = 90
    pdata = build_pallas_data(hits, lcp, lnp, M, 1.0)
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    loop_fn = jax.jit(
        partial(run_pallas_em_loop, max_round=30, interpret=True)
    )
    t_new, c_new, r_new = loop_fn(
        theta0, pdata, start_round=jnp.asarray(0, dtype=jnp.int32)
    )
    fdata = build_fast_data(hits, lcp, lnp, M, 1.0)
    t_ref, c_ref, r_ref, _tot = run_fast_em_loop(theta0, fdata, max_round=30)
    assert int(r_new) == int(r_ref)
    np.testing.assert_allclose(
        np.asarray(t_new), np.asarray(t_ref), rtol=5e-4, atol=1e-8
    )


def test_device_build_matches_host_build():
    """build_pallas_data_device (geometry on host, conprb fill on device)
    must reproduce the host build's tiles up to the per-read scale —
    pinned via one theta round + the count vector."""
    from rsem_tpu.ops.pallas_round import (
        build_pallas_data_device,
        pallas_theta_round,
    )

    hits, lcp, lnp = _synthetic(N=250, M=70, seed=13)
    M = 70
    pdata_h = build_pallas_data(hits, lcp, lnp, M, 3.0)
    H = hits.n_hits
    pdata_d = build_pallas_data_device(
        hits, jnp.asarray(lcp, jnp.float32), jnp.asarray(lnp, jnp.float32),
        jnp.asarray(hits.sid, jnp.int32), M, 3.0,
    )
    # identical geometry
    assert pdata_d.ks == pdata_h.ks
    for a, b in zip(pdata_d.sid_t, pdata_h.sid_t):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(pdata_d.restore_bidx),
                                  np.asarray(pdata_h.restore_bidx))
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    th_h, c_h = pallas_theta_round(theta0, pdata_h, interpret=True)
    th_d, c_d = pallas_theta_round(theta0, pdata_d, interpret=True)
    np.testing.assert_allclose(np.asarray(th_d), np.asarray(th_h),
                               rtol=2e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(c_d), np.asarray(c_h),
                               rtol=2e-5, atol=1e-5)


def test_device_build_no_restore_counts():
    from rsem_tpu.ops.pallas_round import (
        build_pallas_data_device,
        jit_pallas_counts,
        run_pallas_em_loop,
    )

    hits, lcp, lnp = _synthetic(N=200, M=50, seed=17)
    M = 50
    pdata = build_pallas_data_device(
        hits, jnp.asarray(lcp, jnp.float32), jnp.asarray(lnp, jnp.float32),
        jnp.asarray(hits.sid, jnp.int32), M, 2.0, need_restore=False,
    )
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    th, c, r = run_pallas_em_loop(theta0, pdata, max_round=25,
                                  interpret=True)
    counts = np.asarray(jit_pallas_counts(th, pdata))
    # mass conservation: N reads + n0
    assert counts.sum() == pytest.approx(hits.n_reads + 2.0, rel=1e-5)
