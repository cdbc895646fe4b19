"""Scale correctness: large-M reference, skewed hits-per-read tail, memory
budget (VERDICT r1 item 6; SURVEY §5 scaling axes N 1e7-1e9, M 1e4-1e6).

The throughput-at-scale companion is tools/bench_scale.py (run on the TPU
host); this test pins correctness + memory of the layout/kernel machinery
at M=200k with the 1..200 hits/read tail on the CPU backend.
"""

import numpy as np
import pytest


def _nbytes(tree) -> int:
    import jax

    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "nbytes")
    )


@pytest.fixture(scope="module")
def big_problem():
    from rsem_tpu.testing import synthetic_arrays_fast

    # M = 200k transcripts (human annotation scale), skewed multimapping
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=200_000, M=200_000, read_len=100, tx_len=1500,
        paired=False, has_qual=True, mean_extra_hits=1.2,
        seed=3, skewed_hits=True,
    )
    return ref, bundle, spec, model


def test_skewed_tail_present(big_problem):
    ref, bundle, spec, model = big_problem
    nh = np.diff(bundle.hits.read_offsets)
    assert nh.max() >= 150, "tail should reach near the -m 200 cap"
    assert np.median(nh) <= 4
    assert (nh >= 64).sum() > 100


def test_fast_estep_scale_memory_and_correctness(big_problem):
    """The dense-bucket layout must stay within a linear memory budget even
    with the 1..200 tail (padding <= 2x hits), and one theta round must
    equal the flat segment-softmax oracle."""
    import jax.numpy as jnp

    from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round

    ref, bundle, spec, model = big_problem
    H = bundle.hits.n_hits
    N = bundle.hits.n_reads
    M = ref.M
    rng = np.random.default_rng(0)
    # synthetic frozen conprbs (positive, ragged) — the layout under test
    # is independent of how conprbs were produced
    log_cp = rng.normal(-30.0, 2.0, size=H)
    log_ncp = rng.normal(-40.0, 2.0, size=N)

    fdata = build_fast_data(bundle.hits, log_cp, log_ncp, M, n0=123.0)

    # ---- memory budget: dense buckets pad each read to the next pow2,
    # so slots <= 2*H + block padding; every per-hit array is <= 8 bytes
    slots = sum(int(np.prod(t.shape)) for t in fdata.sid_b)
    assert slots <= 2 * H + 64 * 512, f"padding blowup: {slots} slots vs {H} hits"
    total_bytes = _nbytes(fdata)
    budget = slots * (4 + 4) + H * (4 + 4 + 4) + 8 * (M + 2) * len(fdata.cps_c) \
        + 16 * N + 8 * fdata.rows_pad + 4 * H
    assert total_bytes <= budget * 1.35, (total_bytes, budget)

    # ---- correctness vs the flat oracle
    theta0 = np.full(M + 1, 1.0 / (M + 1), dtype=np.float64)
    theta1, counts = fast_theta_round(jnp.asarray(theta0, jnp.float32), fdata)
    theta1 = np.asarray(theta1, dtype=np.float64)

    # oracle: flat segment softmax in f64 numpy
    offs = bundle.hits.read_offsets
    nh = np.diff(offs)
    rid = np.repeat(np.arange(N), nh)
    sid = bundle.hits.sid.astype(np.int64)
    rmax = np.full(N, -np.inf)
    np.maximum.at(rmax, rid, log_cp)
    rmax = np.maximum(rmax, log_ncp)
    w = theta0[sid] * np.exp(log_cp - rmax[rid])
    w0 = theta0[0] * np.exp(log_ncp - rmax)
    denom = np.bincount(rid, weights=w, minlength=N) + w0
    counts_o = np.bincount(sid, weights=w / denom[rid], minlength=M + 1)
    counts_o[0] = (w0 / denom).sum() + 123.0
    theta_o = counts_o / counts_o.sum()

    np.testing.assert_allclose(theta1, theta_o, rtol=5e-3, atol=1e-10)
    # aggregate mass agrees tightly
    assert abs(theta1.sum() - 1.0) < 1e-5
    assert np.abs(theta1 - theta_o).max() < 1e-7


def test_pallas_falls_back_beyond_table_limit(big_problem):
    """M=200k exceeds the Pallas table budget — the selector must choose
    the XLA path, not fail."""
    from rsem_tpu.ops import pallas_round

    assert 200_000 > pallas_round.MAX_M_FOR_PALLAS
    assert not pallas_round.pallas_supported(200_000)


def test_full_em_loop_converges_at_scale(big_problem):
    import jax.numpy as jnp

    from rsem_tpu.ops.fast_estep import build_fast_data, run_fast_em_loop

    ref, bundle, spec, model = big_problem
    H = bundle.hits.n_hits
    N = bundle.hits.n_reads
    M = ref.M
    rng = np.random.default_rng(1)
    log_cp = rng.normal(-30.0, 1.0, size=H)
    log_ncp = np.full(N, -1e9)
    fdata = build_fast_data(bundle.hits, log_cp, log_ncp, M, n0=0.0)
    theta0 = jnp.asarray(np.full(M + 1, 1.0 / (M + 1)), jnp.float32)
    theta, counts, rounds, _ = run_fast_em_loop(theta0, fdata, max_round=60)
    theta = np.asarray(theta)
    assert np.isfinite(theta).all()
    assert abs(theta.sum() - 1.0) < 1e-4
    assert int(rounds) >= 20
    # counts conserve reads
    assert float(np.asarray(counts).sum()) == pytest.approx(N, rel=1e-4)


def test_streamed_loop_matches_resident(big_problem):
    """Bounded-HBM streamed theta loop (run_fast_em_loop_streamed) vs the
    resident while_loop: identical convergence trajectory within f32
    accumulation-order noise (VERDICT r4 missing #2 — the ReadReader.h
    bounded-RAM capability)."""
    import jax.numpy as jnp

    from rsem_tpu.ops.fast_estep import (
        build_fast_data,
        run_fast_em_loop,
        run_fast_em_loop_streamed,
    )
    from rsem_tpu.parallel.fast_sharded import build_fast_data_chunks

    ref, bundle, spec, model = big_problem
    hits = bundle.hits
    rng = np.random.default_rng(5)
    lcp = rng.normal(-20, 3, hits.n_hits)
    lnp = rng.normal(-25, 3, hits.n_reads)
    M = ref.M
    n0 = 7.0

    theta0 = np.full(M + 1, 1.0 / (M + 1))
    chunks, bounds, _hb = build_fast_data_chunks(
        hits, lcp, lnp, M, n0, n_shards=4)
    assert len(chunks) == 4
    # bounded-HBM invariant: each chunk's layout is ~1/4 of the whole
    whole = build_fast_data(hits, lcp, lnp, M, n0, device_put=False)
    per = max(_nbytes(c) for c in chunks)
    assert per < 0.55 * _nbytes(whole)

    th_s, c_s, r_s = run_fast_em_loop_streamed(
        theta0, chunks, M, n0, max_round=25)

    fdata = build_fast_data(hits, lcp, lnp, M, n0)
    th_r, c_r, r_r, _tot = run_fast_em_loop(
        jnp.asarray(theta0, dtype=jnp.float32), fdata, max_round=25)
    assert r_s == int(r_r)
    np.testing.assert_allclose(th_s, np.asarray(th_r), rtol=5e-4,
                               atol=1e-9)
    np.testing.assert_allclose(c_s.sum(), np.asarray(c_r).sum(), rtol=1e-5)
