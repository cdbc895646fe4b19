"""Time the fused Pallas theta round vs the XLA round on the bench workload
(1M single-end reads, ~2.5 aln/read, M=20k) on the real TPU."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round
from rsem_tpu.ops.pallas_round import (
    build_pallas_data,
    pallas_theta_round,
    run_pallas_em_loop,
)
from rsem_tpu.testing import synthetic_arrays_fast
from rsem_tpu.ops import (
    HitsDevice,
    KernelConfig,
    ReadsDevice,
    RefDevice,
    compute_log_conprb,
    compute_log_noise_conprb,
)


def timeit(fn, *args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:45s} {dt*1e3:9.3f} ms")
    return dt


def main():
    n_reads = 1_000_000
    M = 20_000
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=n_reads, M=M, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0,
    )
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dev_model = {k: jnp.asarray(v, dtype=jnp.float32)
                 for k, v in model.device_arrays().items()}
    log_conprb = jax.jit(partial(compute_log_conprb, kcfg))(
        refd, m1, None, hd, dev_model)
    log_ncp = jax.jit(partial(compute_log_noise_conprb, kcfg))(
        m1, None, dev_model)
    jax.block_until_ready((log_conprb, log_ncp))
    lcp = np.asarray(log_conprb, dtype=np.float64)[: bundle.hits.n_hits]
    lnp = np.asarray(log_ncp, dtype=np.float64)[: bundle.hits.n_reads]

    t0 = time.perf_counter()
    pdata = build_pallas_data(bundle.hits, lcp, lnp, M, 0.0)
    print(f"build_pallas_data: {time.perf_counter()-t0:.2f}s")
    for s, K in zip(pdata.sid_t, pdata.ks):
        print(f"  bucket K={K:4d} tiles {s.shape}")

    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)

    pallas_fn = jax.jit(pallas_theta_round)
    t_p, c_p = pallas_fn(theta0, pdata)
    jax.block_until_ready((t_p, c_p))
    dt_pallas = timeit(pallas_fn, theta0, name="pallas_theta_round")

    t0 = time.perf_counter()
    fdata = build_fast_data(bundle.hits, lcp, lnp, M, 0.0)
    print(f"build_fast_data: {time.perf_counter()-t0:.2f}s")
    fast_fn = jax.jit(fast_theta_round)
    t_f, c_f = fast_fn(theta0, fdata)
    jax.block_until_ready((t_f, c_f))
    dt_fast = timeit(fast_fn, theta0, name="fast_theta_round (XLA)")

    err = np.abs(np.asarray(t_p) - np.asarray(t_f)).max()
    rel = err / np.asarray(t_f).max()
    print(f"theta max abs diff {err:.3e} (rel to max {rel:.3e})")
    print(f"speedup: {dt_fast/dt_pallas:.2f}x; "
          f"reads/s = {n_reads/dt_pallas/1e6:.1f}M")

    # full loop throughput
    loop_fn = jax.jit(partial(run_pallas_em_loop, max_round=50))
    out = loop_fn(theta0, pdata)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    th, cts, rounds = loop_fn(theta0, pdata)
    jax.block_until_ready(th)
    dt = time.perf_counter() - t0
    print(f"50-round loop: {dt*1e3:.1f} ms ({dt/50*1e3:.2f} ms/round), "
          f"rounds={int(rounds)}")


if __name__ == "__main__":
    main()
