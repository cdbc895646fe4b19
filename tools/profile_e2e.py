"""Per-phase timing of the theta-loop harness at bench scale on the TPU.

Phases: conprb freeze, D2H fetch, host layout build (incl. H2D), loop
compile (cold vs persistent-cache warm), loop execution; XLA vs Pallas.

All phase boundaries are closed with utils.jaxinit.sync(): on the axon
platform block_until_ready returns at dispatch, not completion, so naive
timings attribute execution to whatever innocent call happens to force
the data dependency next (this is how VERDICT r2's "62s f64 transfer"
was actually the conprb pass executing).
"""
import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--n-reads", type=int, default=1_000_000)
    ap.add_argument("--M", type=int, default=20_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsem_tpu.utils.jaxinit import configure, fetch, sync
    configure()
    print("device:", jax.devices()[0], flush=True)

    from rsem_tpu.ops import (HitsDevice, KernelConfig, ReadsDevice,
                              RefDevice, compute_log_conprb,
                              compute_log_noise_conprb)
    from rsem_tpu.testing import synthetic_arrays_fast

    t0 = time.perf_counter()
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=args.n_reads, M=args.M, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    print(f"datagen            {time.perf_counter()-t0:8.2f}s", flush=True)

    t0 = time.perf_counter()
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dev_model = {k: jnp.asarray(v, dtype=jnp.float32)
                 for k, v in model.device_arrays().items()}
    sync(m1.codes, hd.sid, refd.codes)
    print(f"H2D reads/hits     {time.perf_counter()-t0:8.2f}s", flush=True)

    M = ref.M
    conprb_fn = jax.jit(partial(compute_log_conprb, kcfg))
    ncp_fn = jax.jit(partial(compute_log_noise_conprb, kcfg))
    t0 = time.perf_counter()
    lcp_d = conprb_fn(refd, m1, None, hd, dev_model)
    lnp_d = ncp_fn(m1, None, dev_model)
    sync(lcp_d, lnp_d)
    print(f"conprb freeze      {time.perf_counter()-t0:8.2f}s (compile+exec)",
          flush=True)
    t0 = time.perf_counter()
    lcp_d = conprb_fn(refd, m1, None, hd, dev_model)
    lnp_d = ncp_fn(m1, None, dev_model)
    sync(lcp_d, lnp_d)
    print(f"conprb steady      {time.perf_counter()-t0:8.2f}s", flush=True)

    t0 = time.perf_counter()
    lcp = fetch(lcp_d)[: bundle.hits.n_hits]
    lnp = fetch(lnp_d)[: bundle.hits.n_reads]
    print(f"D2H conprbs f32    {time.perf_counter()-t0:8.2f}s", flush=True)

    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    if args.kernel == "xla":
        from rsem_tpu.ops.fast_estep import (build_fast_data,
                                             fast_theta_round,
                                             run_fast_em_loop)
        t0 = time.perf_counter()
        fdata = build_fast_data(bundle.hits, lcp, lnp, M, 0.0)
        sync(fdata.cps_c)
        print(f"layout build+H2D   {time.perf_counter()-t0:8.2f}s", flush=True)
        round_fn = jax.jit(lambda t, d: fast_theta_round(t, d)[0])
        loop_fn = jax.jit(run_fast_em_loop)
    else:
        from rsem_tpu.ops.pallas_round import (build_pallas_data,
                                               pallas_theta_round,
                                               run_pallas_em_loop)
        t0 = time.perf_counter()
        fdata = build_pallas_data(bundle.hits, lcp, lnp, M, 0.0)
        sync(fdata.cps_t)
        print(f"layout build+H2D   {time.perf_counter()-t0:8.2f}s", flush=True)
        round_fn = jax.jit(lambda t, d: pallas_theta_round(t, d)[0])
        loop_fn = jax.jit(run_pallas_em_loop)

    t0 = time.perf_counter()
    th = round_fn(theta0, fdata)
    sync(th)
    print(f"round compile+1st  {time.perf_counter()-t0:8.2f}s", flush=True)
    it = 20
    t0 = time.perf_counter()
    th = theta0
    for _ in range(it):
        th = round_fn(th, fdata)
    sync(th)
    dt = (time.perf_counter() - t0) / it
    print(f"round steady       {dt*1e3:8.2f}ms  "
          f"({args.n_reads/dt/1e6:.1f}M reads/s)", flush=True)

    t0 = time.perf_counter()
    th, c, r, *_ = loop_fn(theta0, fdata)
    sync(th)
    rr = int(r)
    print(f"loop compile+run   {time.perf_counter()-t0:8.2f}s  rounds={rr}",
          flush=True)
    t0 = time.perf_counter()
    th, c, r, *_ = loop_fn(theta0, fdata)
    sync(th)
    print(f"loop warm          {time.perf_counter()-t0:8.2f}s  rounds={int(r)}",
          flush=True)


if __name__ == "__main__":
    main()
