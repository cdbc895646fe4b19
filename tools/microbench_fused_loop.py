"""Time the fused on-device model-round loop (ops/model_loop) on the real
chip at bench scale, against the r3 per-round numbers (2.75 s/round)."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rsem_tpu.utils.jaxinit import configure, fetch64, sync
    configure()
    print("device:", jax.devices()[0], flush=True)
    # first device interaction pays the remote-chip claim/attach (measured
    # 1.6s-265s depending on prior claim state); time it out of the loop
    t0 = time.perf_counter()
    sync(jnp.zeros(8) + 1.0)
    print(f"device attach+first dispatch: {time.perf_counter()-t0:.1f}s",
          flush=True)

    from rsem_tpu.ops import (HitsDevice, KernelConfig, ReadsDevice,
                              RefDevice)
    from rsem_tpu.ops.conprb import (CHUNK, _ceil_to,
        precompute_profile_indices_eager)
    from rsem_tpu.ops.model_loop import (jit_build_model_loop_data,
                                         jit_model_loop, tables_from_model)
    from rsem_tpu.testing import synthetic_arrays_fast

    t0 = time.perf_counter()
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=1_000_000, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    print(f"fixture: {time.perf_counter()-t0:.1f}s", flush=True)

    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    h_pad = max(_ceil_to(bundle.hits.n_hits, CHUNK), CHUNK)
    hd = HitsDevice.from_arrays(bundle.hits, h_pad)
    qmax = int(bundle.reads.quals.max())
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1], qmax=qmax)
    print("qmax:", qmax, "pro_keys:", kcfg.pro_keys(),
          "npro_keys:", kcfg.npro_keys(), flush=True)
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model.device_arrays().items()}
    M = ref.M
    n_reads = m1.lens.shape[0]
    N0 = bundle.cnt.N0

    t0 = time.perf_counter()
    pre = precompute_profile_indices_eager(kcfg, refd, m1, None, hd)
    sync(pre.flat1)
    print(f"preidx: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    mdata = jit_build_model_loop_data(
        kcfg, refd, m1, None, hd, pre, dm,
        jnp.asarray(bundle.hits.read_offsets, dtype=jnp.int32),
        jnp.asarray(np.asarray(model.npro.c).reshape(-1), dtype=jnp.float32),
        jnp.asarray(float(N0), dtype=jnp.float32))
    sync(mdata.lp_static, mdata.s0)
    print(f"build (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

    tables0 = tables_from_model(kcfg, dm)
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)

    for n_rounds in (1, 10):
        t0 = time.perf_counter()
        th, suff = jit_model_loop(kcfg, mdata, tables0, theta0, n_rounds,
                                  n_reads, M)
        sync(th, suff)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            th, suff = jit_model_loop(kcfg, mdata, tables0, theta0,
                                      n_rounds, n_reads, M)
        sync(th, suff)
        warm = (time.perf_counter() - t0) / iters
        print(f"fused loop n_rounds={n_rounds:2d}: cold {cold:.1f}s  "
              f"warm {warm*1e3:.0f} ms ({warm/n_rounds*1e3:.0f} ms/round)",
              flush=True)

    th_np = fetch64(th)
    print("theta head:", th_np[:3], "sum", th_np.sum(),
          "suff pro sum:", float(np.asarray(suff['pro']).sum()), flush=True)


if __name__ == "__main__":
    main()
