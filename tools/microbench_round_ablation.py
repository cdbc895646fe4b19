"""Ablate the fused model-round body on the chip: time the full round and
variants with pieces removed, to attribute the per-round milliseconds."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rsem_tpu.utils.jaxinit import configure, sync
    configure()

    from rsem_tpu.ops import (HitsDevice, KernelConfig, ReadsDevice,
                              RefDevice)
    from rsem_tpu.ops.conprb import (CHUNK, _ceil_to, noise_scatter_pre,
                                     noise_sum_pre,
                                     precompute_profile_indices_eager,
                                     profile_scatter_pre, profile_sum_pre)
    from rsem_tpu.ops.fast_estep import gather_rows, seg_sum_sorted
    from rsem_tpu.ops.model_loop import jit_build_model_loop_data
    from rsem_tpu.ops.pallas_table import onehot_scatter
    from rsem_tpu.testing import synthetic_arrays_fast

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=1_000_000, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    h_pad = max(_ceil_to(bundle.hits.n_hits, CHUNK), CHUNK)
    hd = HitsDevice.from_arrays(bundle.hits, h_pad)
    qmax = int(bundle.reads.quals.max())
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1], qmax=qmax)
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model.device_arrays().items()}
    M = ref.M
    n_reads = m1.lens.shape[0]
    pre = precompute_profile_indices_eager(kcfg, refd, m1, None, hd)
    mdata = jit_build_model_loop_data(
        kcfg, refd, m1, None, hd, pre, dm,
        jnp.asarray(bundle.hits.read_offsets, dtype=jnp.int32),
        jnp.asarray(np.asarray(model.npro.c).reshape(-1), dtype=jnp.float32),
        jnp.asarray(0.0, dtype=jnp.float32))
    sync(mdata.lp_static)
    log_pro = dm["log_pro"].reshape(-1)[: kcfg.pro_keys()]
    log_npro = dm["log_npro"].reshape(-1)[: kcfg.npro_keys()]
    theta = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)

    def timeit(name, fn, *args, iters=5):
        out = fn(*args); sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms",
              flush=True)
        return out

    from rsem_tpu.ops.model_loop import _hist_gather, _hist_scatter

    d = mdata
    timeit("pro gather_sum [Hp,128]",
           jax.jit(lambda t, f: profile_sum_pre(kcfg, t, f)), log_pro,
           d.flat1)
    timeit("noise hist gather [N,K] mm",
           jax.jit(_hist_gather), d.noise_hist, log_npro)
    timeit("ltheta gather_rows [Hp]",
           jax.jit(lambda t, s: gather_rows(t, s)), theta, d.sid)
    w = jnp.abs(jnp.sin(jnp.arange(d.sid.shape[0], dtype=jnp.float32)))
    timeit("seg_sum_sorted [Hp]",
           jax.jit(lambda v, s: seg_sum_sorted(v, s)), w, d.starts)
    inv = jnp.abs(jnp.cos(jnp.arange(n_reads, dtype=jnp.float32)))
    timeit("inv gather_rows [Hp by rid]",
           jax.jit(lambda t, r: gather_rows(t, r)), inv, d.rid)
    timeit("counts onehot_scatter [Hp->M+1]",
           jax.jit(lambda s, ww: onehot_scatter(s, ww, M + 1)), d.sid, w)
    timeit("pro scatter_add [Hp,128]",
           jax.jit(lambda p, ww: profile_scatter_pre(kcfg, p, ww)),
           pre, w)
    timeit("noise hist scatter [N,K] mm",
           jax.jit(_hist_scatter), d.noise_hist, inv)
    timeit("exp+elementwise [Hp]",
           jax.jit(lambda lp, s0h: jnp.exp(jnp.minimum(lp - s0h, 80.0))),
           d.lp_static, d.s0_hit)


if __name__ == "__main__":
    main()
