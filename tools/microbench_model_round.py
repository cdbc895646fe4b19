"""Time the device-path model-update round components on the real TPU:
conprb pass, noise pass, E-step (flat segment softmax), suffstats scatter.
These are the 10 model rounds the reference spends 31.9s on (1 thread);
sync-timed (jaxinit.sync)."""
import time
from functools import partial

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from rsem_tpu.utils.jaxinit import configure, sync
    configure()
    print("device:", jax.devices()[0], flush=True)
    from rsem_tpu.ops import (HitsDevice, KernelConfig, ReadsDevice,
                              RefDevice, compute_log_conprb,
                              compute_log_noise_conprb)
    from rsem_tpu.ops.estep import estep_fracs, suffstats
    from rsem_tpu.testing import synthetic_arrays_fast

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=1_000_000, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model.device_arrays().items()}
    sync(m1.codes, refd.codes, hd.sid)
    M = ref.M
    n_reads = m1.lens.shape[0]

    def timeit(name, fn, *args, iters=3):
        out = fn(*args); sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.1f} ms",
              flush=True)
        return out

    conprb_fn = jax.jit(partial(compute_log_conprb, kcfg))
    ncp_fn = jax.jit(partial(compute_log_noise_conprb, kcfg))
    lcp = timeit("conprb (direct)", conprb_fn, refd, m1, None, hd, dm)
    lnp = timeit("noise conprb", ncp_fn, m1, None, dm)

    from rsem_tpu.ops.conprb import precompute_profile_indices
    pre_fn = jax.jit(partial(precompute_profile_indices, kcfg))
    pre = timeit("precompute indices", pre_fn, refd, m1, None, hd, iters=1)
    lcp2 = timeit("conprb (preidx)", conprb_fn, refd, m1, None, hd, dm, pre)

    from rsem_tpu.ops.fast_estep import gather_rows
    flat_all = pre.flat1.reshape(-1).astype(jnp.int32)
    gr = jax.jit(lambda t, ix: gather_rows(t, ix))
    table = dm["log_pro"].reshape(-1).astype(jnp.float32)
    timeit("  gather_rows 250M/2.5k", gr, table, flat_all)

    from rsem_tpu.ops.estep import onehot_scatter
    osc = jax.jit(lambda f, w: onehot_scatter(f, w, 2500))
    wts = jnp.ones_like(flat_all, dtype=jnp.float32)
    timeit("  onehot_scatter 250M/2.5k", osc, flat_all, wts)

    log_theta = jnp.full((M + 1,), -np.log(M + 1), jnp.float32)
    estep_jit = jax.jit(lambda lt, lc, ln: estep_fracs(
        lt, hd.sid, hd.rid, lc, ln, n_reads, M))
    out = timeit("estep_fracs", estep_jit, log_theta, lcp, lnp)

    # big arrays must be jit ARGUMENTS: closure-captured device constants
    # are serialized into the compile request (HTTP 413 on remote compile)
    suff_jit = jax.jit(lambda refd_, m1_, hd_, fh, fn_, dm_: suffstats(
        kcfg, refd_, m1_, None, hd_, fh, fn_, dm_, 0.5))
    timeit("suffstats (direct)", suff_jit, refd, m1, hd, out.frac_hit,
           out.frac_noise, dm)

    suffp_jit = jax.jit(lambda refd_, m1_, hd_, fh, fn_, dm_, p: suffstats(
        kcfg, refd_, m1_, None, hd_, fh, fn_, dm_, 0.5, pre=p))
    timeit("suffstats (preidx)", suffp_jit, refd, m1, hd, out.frac_hit,
           out.frac_noise, dm, pre)

    full = jax.jit(lambda refd_, m1_, hd_, dm_, lt: (lambda o: suffstats(
        kcfg, refd_, m1_, None, hd_, o.frac_hit, o.frac_noise, dm_, 0.5))(
        estep_fracs(lt, hd_.sid, hd_.rid,
                    compute_log_conprb(kcfg, refd_, m1_, None, hd_, dm_),
                    compute_log_noise_conprb(kcfg, m1_, None, dm_),
                    n_reads, M)))
    timeit("fused full model round", full, refd, m1, hd, dm, log_theta)


if __name__ == "__main__":
    main()
