"""Profile the theta-round components in isolation on the real TPU.

Breaks the 21 ms/round into: denominator pass (theta gather + rowsum),
invd gather, segment sum — plus microbenchmarks of raw gather strategies
to guide the kernel rewrite.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rsem_tpu.ops.fast_estep import (
    BLOCK,
    RSLICE,
    build_fast_data,
    fast_theta_round,
    gather_rows,
    seg_sum_sorted,
    _bucket_denoms,
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
    log_conprb = jax.jit(partial(compute_log_conprb, kcfg))(refd, m1, None, hd, dev_model)
    log_ncp = jax.jit(partial(compute_log_noise_conprb, kcfg))(m1, None, dev_model)
    fdata = build_fast_data(
        bundle.hits,
        np.asarray(log_conprb, dtype=np.float64)[: bundle.hits.n_hits],
        np.asarray(log_ncp, dtype=np.float64)[: bundle.hits.n_reads],
        M, 0.0,
    )
    theta0 = jnp.asarray(np.full(M + 1, 1.0 / (M + 1)), dtype=jnp.float32)

    H_flat = sum(int(t.size) for t in fdata.sid_b)
    rows_total = sum(int(t.shape[0]) for t in fdata.sid_b)
    print(f"hits={bundle.hits.n_hits} flat_slots={H_flat} rows={rows_total} "
          f"chunks={len(fdata.cps_c)} rows_pad={fdata.rows_pad}")
    for t in fdata.sid_b:
        print("  bucket", t.shape)

    # full round
    f_round = jax.jit(lambda th: fast_theta_round(th, fdata)[0])
    timeit(f_round, theta0, name="full fast_theta_round")

    # denominators only
    f_denom = jax.jit(lambda th: _bucket_denoms(th, fdata)[0])
    timeit(f_denom, theta0, name="_bucket_denoms (theta gather + rowsum)")

    # invd gather + segsum, starting from a fixed invd
    invd = jnp.ones(fdata.rows_pad, dtype=jnp.float32)

    def _gather_seg(invd):
        counts_sum = None
        for k, (cps_k, rloc_k, starts_k) in enumerate(
            zip(fdata.cps_c, fdata.rloc_c, fdata.sid_starts_c)
        ):
            sl = jax.lax.slice(invd, (k * RSLICE,), ((k + 1) * RSLICE,))
            u = cps_k * gather_rows(sl, rloc_k)
            part = seg_sum_sorted(u, starts_k)
            counts_sum = part if counts_sum is None else counts_sum + part
        return counts_sum

    timeit(jax.jit(_gather_seg), invd, name="invd gather + segsum")

    def _gather_only(invd):
        out = []
        for k, rloc_k in enumerate(fdata.rloc_c):
            sl = jax.lax.slice(invd, (k * RSLICE,), ((k + 1) * RSLICE,))
            out.append(gather_rows(sl, rloc_k).sum())
        return sum(out)

    timeit(jax.jit(_gather_only), invd, name="invd gather only (+reduce)")

    def _seg_only(invd):
        out = None
        for cps_k, starts_k in zip(fdata.cps_c, fdata.sid_starts_c):
            part = seg_sum_sorted(cps_k, starts_k)
            out = part if out is None else out + part
        return out

    timeit(jax.jit(_seg_only), invd, name="segsum only")

    # theta gather only (flat, all buckets)
    def _theta_gather(th):
        acc = 0.0
        for sid_t in fdata.sid_b:
            acc = acc + gather_rows(th, sid_t.reshape(-1)).sum()
        return acc

    timeit(jax.jit(_theta_gather), theta0, name="theta gather only (+reduce)")

    # raw gather microbenches on comparable sizes
    n = 4 * 1024 * 1024
    key = jax.random.PRNGKey(0)
    idx_small = jax.random.randint(key, (n,), 0, M + 1, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx_small)
    table_small = jnp.ones(M + 1, jnp.float32)
    table_big = jnp.ones(RSLICE, jnp.float32)
    idx_big = jax.random.randint(key, (n,), 0, RSLICE, dtype=jnp.int32)

    timeit(jax.jit(lambda t, i: t[i].sum()), table_small, idx_small,
           name=f"raw elementwise gather {n>>20}M from 20k")
    timeit(jax.jit(lambda t, i: t[i].sum()), table_small, idx_sorted,
           name=f"raw elementwise gather {n>>20}M from 20k SORTED idx")
    timeit(jax.jit(lambda t, i: gather_rows(t, i).sum()), table_small, idx_small,
           name=f"gather_rows {n>>20}M from 20k")
    timeit(jax.jit(lambda t, i: t[i].sum()), table_big, idx_big,
           name=f"raw elementwise gather {n>>20}M from 128k")
    timeit(jax.jit(lambda t, i: gather_rows(t, i).sum()), table_big, idx_big,
           name=f"gather_rows {n>>20}M from 128k")


    # cumsum microbench
    v = jnp.ones(H_flat // BLOCK * BLOCK, jnp.float32).reshape(-1, BLOCK)
    timeit(jax.jit(lambda v: jnp.cumsum(v, axis=1).sum()), v,
           name="in-block cumsum [nb,512]")
    timeit(jax.jit(lambda v: jnp.cumsum(v, axis=0).sum()), v.sum(axis=1).astype(jnp.float64),
           name="cross-block f64 cumsum [nb]")


if __name__ == "__main__":
    main()
