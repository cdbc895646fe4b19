"""Microbench the fused Pallas Gibbs sweep at bench-workload scale.

Usage: python tools/microbench_pallas_gibbs.py [n_reads] [M] [n_chains]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp
    from functools import partial

    from rsem_tpu.utils.jaxinit import configure, sync
    configure()
    from rsem_tpu.io.hits import HitArrays
    from rsem_tpu.ops.pallas_gibbs import (
        build_pallas_gibbs_data, init_chains, sweep_part)

    rng = np.random.default_rng(0)
    # ~RSEM-like: hits per read 1 + Poisson(1.5); multireads hit nearby sids
    nh = 1 + rng.poisson(1.5, n_reads)
    offs = np.concatenate([[0], np.cumsum(nh)]).astype(np.int64)
    H = int(offs[-1])
    primary = rng.integers(1, M + 1, n_reads)
    sid = np.repeat(primary, nh)
    extra = rng.integers(-40, 41, H)
    first = offs[:-1]
    mask = np.ones(H, bool)
    mask[first] = False
    sid[mask] = np.clip(sid[mask] + extra[mask], 1, M)
    lcp = rng.normal(-20, 2, H)
    lnp = rng.normal(-45, 3, n_reads)
    hits = HitArrays(
        rid=np.repeat(np.arange(n_reads, dtype=np.int32), nh),
        sid=sid.astype(np.int32), dir=np.zeros(H, np.int8),
        pos=np.zeros(H, np.int32), insert_len=None, read_offsets=offs,
    )

    t0 = time.perf_counter()
    data = build_pallas_gibbs_data(hits, lcp, lnp, M)
    t_build = time.perf_counter() - t0
    slots = sum(int(p.sid_t.shape[0]) * 128 for p in data.parts)
    print(f"build {t_build:.2f}s; parts:", file=sys.stderr)
    for p in data.parts:
        print(f"  K={p.K} W={p.W} tiles={p.sid_t.shape[0]//256} "
              f"slots={p.sid_t.shape[0]*128}", file=sys.stderr)
    print(f"total padded slots {slots} (H={H})", file=sys.stderr)

    t_pad = data.t_pad
    base = np.zeros(t_pad * 128, np.float32)
    base[: M + 1] = 1.0
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    t0 = time.perf_counter()
    zohs, tables = jax.jit(init_chains, static_argnums=(3,))(
        keys, data, jnp.asarray(base), C)
    sync(tables)
    t_init = time.perf_counter() - t0
    print(f"init {t_init:.2f}s", file=sys.stderr)

    @partial(jax.jit, static_argnums=(3,))
    def seg(zohs, tables, sweep0, nsw, data):
        def body(s, state):
            zohs, tables = state
            new_z = []
            for pi, part in enumerate(data.parts):
                seed_arr = jnp.stack(
                    [jnp.int32(123 + pi), (sweep0 + s).astype(jnp.int32)])
                z, tables = sweep_part(zohs[pi], tables, part, seed_arr)
                new_z.append(z)
            return tuple(new_z), tables
        return jax.lax.fori_loop(0, nsw, body, (zohs, tables))

    # warm
    t0 = time.perf_counter()
    zohs, tables = seg(zohs, tables, jnp.asarray(0, jnp.int32), 2, data)
    sync(tables)
    print(f"compile+2 sweeps {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    NS = 25
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        zohs, tables = seg(
            zohs, tables, jnp.asarray(2 + rep * NS, jnp.int32), NS, data)
        sync(tables)
        times.append(time.perf_counter() - t0)
    print("segment times:", [round(t, 3) for t in times], file=sys.stderr)
    dt = min(times)
    per_sweep = dt / NS
    print(f"{NS} sweeps (x{C} chains): {dt:.3f}s -> {per_sweep*1e3:.2f} "
          f"ms/sweep ({per_sweep/C*1e3:.2f} ms/sweep/chain)", file=sys.stderr)
    tot = np.asarray(tables).reshape(C, -1)[:, : M + 1].sum(axis=1)
    print("conservation check (counts sums):", tot[:4], file=sys.stderr)
    # projected full gibbs (burnin 200 + 1000/C samples)
    sweeps = 200 + 1000 // C
    print(f"projected gibbs_sec at defaults: {sweeps*per_sweep:.2f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
