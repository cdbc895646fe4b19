"""Throughput at scale: theta-round reads/s and HBM footprint at large M.

The throughput-at-scale companion to tests/test_scale.py (which pins
correctness of the same layout at M=200k on CPU). Run on the real TPU:

    python tools/bench_scale.py [--n-reads 10000000] [--M 200000]

Reports the XLA round (the Pallas kernel caps at M<=64k transcripts —
pallas_round.MAX_M_FOR_PALLAS — so scale configs exercise the XLA path),
with the skewed 1..200 hits-per-read tail of SURVEY §5's scaling axes.
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-reads", type=int, default=10_000_000)
    ap.add_argument("--M", type=int, default=200_000)
    ap.add_argument("--read-len", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsem_tpu.utils.jaxinit import configure, sync
    configure()
    print("device:", jax.devices()[0], flush=True)

    from rsem_tpu.ops.fast_estep import (build_fast_data, fast_theta_round,
                                         run_fast_em_loop)
    from rsem_tpu.testing import synthetic_arrays_fast

    t0 = time.perf_counter()
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=args.n_reads, M=args.M, read_len=args.read_len, tx_len=1500,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0,
        skewed_hits=True, consistent_reads=False)  # conprbs are synthetic
    H = bundle.hits.n_hits
    print(f"datagen            {time.perf_counter()-t0:8.2f}s  "
          f"H={H} ({H/args.n_reads:.2f} aln/read)", flush=True)

    # frozen synthetic conprbs: scale benchmarks target the theta loop
    rng = np.random.default_rng(0)
    lcp = rng.normal(-20, 3, H)
    lnp = rng.normal(-25, 3, bundle.hits.n_reads)

    t0 = time.perf_counter()
    fdata = build_fast_data(bundle.hits, lcp, lnp, ref.M, 0.0)
    sync(fdata.cps_c)
    print(f"layout build+H2D   {time.perf_counter()-t0:8.2f}s", flush=True)
    slots = sum(int(np.prod(t.shape)) for t in fdata.sid_b)
    hbm = (slots * 8  # sid+cps tiles
           + int(np.prod(fdata.cps_c.shape)) * 8  # chunk cps+rloc
           + fdata.sid_starts_c.size * 4 + fdata.restore_hit.size * 4)
    print(f"HBM footprint      {hbm/1e9:8.2f} GB "
          f"(slots={slots}, chunks={fdata.cps_c.shape})", flush=True)

    theta0 = jnp.full((ref.M + 1,), 1.0 / (ref.M + 1), dtype=jnp.float32)
    # fdata MUST be a jit ARGUMENT: a closure would serialize the multi-GB
    # layout into the remote compile request (HTTP 413 at M=200k, r4)
    round_fn = jax.jit(lambda t, d: fast_theta_round(t, d)[0])
    t0 = time.perf_counter()
    th = round_fn(theta0, fdata)
    sync(th)
    print(f"round compile+1st  {time.perf_counter()-t0:8.2f}s", flush=True)
    it = 10
    t0 = time.perf_counter()
    th = theta0
    for _ in range(it):
        th = round_fn(th, fdata)
    sync(th)
    dt = (time.perf_counter() - t0) / it
    print(f"round steady       {dt*1e3:8.2f}ms  "
          f"({args.n_reads/dt/1e6:.1f}M reads/s/chip, "
          f"{H/dt/1e6:.1f}M hits/s)", flush=True)

    # segmented loop (bounded dispatches — a single while_loop spanning
    # hundreds of rounds tripped the TPU worker watchdog at this scale)
    loop_fn = jax.jit(run_fast_em_loop)
    t0 = time.perf_counter()
    th, r, tot = theta0, 0, 1
    while (r < 20 or tot > 0) and r < 200:
        target = r + 20
        th, c, rr, td = loop_fn(
            theta0 if r == 0 else th, fdata,
            min_round=jnp.asarray(min(20, target), jnp.int32),
            max_round=jnp.asarray(target, jnp.int32),
            start_round=jnp.asarray(r, jnp.int32))
        r, tot = int(rr), int(td)
    print(f"loop (20-round segments) {time.perf_counter()-t0:8.2f}s  "
          f"rounds={r} converged={tot == 0} (incl compile)", flush=True)


if __name__ == "__main__":
    main()
