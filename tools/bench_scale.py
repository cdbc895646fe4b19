"""Throughput at scale: theta-round reads/s and HBM footprint.

Correctness companion: tests/test_scale.py (CPU). Run on the real TPU:

    python tools/bench_scale.py [--points 10m20k,200k,stream]

Points (each runs in its own contained section — a failure records an
error in the artifact instead of losing the run, verdict r4 weak #7):
  10m20k  10M reads / M=20k  — PALLAS kernel, layout resident in HBM
          (r4 ran this through the XLA layout at 10.92 GB and crashed the
          TPU worker; the pallas tiles are ~12 B/slot and fit easily)
  200k    2M reads / M=200k  — XLA kernel (M above the pallas table cap)
  stream  2M reads / M=200k through run_fast_em_loop_streamed with 8
          host chunks — bounded-HBM operation (ReadReader.h equivalent);
          peak device layout = one chunk

Writes tools/artifacts_r5/bench_scale.json incrementally after each point.
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "artifacts_r5")


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _write(out):
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "bench_scale.json"), "w") as f:
        json.dump(out, f, indent=1)


def _gen(n_reads, M, skewed, seed=0):
    from rsem_tpu.testing import synthetic_arrays_fast

    t0 = time.perf_counter()
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=n_reads, M=M, read_len=100, tx_len=1500,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=seed,
        skewed_hits=skewed, consistent_reads=False)
    H = bundle.hits.n_hits
    rng = np.random.default_rng(0)
    lcp = rng.normal(-20, 3, H)
    lnp = rng.normal(-25, 3, bundle.hits.n_reads)
    _log(f"datagen {time.perf_counter()-t0:.1f}s H={H}")
    return ref, bundle, lcp, lnp


def _nbytes(tree):
    import jax

    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def point_10m20k(out):
    import jax
    import jax.numpy as jnp

    from rsem_tpu.ops.pallas_round import (
        build_pallas_data, pallas_theta_round)
    from rsem_tpu.utils.jaxinit import sync

    n_reads, M = 10_000_000, 20_000
    ref, bundle, lcp, lnp = _gen(n_reads, M, skewed=True)
    H = bundle.hits.n_hits
    t0 = time.perf_counter()
    pdata = build_pallas_data(bundle.hits, lcp, lnp, M, 0.0)
    sync(pdata.cps_t[0])
    t_build = time.perf_counter() - t0
    hbm = _nbytes(pdata)
    _log(f"pallas layout {t_build:.1f}s, {hbm/1e9:.2f} GB")
    round_fn = jax.jit(lambda t, d: pallas_theta_round(t, d)[0])
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    th = round_fn(theta0, pdata)
    sync(th)
    it = 10
    t0 = time.perf_counter()
    for _ in range(it):
        th = round_fn(th, pdata)
    sync(th)
    dt = (time.perf_counter() - t0) / it
    out.update({
        "n_reads": n_reads, "M": M, "n_hits": H,
        "layout_build_sec": round(t_build, 2),
        "layout_hbm_gb": round(hbm / 1e9, 3),
        "theta_round_ms": round(dt * 1e3, 2),
        "theta_reads_per_sec": round(n_reads / dt),
        "kernel": "pallas",
    })
    _log(f"10M steady round {dt*1e3:.1f} ms "
         f"({n_reads/dt/1e6:.0f}M reads/s)")


def point_200k(out):
    import jax
    import jax.numpy as jnp

    from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round
    from rsem_tpu.utils.jaxinit import sync

    n_reads, M = 2_000_000, 200_000
    ref, bundle, lcp, lnp = _gen(n_reads, M, skewed=True)
    t0 = time.perf_counter()
    fdata = build_fast_data(bundle.hits, lcp, lnp, M, 0.0)
    sync(fdata.cps_c)
    t_build = time.perf_counter() - t0
    hbm = _nbytes(fdata)
    round_fn = jax.jit(lambda t, d: fast_theta_round(t, d)[0])
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)
    th = round_fn(theta0, fdata)
    sync(th)
    it = 10
    t0 = time.perf_counter()
    for _ in range(it):
        th = round_fn(th, fdata)
    sync(th)
    dt = (time.perf_counter() - t0) / it
    out.update({
        "n_reads": n_reads, "M": M, "n_hits": bundle.hits.n_hits,
        "layout_build_sec": round(t_build, 2),
        "layout_hbm_gb": round(hbm / 1e9, 3),
        "theta_round_ms": round(dt * 1e3, 2),
        "theta_reads_per_sec": round(n_reads / dt),
        "kernel": "xla",
    })
    _log(f"200k steady round {dt*1e3:.1f} ms")


def point_stream(out):
    from rsem_tpu.ops.fast_estep import run_fast_em_loop_streamed
    from rsem_tpu.parallel.fast_sharded import build_fast_data_chunks

    n_reads, M, n_chunks = 2_000_000, 200_000, 8
    ref, bundle, lcp, lnp = _gen(n_reads, M, skewed=True, seed=1)
    t0 = time.perf_counter()
    chunks, bounds, _hb = build_fast_data_chunks(
        bundle.hits, lcp, lnp, M, 0.0, n_chunks)
    t_build = time.perf_counter() - t0
    per_chunk = max(_nbytes(c) for c in chunks)
    total = sum(_nbytes(c) for c in chunks)
    theta0 = np.full(M + 1, 1.0 / (M + 1))
    rounds_t = []

    def prog(r, tot):
        rounds_t.append(time.perf_counter())

    t0 = time.perf_counter()
    th, c, r = run_fast_em_loop_streamed(
        theta0, chunks, M, 0.0, min_round=2, max_round=6, progress=prog)
    dt = time.perf_counter() - t0
    steady = (rounds_t[-1] - rounds_t[1]) / max(len(rounds_t) - 2, 1) \
        if len(rounds_t) > 2 else dt / max(r, 1)
    out.update({
        "n_reads": n_reads, "M": M, "n_chunks": n_chunks,
        "chunks_build_sec": round(t_build, 2),
        "peak_device_layout_gb": round(per_chunk / 1e9, 3),
        "total_layout_gb": round(total / 1e9, 3),
        "rounds": r,
        "streamed_round_sec": round(steady, 2),
        "note": "per-round H2D restream; peak HBM = one chunk "
                "(ReadReader.h bounded-RAM equivalent)",
    })
    _log(f"streamed: peak {per_chunk/1e9:.2f} GB of {total/1e9:.2f} GB, "
         f"{steady:.1f}s/round")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="10m20k,200k,stream")
    args = ap.parse_args()

    import jax

    from rsem_tpu.utils.jaxinit import configure
    configure()
    _log(f"device: {jax.devices()[0]}")

    fns = {"10m20k": point_10m20k, "200k": point_200k,
           "stream": point_stream}
    results = {"device": str(jax.devices()[0])}
    for name in args.points.split(","):
        sec = {}
        results[name] = sec
        t0 = time.perf_counter()
        try:
            _log(f"=== point {name} ===")
            fns[name](sec)
            sec["status"] = "ok"
        except Exception as exc:  # contained: record, continue
            sec["status"] = "error"
            sec["error"] = f"{type(exc).__name__}: {exc}"
            _log(traceback.format_exc())
        sec["wall_sec"] = round(time.perf_counter() - t0, 1)
        _write(results)  # partial artifact after every point
    print(json.dumps(results))


if __name__ == "__main__":
    main()
