"""Benchmark: honest end-to-end EM on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload mirrors the measured-reference workload exactly
(tools/measure_baseline.py -> tools/baseline_measured.json): 1M single-end
qual reads, ~2.5 alignments/read, M=20k transcripts, SingleQModel.

The benchmark spans the reference's full rsem-run-em window (EM.cpp:177-416):
  * 10 model-update rounds: conprb recompute + E-step + sufficient-stat
    scatter + host model refit      (reference: 31.9s of its 34.3s at 1t)
  * conprb freeze + device->host fetch + theta-loop layout build
  * the converged theta-only while_loop on device
  * the final expected-weight E-step (EM.cpp:460-478)
Parse is excluded on both sides and reported separately (see
tools/bench_ingest.py; reference parse = 11.18s on this host).

vs_baseline = ref_em_16t / our_em_warm, where ref_em_16t extrapolates the
measured 1-thread 34.28s via Amdahl's law fitted to the measured 1->2
thread speedup (1.952x => serial fraction 2.46%, S16 = 11.7x, 2.93s).
The old straight-linear extrapolation (2.14s) is reported alongside; both
flatter the reference (the measurement host has only 2 cores).

Timing: on the axon platform block_until_ready returns at dispatch;
every phase is closed with utils.jaxinit.sync() which forces real
execution (scalar fetch through the data dependency).

Cold vs warm: the whole EM span runs twice in-process; the second pass
reuses live jit executables (and, across processes, the persistent XLA
compilation cache — utils/jaxinit). The warm number is the headline;
cold (first-pass, includes compiles) is in detail.
"""

import json
import os
import time

import numpy as np

_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "tools",
                              "baseline_measured.json")


def _baseline():
    try:
        with open(_BASELINE_FILE) as f:
            d = json.load(f)
    except Exception:
        return None
    r1 = next(r for r in d["runs"] if r["threads"] == 1)
    r2 = next(r for r in d["runs"] if r["threads"] == 2)
    s2 = r1["total_sec"] / r2["total_sec"]
    # Amdahl: S2 = 1/(s + (1-s)/2)  =>  s = 2/S2 - 1
    serial = max(2.0 / s2 - 1.0, 0.0)
    s16 = 1.0 / (serial + (1.0 - serial) / 16.0)
    return {
        "ref_em_1t_sec": r1["total_sec"],
        "ref_em_2t_sec": r2["total_sec"],
        "ref_em_16t_amdahl_sec": r1["total_sec"] / s16,
        "ref_em_16t_linear_sec": r1["total_sec"] / 16.0,
        "ref_model_rounds_1t_sec": r1["model_rounds_sec"],
        "ref_theta_rounds_1t_sec": r1["theta_rounds_sec"],
        "ref_theta_reads_per_sec_16t_linear":
            d["ref_theta_reads_per_sec_16thread_linear_extrap"],
        "ref_parse_sec": d.get("parse_alignments_sec"),
        "amdahl_serial_fraction": serial,
    }


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rsem_tpu.utils.jaxinit import configure, fetch, fetch64, sync
    configure()

    from rsem_tpu.engine.em import EMConfig, run_em
    from rsem_tpu.testing import synthetic_arrays_fast

    n_reads = int(os.environ.get("RSEM_TPU_BENCH_NREADS", 1_000_000))
    M = int(os.environ.get("RSEM_TPU_BENCH_M", 20_000))
    ref, bundle, spec, model0 = synthetic_arrays_fast(
        n_reads=n_reads, M=M, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0,
    )
    kernel = os.environ.get("RSEM_TPU_BENCH_KERNEL", "auto")
    em_cfg = EMConfig(backend="device", fast_kernel=kernel)

    def one_pass():
        import copy
        model = copy.deepcopy(model0)
        t0 = time.perf_counter()
        res = run_em(model, ref, bundle, em_cfg, need_posteriors=False)
        # run_em's outputs are host arrays => the span is fully synced
        dt = time.perf_counter() - t0
        return dt, res

    cold_sec, res_cold = one_pass()
    warm_sec, res = one_pass()

    # steady-state theta-round throughput (the r01/r02 comparable number)
    from rsem_tpu.ops import (
        HitsDevice, KernelConfig, ReadsDevice, RefDevice,
        compute_log_conprb, compute_log_noise_conprb,
    )
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(res.model, m1.codes.shape[1])
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in res.model.device_arrays().items()}
    lcp_d = jax.jit(partial(compute_log_conprb, kcfg))(refd, m1, None, hd, dm)
    lnp_d = jax.jit(partial(compute_log_noise_conprb, kcfg))(m1, None, dm)
    sync(lcp_d, lnp_d)
    lcp = fetch(lcp_d)[: bundle.hits.n_hits]
    lnp = fetch(lnp_d)[: bundle.hits.n_reads]
    theta0 = jnp.full((M + 1,), 1.0 / (M + 1), dtype=jnp.float32)

    from rsem_tpu.ops import pallas_round as _pr
    use_pallas = (kernel == "pallas") or (
        kernel in ("auto",) and _pr.pallas_supported(M))
    if use_pallas:
        rdata = _pr.build_pallas_data(bundle.hits, lcp, lnp, M, 0.0)
        round_fn = jax.jit(lambda t, d: _pr.pallas_theta_round(t, d)[0])
    else:
        from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round
        rdata = build_fast_data(bundle.hits, lcp, lnp, M, 0.0)
        round_fn = jax.jit(lambda t, d: fast_theta_round(t, d)[0])
    th = round_fn(theta0, rdata)
    sync(th)
    iters = 50
    t0 = time.perf_counter()
    th = theta0
    for _ in range(iters):
        th = round_fn(th, rdata)
    sync(th)
    round_sec = (time.perf_counter() - t0) / iters
    reads_per_sec = n_reads / round_sec

    base = _baseline()
    vs = None
    if base:
        vs = base["ref_em_16t_amdahl_sec"] / warm_sec

    result = {
        "metric": (
            f"EM end-to-end wall-clock ({n_reads} reads, 2.5 aln/read, "
            f"M={M}; 10 model rounds + theta loop + final E-step)"
        ),
        "value": round(warm_sec, 3),
        "unit": "seconds",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {
            "em_end_to_end_warm_sec": round(warm_sec, 3),
            "em_end_to_end_cold_sec": round(cold_sec, 3),
            "em_rounds_total": int(res.rounds),
            "theta_round_sec": round(round_sec, 5),
            "theta_reads_per_sec": round(reads_per_sec),
            "theta_kernel": "pallas" if use_pallas else "xla",
            "n_hits": int(bundle.hits.n_hits),
            "reference": base,
            "vs_ref_1t": round(base["ref_em_1t_sec"] / warm_sec, 2) if base else None,
            "vs_ref_2t_measured": round(base["ref_em_2t_sec"] / warm_sec, 2) if base else None,
            "vs_ref_16t_linear": round(base["ref_em_16t_linear_sec"] / warm_sec, 2) if base else None,
            "baseline_source": (
                "measured: tools/baseline_measured.json (reference built + "
                "timed on this host at 1 and 2 threads; 16t = Amdahl fit "
                "to the measured 1->2 scaling, favors the reference)"
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
