"""Benchmark: EM hot-loop throughput on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload mirrors the reference's hot path (EM.cpp E_STEP over cached
conprbs): a theta-only EM round = segment softmax over all alignments +
expected-count scatter + renormalize, on 1M single-end reads with ~2.5
alignments each against a 20k-transcript reference.

vs_baseline compares against 16-thread CPU RSEM's E-step round throughput.
The reference publishes no numbers; the constant below is a provisional
estimate (reads/sec for cached-conprb rounds on a 16-core CPU) to be replaced
by a measured number once the reference binaries are built and timed in this
environment (see BASELINE.md).
"""

import json
import time

import numpy as np

# provisional: 16-thread CPU RSEM cached-conprb E-step round throughput
REF_CPU_READS_PER_SEC = 40e6


def main():
    import jax
    import jax.numpy as jnp

    from functools import partial

    from rsem_tpu.ops import (
        HitsDevice,
        KernelConfig,
        ReadsDevice,
        RefDevice,
        compute_log_conprb,
        compute_log_noise_conprb,
    )
    from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round
    from rsem_tpu.testing import synthetic_arrays_fast

    n_reads = 1_000_000
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=n_reads, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0,
    )

    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dev_model = {
        k: jnp.asarray(v, dtype=jnp.float32) for k, v in model.device_arrays().items()
    }
    M = ref.M

    conprb_fn = jax.jit(partial(compute_log_conprb, kcfg))
    ncp_fn = jax.jit(partial(compute_log_noise_conprb, kcfg))

    # compile first, then time the steady-state conprb pass (the hot op of
    # the 10 model-update rounds)
    log_conprb = conprb_fn(refd, m1, None, hd, dev_model)
    log_ncp = ncp_fn(m1, None, dev_model)
    jax.block_until_ready((log_conprb, log_ncp))
    t0 = time.perf_counter()
    log_conprb = conprb_fn(refd, m1, None, hd, dev_model)
    jax.block_until_ready(log_conprb)
    conprb_time = time.perf_counter() - t0

    fdata = build_fast_data(
        bundle.hits,
        np.asarray(log_conprb, dtype=np.float64)[: bundle.hits.n_hits],
        np.asarray(log_ncp, dtype=np.float64)[: bundle.hits.n_reads],
        M,
        0.0,
    )

    @jax.jit
    def k_rounds(theta, k):
        def body(_, th):
            th, _counts = fast_theta_round(th, fdata)
            return th
        return jax.lax.fori_loop(0, k, body, theta)

    theta0 = jnp.asarray(np.full(M + 1, 1.0 / (M + 1)), dtype=jnp.float32)
    # warmup/compile
    jax.block_until_ready(k_rounds(theta0, 2))

    iters = 50
    t0 = time.perf_counter()
    out = k_rounds(theta0, iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    iters_per_sec = iters / dt
    reads_per_sec = n_reads * iters_per_sec
    result = {
        "metric": "EM theta-round reads/sec/chip (1M reads, 2.5 aln/read, M=20k)",
        "value": round(reads_per_sec),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / REF_CPU_READS_PER_SEC, 3),
        "detail": {
            "iterations_per_sec": round(iters_per_sec, 2),
            "n_hits": int(bundle.hits.n_hits),
            "conprb_pass_sec": round(conprb_time, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
