"""Attribute the Gibbs sweep milliseconds on the real chip: time one
segment (warm) and ablated variants of the per-block step."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rsem_tpu.utils.jaxinit import configure, sync
    configure()
    sync(jnp.zeros(8) + 1)
    print("attached", flush=True)

    from rsem_tpu.engine.gibbs import GibbsConfig, GibbsData, run_gibbs
    from rsem_tpu.refprep.transcripts import GroupInfo
    from rsem_tpu.testing import synthetic_arrays_fast
    from rsem_tpu.engine.em import EMConfig, run_em

    ref, bundle, spec, model0 = synthetic_arrays_fast(
        n_reads=1_000_000, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    import copy
    res = run_em(copy.deepcopy(model0), ref, bundle,
                 EMConfig(backend="device"), need_posteriors=True)
    print("EM done", flush=True)
    M = ref.M
    gi = GroupInfo(np.arange(1, M + 2))
    eel = res.model.calc_eel()

    data = GibbsData(bundle.hits, res.log_conprb, res.log_ncp, M)
    print("buckets:", [(b[0].shape, ) for b in data.buckets], flush=True)

    # time run_gibbs at a few sweep counts to separate compile from steady
    for burnin, nsamples in ((8, 8), (58, 8)):
        t0 = time.perf_counter()
        run_gibbs(bundle.hits, res.log_conprb, res.log_ncp, M,
                  bundle.cnt.N0, eel, res.model.mw, gi,
                  GibbsConfig(burnin=burnin, nsamples=nsamples, gap=1,
                              n_chains=8, seed=0,
                              keep_countvectors=False))
        dt = time.perf_counter() - t0
        sweeps = burnin + nsamples // 8
        print(f"gibbs burnin={burnin:3d}: {dt:7.1f}s "
              f"({sweeps} sweeps)", flush=True)
    # delta of the two runs = 50 extra sweeps at steady state
    print("steady ms/sweep = (t2-t1)/50*1000", flush=True)


if __name__ == "__main__":
    main()
