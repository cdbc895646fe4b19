"""Native C++ suffstats vs the JAX reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from rsem_tpu.native import get_lib, native_suffstats
from rsem_tpu.ops import (
    HitsDevice,
    KernelConfig,
    ReadsDevice,
    RefDevice,
    compute_log_conprb,
    compute_log_noise_conprb,
)
from rsem_tpu.ops.estep import estep_fracs, suffstats
from rsem_tpu.testing import synthetic_dataset

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


@pytest.mark.parametrize("paired,has_qual,est_rspd", [
    (False, True, False),
    (False, False, True),
    (True, True, True),
])
def test_native_matches_jax(paired, has_qual, est_rspd):
    from dataclasses import replace

    ref, bundle, spec, model = synthetic_dataset(
        n_reads=300, M=10, read_len=40, tx_len=400, paired=paired,
        has_qual=has_qual, seed=3,
    )
    if est_rspd:
        spec = replace(spec, est_rspd=True)
        from rsem_tpu.model.generative import GenerativeModel

        model2 = GenerativeModel(spec, ref)
        model2.estimate_from_stats(bundle.stats)
        model = model2

    refd = RefDevice.from_reference(ref)
    if paired:
        m1 = ReadsDevice.from_arrays(bundle.reads.mate1)
        m2 = ReadsDevice.from_arrays(bundle.reads.mate2)
    else:
        m1, m2 = ReadsDevice.from_arrays(bundle.reads), None
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dev = {
        k: jnp.asarray(v, dtype=jnp.float32) for k, v in model.device_arrays().items()
    }
    lcp = compute_log_conprb(kcfg, refd, m1, m2, hd, dev)
    lnp_ = compute_log_noise_conprb(kcfg, m1, m2, dev)
    lt = jnp.asarray(np.log(np.full(ref.M + 1, 1.0 / (ref.M + 1))), jnp.float32)
    out = estep_fracs(lt, hd.sid, hd.rid, lcp, lnp_, m1.lens.shape[0], ref.M)

    jax_suff = suffstats(
        kcfg, refd, m1, m2, hd, out.frac_hit, out.frac_noise, dev,
        float(spec.probF),
    )
    nat = native_suffstats(
        bundle.hits,
        np.asarray(out.frac_hit)[: bundle.hits.n_hits],
        np.asarray(out.frac_noise)[: bundle.reads.n],
        bundle.reads, ref, model,
    )
    assert nat is not None
    np.testing.assert_allclose(
        nat["pro"], np.asarray(jax_suff["pro"], dtype=np.float64),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        nat["npro"], np.asarray(jax_suff["npro"], dtype=np.float64),
        rtol=1e-4, atol=1e-5,
    )
    if paired:
        np.testing.assert_allclose(
            nat["gld"], np.asarray(jax_suff["gld"], dtype=np.float64),
            rtol=1e-4, atol=1e-5,
        )
    if est_rspd and (paired or spec.probF >= 0.1):
        np.testing.assert_allclose(
            nat["rspd"], np.asarray(jax_suff["rspd"], dtype=np.float64),
            rtol=1e-3, atol=1e-4,
        )
