"""Parity of the precomputed-index conprb/suffstats paths and the one-hot
MXU scatter against their direct formulations (see ops/conprb.PreIdx and
ops/estep.onehot_scatter — the round-3 model-round fast path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsem_tpu.ops import (
    HitsDevice,
    KernelConfig,
    ReadsDevice,
    RefDevice,
    compute_log_conprb,
)
from rsem_tpu.ops.conprb import precompute_profile_indices, preidx_bytes
from rsem_tpu.ops.estep import estep_fracs, onehot_scatter, suffstats
from rsem_tpu.testing import synthetic_arrays_fast


@pytest.mark.parametrize("size", [7, 129, 2500, 20001])
def test_onehot_scatter_matches_scatter_add(size):
    rng = np.random.default_rng(size)
    n = 10_000
    flat = rng.integers(0, size, size=n).astype(np.int32)
    w = rng.random(n, dtype=np.float32)
    # padding lanes must contribute zero
    w[-5:] = 0.0
    got = np.asarray(onehot_scatter(jnp.asarray(flat), jnp.asarray(w), size))
    want = np.zeros(size, dtype=np.float64)
    np.add.at(want, flat, w.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("paired", [False, True])
def test_conprb_and_suffstats_with_preidx_match(paired):
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=400, M=60, read_len=36, tx_len=400,
        paired=paired, has_qual=True, mean_extra_hits=1.0, seed=3,
    )
    refd = RefDevice.from_reference(ref)
    if paired:
        m1 = ReadsDevice.from_arrays(bundle.reads.mate1)
        m2 = ReadsDevice.from_arrays(bundle.reads.mate2)
    else:
        m1 = ReadsDevice.from_arrays(bundle.reads)
        m2 = None
    hd = HitsDevice.from_arrays(bundle.hits)
    maxL = m1.codes.shape[1] if m2 is None else max(
        m1.codes.shape[1], m2.codes.shape[1])
    if m2 is not None and m1.codes.shape[1] != m2.codes.shape[1]:
        padL = maxL - m2.codes.shape[1]
        m2 = m2._replace(codes=jnp.pad(m2.codes, ((0, 0), (0, padL))),
                         quals=jnp.pad(m2.quals, ((0, 0), (0, padL))))
        padL1 = maxL - m1.codes.shape[1]
        m1 = m1._replace(codes=jnp.pad(m1.codes, ((0, 0), (0, padL1))),
                         quals=jnp.pad(m1.quals, ((0, 0), (0, padL1))))
    kcfg = KernelConfig.from_model(model, maxL)
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model.device_arrays().items()}

    pre = jax.jit(lambda r, a, b, h: precompute_profile_indices(
        kcfg, r, a, b, h))(refd, m1, m2, hd)
    assert preidx_bytes(kcfg, int(hd.rid.shape[0])) > 0

    lcp_direct = compute_log_conprb(kcfg, refd, m1, m2, hd, dm)
    lcp_pre = compute_log_conprb(kcfg, refd, m1, m2, hd, dm, pre=pre)
    np.testing.assert_allclose(
        np.asarray(lcp_pre), np.asarray(lcp_direct), rtol=1e-6, atol=1e-5
    )

    n_reads = m1.lens.shape[0]
    M = ref.M
    lt = jnp.full((M + 1,), -np.log(M + 1), jnp.float32)
    lnp = jnp.zeros((n_reads,), jnp.float32)
    out = estep_fracs(lt, hd.sid, hd.rid, lcp_direct, lnp, n_reads, M)
    s_direct = suffstats(kcfg, refd, m1, m2, hd, out.frac_hit,
                         out.frac_noise, dm, float(spec.probF))
    s_pre = suffstats(kcfg, refd, m1, m2, hd, out.frac_hit, out.frac_noise,
                      dm, float(spec.probF), pre=pre)
    assert set(s_pre) == set(s_direct)
    for k in s_direct:
        np.testing.assert_allclose(
            np.asarray(s_pre[k]), np.asarray(s_direct[k]),
            rtol=2e-5, atol=1e-4, err_msg=k,
        )


def test_pallas_table_kernels_interpret_parity():
    """VMEM-table gather-sum / scatter-add vs their XLA formulations
    (interpret mode; compiled parity is exercised on the TPU bench)."""
    from rsem_tpu.ops import pallas_table as pt

    rng = np.random.default_rng(7)
    size = 900  # no-qual-style table, t_pad 8
    X = 64
    flat = rng.integers(0, size + 1, size=(X, 128)).astype(np.int32)
    table_vals = rng.normal(-3.0, 1.0, size).astype(np.float32)
    t_pad = pt.table_rows_padded(size)
    table = np.zeros(t_pad * 128, dtype=np.float32)
    table[:size] = table_vals
    got = np.asarray(pt.gather_sum(
        jnp.asarray(table).reshape(t_pad, 128), jnp.asarray(flat),
        interpret=True,
    ))
    want = table[flat].sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-4)

    w = rng.random(X, dtype=np.float32)
    got_s = np.asarray(pt.scatter_add(
        jnp.asarray(flat), jnp.asarray(w), size, interpret=True,
    ))
    want_s = np.zeros(t_pad * 128)
    np.add.at(want_s, flat.reshape(-1),
              np.repeat(w, 128).astype(np.float64))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=1e-5)


def test_pallas_table_kernels_compiled_parity():
    """COMPILED-mode parity for the VMEM-table kernels, gated on a real TPU
    backend (advisor r3: a Mosaic lowering bug would otherwise ship with
    only the timing bench exercising the compiled path). Also covers the
    internal trailing-row padding (X not a ROWS multiple)."""
    import jax

    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("compiled Mosaic path needs a TPU backend")
    from rsem_tpu.ops import pallas_table as pt

    rng = np.random.default_rng(11)
    size = 1025
    X = 1500  # deliberately not a multiple of ROWS/SCATTER_ROWS
    flat = rng.integers(0, size + 1, size=(X, 128)).astype(np.int32)
    table_vals = rng.normal(-3.0, 1.0, size).astype(np.float32)
    t_pad = pt.table_rows_padded(size)
    table = np.zeros(t_pad * 128, dtype=np.float32)
    table[:size] = table_vals
    got = np.asarray(pt.gather_sum(
        jnp.asarray(table).reshape(t_pad, 128), jnp.asarray(flat),
    ))
    want = table[flat].sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3)

    w = rng.random(X, dtype=np.float32)
    got_s = np.asarray(pt.scatter_add(
        jnp.asarray(flat), jnp.asarray(w), size,
    ))
    want_s = np.zeros(t_pad * 128)
    np.add.at(want_s, flat.reshape(-1),
              np.repeat(w, 128).astype(np.float64))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("read_len", [36, 100])
def test_fused_windowed_preidx_matches_eager(paired, read_len):
    """The one-program windowed PreIdx builder (r5 fast path) must produce
    bit-identical index tiles to the op-by-op eager builder."""
    from rsem_tpu.ops.conprb import (
        precompute_profile_indices_eager,
        precompute_profile_indices_fused,
    )

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=300, M=40, read_len=read_len, tx_len=5 * read_len,
        paired=paired, has_qual=True, mean_extra_hits=1.3, seed=9,
    )
    refd = RefDevice.from_reference(ref)
    if paired:
        m1 = ReadsDevice.from_arrays(bundle.reads.mate1)
        m2 = ReadsDevice.from_arrays(bundle.reads.mate2)
        maxL = max(m1.codes.shape[1], m2.codes.shape[1])
        if m1.codes.shape[1] != maxL:
            p = maxL - m1.codes.shape[1]
            m1 = m1._replace(codes=jnp.pad(m1.codes, ((0, 0), (0, p))),
                             quals=jnp.pad(m1.quals, ((0, 0), (0, p))))
        if m2.codes.shape[1] != maxL:
            p = maxL - m2.codes.shape[1]
            m2 = m2._replace(codes=jnp.pad(m2.codes, ((0, 0), (0, p))),
                             quals=jnp.pad(m2.quals, ((0, 0), (0, p))))
    else:
        m1 = ReadsDevice.from_arrays(bundle.reads)
        m2 = None
        maxL = m1.codes.shape[1]
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, maxL)

    pre_e = precompute_profile_indices_eager(kcfg, refd, m1, m2, hd)
    pre_f = precompute_profile_indices_fused(kcfg, refd, m1, m2, hd)
    np.testing.assert_array_equal(np.asarray(pre_f.flat1),
                                  np.asarray(pre_e.flat1))
    np.testing.assert_array_equal(np.asarray(pre_f.nflat1),
                                  np.asarray(pre_e.nflat1))
    if paired:
        np.testing.assert_array_equal(np.asarray(pre_f.flat2),
                                      np.asarray(pre_e.flat2))
        np.testing.assert_array_equal(np.asarray(pre_f.nflat2),
                                      np.asarray(pre_e.nflat2))
