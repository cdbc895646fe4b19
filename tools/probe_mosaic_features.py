"""Probe Mosaic/interpret features needed by the fused Gibbs sweep kernel:
1. pltpu.prng_seed/prng_random_bits (compiled + interpret)
2. jax.lax.fori_loop with DYNAMIC (SMEM-scalar) bounds
3. dynamic single-row read-modify-write on a VMEM ref
4. sublane (axis=0) masked reduction
Run: JAX_PLATFORMS=cpu python tools/probe_mosaic_features.py  (interpret)
     python tools/probe_mosaic_features.py                     (tpu)
"""
import os
import sys

import jax

if os.environ.get("PROBE_CPU") == "1":
    # ambient env pins JAX_PLATFORMS=tpu and ignores env overrides
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"
print("backend:", jax.default_backend(), "interpret:", INTERPRET)


def _mix32(h):
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(16)))
    h = h * jnp.int32(-2048144789)
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(13)))
    h = h * jnp.int32(-1028477387)
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(16)))
    return h


def kern(seed_ref, lohi_ref, x_ref, out_ref, rnd_ref, tbl_ref):
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    h = _mix32(seed_ref[0] + i * jnp.int32(0x7F4A7C15))
    k1 = h + rowi * jnp.int32(128) + lane
    u = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(_mix32(_mix32(k1)), jnp.int32(7)),
        jnp.int32(0xFFFFFF),
    ).astype(jnp.float32) * (1.0 / (1 << 24))
    rnd_ref[:] = u

    @pl.when(i == 0)
    def _():
        tbl_ref[:] = jnp.zeros_like(tbl_ref)

    lo = lohi_ref[0]
    hi = lohi_ref[1]

    def body(t, acc):
        row = tbl_ref[pl.ds(t, 1), :]
        # dynamic row read-modify-write
        tbl_ref[pl.ds(t, 1), :] = row + jnp.sum(
            jnp.where(x_ref[:] > 0.5, x_ref[:], 0.0), axis=0, keepdims=True
        )
        return acc + jnp.sum(row)

    acc = jax.lax.fori_loop(lo, hi, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


def main():
    x = np.random.default_rng(0).random((16, 128)).astype(np.float32)
    seed = np.array([42], dtype=np.int32)
    lohi = np.array([1, 5], dtype=np.int32)
    out, rnd, tbl = pl.pallas_call(
        kern,
        grid=(2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((16, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(seed, lohi, x)
    out, rnd, tbl = map(np.asarray, (out, rnd, tbl))
    print("out:", out.ravel()[:2])
    print("rnd mean (expect ~0.5):", rnd.mean(), "min", rnd.min(), "max",
          rnd.max())
    print("tbl rows 1..4 sum (expect >0):", tbl[1:5].sum(), "row0:",
          tbl[0].sum(), "rows5+:", tbl[5:].sum())
    assert 0.3 < rnd.mean() < 0.7
    assert tbl[1:5].sum() > 0 and tbl[0].sum() == 0 and tbl[5:].sum() == 0
    print("PROBE OK")


if __name__ == "__main__":
    main()
