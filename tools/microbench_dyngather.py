"""Test Mosaic tpu.dynamic_gather primitives: support + speed.

T1: take_along_axis axis=1 on [R,128] (per-row lane shuffle)
T2: take_along_axis axis=0 on [160,128] and [8,128] (sublane gather)
T3: in-kernel transpose [160,128]
T4: full static within-supertile permutation via G0/G1 composition
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4 * 1024 * 1024


def timeit(fn, *args, iters=50, name="", elems=N):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:52s} FAILED: {type(e).__name__}: {msg}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:9.3f} ms   ({elems/dt/1e6:8.1f}M elem/s)")
    return out


def main():
    key = jax.random.PRNGKey(0)
    R = 512

    # ---- T1: axis=1 lane shuffle, [R,128] grid over big array ----
    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jax.random.uniform(key, (N // 128, 128), dtype=jnp.float32)
    idx1 = jax.random.randint(key, (N // 128, 128), 0, 128, dtype=jnp.int32)

    def t1(x, idx):
        grid = x.shape[0] // R
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x, idx)

    out = timeit(jax.jit(t1), x, idx1, name="T1 axis=1 lane shuffle [512,128] tiles")
    if out is not None:
        want = np.take_along_axis(np.asarray(x), np.asarray(idx1), axis=1)
        print(f"    err {np.abs(np.asarray(out)-want).max()}")

    # ---- T2a: axis=0 sublane gather [8,128] tiles (within native tile) ----
    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    idx2 = jax.random.randint(key, (N // 128, 128), 0, 8, dtype=jnp.int32)

    def t2a(x, idx):
        grid = x.shape[0] // 8
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x, idx2)

    out = timeit(jax.jit(t2a), x, idx2, name="T2a axis=0 sublane gather [8,128] tiles")
    if out is not None:
        xa = np.asarray(x).reshape(-1, 8, 128)
        ia = np.asarray(idx2).reshape(-1, 8, 128)
        want = np.take_along_axis(xa, ia, axis=1).reshape(-1, 128)
        print(f"    err {np.abs(np.asarray(out)-want).max()}")

    # ---- T2b: axis=0 on [160,128] blocks (crosses native tiles) ----
    idx2b = jax.random.randint(key, (N // 128, 128), 0, 160, dtype=jnp.int32)

    def t2b(x, idx):
        grid = x.shape[0] // 160
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((160, 128), lambda i: (0o0 * 0 + i, 0), memory_space=pltpu.VMEM),
        )(x, idx)

    # pad rows to multiple of 160
    rows160 = (x.shape[0] // 160) * 160
    out = timeit(jax.jit(t2b), x[:rows160], idx2b[:rows160],
                 name="T2b axis=0 sublane gather [160,128] blocks",
                 elems=rows160 * 128)
    if out is not None:
        xa = np.asarray(x[:rows160]).reshape(-1, 160, 128)
        ia = np.asarray(idx2b[:rows160]).reshape(-1, 160, 128)
        want = np.take_along_axis(xa, ia, axis=1).reshape(-1, 128)
        print(f"    err {np.abs(np.asarray(out)-want).max()}")

    # ---- T3: transpose [160,128] -> [128,160] inside kernel ----
    def k3(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    def t3(x):
        grid = x.shape[0] // 160
        return pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((128, x.shape[0] // 160 * 160 // 160 * 160), jnp.float32)
            if False else jax.ShapeDtypeStruct((grid * 128, 160), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 160), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x)

    out = timeit(jax.jit(t3), x[:rows160], name="T3 transpose [160,128] per tile",
                 elems=rows160 * 128)
    if out is not None:
        xa = np.asarray(x[:rows160]).reshape(-1, 160, 128)
        want = np.transpose(xa, (0, 2, 1)).reshape(-1, 160)
        print(f"    err {np.abs(np.asarray(out)-want).max()}")

    # ---- T4: theta-gather via 2-step supertile (hi-grouped layout) ----
    # mat2 [160,128] table; hits grouped so hi constant per row.
    M = 20001
    HI = 160
    theta_np = np.random.default_rng(0).random(M).astype(np.float32)
    mat2 = jnp.asarray(np.pad(theta_np, (0, HI * 128 - M)).reshape(HI, 128))
    # build hi-grouped indices: row i of each supertile has hi = hi_row[i]
    hi_row = jax.random.randint(key, (rows160 // 160, 160), 0, 157, dtype=jnp.int32)
    hi_full = jnp.repeat(hi_row.reshape(-1, 1), 128, axis=1)  # [rows,128]
    lo_full = jax.random.randint(key, (rows160, 128), 0, 128, dtype=jnp.int32)

    def k4(hi_ref, lo_ref, mat_ref, o_ref):
        rows = jnp.take_along_axis(mat_ref[:], hi_ref[:] * 0 + hi_ref[:], axis=0) \
            if False else jnp.take_along_axis(
                jnp.broadcast_to(mat_ref[:], (160, 128)), hi_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(rows, lo_ref[:], axis=1)

    def t4(hi_full, lo_full, mat2):
        grid = hi_full.shape[0] // 160
        return pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct(hi_full.shape, jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((160, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(hi_full, lo_full, mat2)

    out = timeit(jax.jit(t4), hi_full, lo_full, mat2,
                 name="T4 2-step supertile theta gather (hi-grouped)",
                 elems=rows160 * 128)
    if out is not None:
        hi_a = np.asarray(hi_full)
        lo_a = np.asarray(lo_full)
        full = np.pad(theta_np, (0, HI * 128 - M)).reshape(HI, 128)
        want = full[hi_a, lo_a]
        print(f"    err {np.abs(np.asarray(out)-want).max()}")


if __name__ == "__main__":
    main()
