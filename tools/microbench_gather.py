"""Microbench candidate gather/scatter strategies for the theta round.

Findings round 1: Pallas int indexing unsupported; "Only 2D gather is
supported" => try take_along_axis / 2D operand gathers; block shapes must
be (8k, 128m)-aligned.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 20_001
HI = 160  # ceil(20001/128) = 157 -> pad 160
N = 4 * 1024 * 1024


def timeit(fn, *args, iters=30, name=""):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:45s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:45s} {dt*1e3:9.3f} ms   ({N/dt/1e6:8.1f}M elem/s)")
    return out


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, M, dtype=jnp.int32)
    rng = np.random.default_rng(0)
    theta_np = rng.random(M).astype(np.float32)
    theta_pad = jnp.asarray(np.pad(theta_np, (0, HI * 128 - M)))
    theta_mat = theta_pad.reshape(HI, 128).T  # [128, HI]: mat[lo, hi]
    u = jax.random.uniform(key, (N,), dtype=jnp.float32)
    expected = theta_np[np.asarray(idx)]

    # ---- E: take_along_axis inside pallas ([R,128] rows select one lane) ----
    R = 256  # rows per tile; each row has its own index

    def kernel_e(hi_ref, w_ref, out_ref):
        # w_ref [R, HI], hi_ref [R, 128] (index broadcast in lane 0)
        w = w_ref[:]
        hi = hi_ref[:][:, :1]
        out_ref[:] = jnp.take_along_axis(w, hi, axis=1)

    # not a real use case; test only whether take_along_axis lowers + speed
    w_big = jax.random.uniform(key, (R, HI), dtype=jnp.float32)
    hi_big = jax.random.randint(key, (R, 128), 0, HI, dtype=jnp.int32)

    def pallas_e(hi_big, w_big):
        return pl.pallas_call(
            kernel_e,
            out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(hi_big, w_big)

    try:
        out = jax.jit(pallas_e)(hi_big, w_big)
        jax.block_until_ready(out)
        print("E. take_along_axis(axis=1) in pallas: OK")
    except Exception as e:
        print(f"E. take_along_axis(axis=1) in pallas FAILED: {str(e)[:160]}")

    # take_along_axis axis=0: gather rows of a [S,128] table by per-lane idx?
    def kernel_e0(idx_ref, tab_ref, out_ref):
        # tab [S,128], idx [8, 128] per-lane row indices -> out[i,l] = tab[idx[i,l], l]
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    S = 256
    tab = jax.random.uniform(key, (S, 128), dtype=jnp.float32)
    idx8 = jax.random.randint(key, (8, 128), 0, S, dtype=jnp.int32)

    def pallas_e0(idx8, tab):
        return pl.pallas_call(
            kernel_e0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx8, tab)

    try:
        out = jax.jit(pallas_e0)(idx8, tab)
        jax.block_until_ready(out)
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx8), axis=0)
        print(f"E0. take_along_axis(axis=0) in pallas: OK err="
              f"{np.abs(np.asarray(out)-want).max()}")
    except Exception as e:
        print(f"E0. take_along_axis(axis=0) in pallas FAILED: {str(e)[:160]}")

    # ---- F: full gather via take_along_axis(axis=0) on [S,128] table ----
    # table as [157,128] mat2[hi, lo]; value = mat2[hi[t], lo[t]].
    # Layout elements as [8,128] tiles: idx tile [8,128]. Gather rows by hi:
    # rows = take_along_axis(mat2, hi_tile, axis=0) gives [8,128] where
    # element (i,l) = mat2[hi[i,l], l] -- but we need column lo[i,l], not l.
    # So instead pre-shuffle elements on host so that element with lo=l sits
    # in lane l! Requires host-side regroup (static): hits sorted by lo lane.
    # Then value = take_along_axis(mat2_hi_by_lane) works directly.
    # Microbench: assume idx already lane-aligned: lo[i,l] = l.
    TT = 8 * 128

    def kernel_f(hi_ref, mat_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(mat_ref[:], hi_ref[:], axis=0)

    def pallas_f(hi_tiles, mat2):
        # hi_tiles [N/128 rows?, 128]; grid over row blocks of 512
        RB = 512
        grid = hi_tiles.shape[0] // RB
        return pl.pallas_call(
            kernel_f,
            out_shape=jax.ShapeDtypeStruct(hi_tiles.shape, jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(hi_tiles, mat2)

    mat2 = theta_pad.reshape(HI, 128)  # mat2[hi, lo]
    hi_lane = jax.random.randint(key, (N // 128, 128), 0, HI, dtype=jnp.int32)
    out = timeit(jax.jit(pallas_f), hi_lane, mat2,
                 name="F. pallas take_along_axis rows (lane-aligned)")
    if out is not None:
        want = np.asarray(mat2)[np.asarray(hi_lane),
                                np.arange(128)[None, :].repeat(N // 128, 0)]
        print(f"    max err {np.abs(np.asarray(out) - want).max():.2e}  "
              f"(requires host lane-alignment of hits)")

    # ---- B fixed: one-hot matmul, (8,TB)-blocks ----
    TB = 1024
    RB = 8  # rows of TB per block

    def kernel_b(idx_ref, mat_ref, out_ref):
        sid = idx_ref[:].reshape(RB * TB)
        lo = (sid & 127)[:, None]
        hi = (sid >> 7)[:, None]
        li = jax.lax.broadcasted_iota(jnp.int32, (RB * TB, 128), 1)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (RB * TB, HI), 1)
        oh_lo = (li == lo).astype(jnp.bfloat16)
        mat = mat_ref[:]
        mhi = mat.astype(jnp.bfloat16)
        mlo = (mat - mhi.astype(jnp.float32)).astype(jnp.bfloat16)
        w = jax.lax.dot_general(
            oh_lo, mhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            oh_lo, mlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        val = jnp.sum(jnp.where(hi_iota == hi, w, 0.0), axis=1)
        out_ref[:] = val.reshape(RB, TB)

    def pallas_b(idx, mat):
        idx2 = idx.reshape(-1, TB)
        grid = idx2.shape[0] // RB
        return pl.pallas_call(
            kernel_b,
            out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((RB, TB), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, TB), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(idx2, mat)

    out = timeit(jax.jit(pallas_b), idx, theta_mat,
                 name="B. pallas onehot matmul bf16x2")
    if out is not None:
        err = np.abs(np.asarray(out).ravel() - expected).max()
        print(f"    max err {err:.3e} rel {err/np.abs(expected).max():.2e}")

    # ---- D fixed: scatter via onehot^T matmul ----
    def kernel_d(idx_ref, u_ref, out_ref):
        sid = idx_ref[:].reshape(RB * TB)
        uv = u_ref[:].reshape(RB * TB)
        lo = (sid & 127)[:, None]
        hi = (sid >> 7)[:, None]
        li = jax.lax.broadcasted_iota(jnp.int32, (RB * TB, 128), 1)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (RB * TB, HI), 1)
        oh_hi = (hi_iota == hi).astype(jnp.bfloat16)
        u_lo = jnp.where(li == lo, uv[:, None], 0.0)
        u16 = u_lo.astype(jnp.bfloat16)
        ur = (u_lo - u16.astype(jnp.float32)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            u16, oh_hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ur, oh_hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += part

    def pallas_d(idx, u):
        idx2 = idx.reshape(-1, TB)
        u2 = u.reshape(-1, TB)
        grid = idx2.shape[0] // RB
        return pl.pallas_call(
            kernel_d,
            out_shape=jax.ShapeDtypeStruct((128, HI), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((RB, TB), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, TB), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, HI), lambda i: (0, 0), memory_space=pltpu.VMEM),
        )(idx2, u2)

    out = timeit(jax.jit(pallas_d), idx, u, name="D. pallas scatter matmul bf16x2")
    if out is not None:
        got = np.asarray(out).T.ravel()[:M]
        want = np.zeros(M)
        np.add.at(want, np.asarray(idx), np.asarray(u).astype(np.float64))
        err = np.abs(got - want).max()
        print(f"    max err {err:.3e} rel {err/want.max():.2e}")

    # ---- G: scatter via sort-free lane accumulation? skip. ----


if __name__ == "__main__":
    main()
