"""Tile-size sweep for the pallas_table gather-sum/scatter-add kernels on
the real chip: the r3 kernels ran ROWS=8 tiles (320k grid steps at bench
scale) — measure whether grid overhead dominates and pick ROWS."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rsem_tpu.utils.jaxinit import configure, sync
    configure()

    H = 2_560_000  # padded hits at bench scale
    TPAD = 20      # 2500-slot profile table
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.integers(0, 2500, size=(H, 128), dtype=np.int32))
    table = jnp.asarray(rng.random((TPAD, 128), dtype=np.float32))
    w = jnp.asarray(rng.random((H,), dtype=np.float32))
    sync(flat, table, w)

    def timeit(name, fn, *args, iters=5):
        out = fn(*args); sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        rate = H * 128 / dt / 1e9
        print(f"{name:34s} {dt*1e3:8.2f} ms  {rate:7.1f} Gelem/s", flush=True)

    # ---- gather-sum variants -------------------------------------------
    def gather_kernel(flat_ref, table_ref, out_ref, *, t_rows, rows):
        f = flat_ref[:]
        hi = jax.lax.shift_right_logical(f, jnp.int32(7))
        lo = jax.lax.bitwise_and(f, jnp.int32(127))

        def g_body(t, g):
            row = table_ref[pl.ds(t, 1), :]
            rowb = jnp.broadcast_to(row, (rows, 128))
            v = jnp.take_along_axis(rowb, lo, axis=1)
            return jnp.where(hi == t, v, g)

        g = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_rows), g_body,
                              jnp.zeros((rows, 128), jnp.float32))
        out_ref[:] = jnp.sum(g, axis=1, keepdims=True)

    def gather(rows, fl, tb):
        n_tiles = fl.shape[0] // rows
        out = pl.pallas_call(
            partial(gather_kernel, t_rows=TPAD, rows=rows),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                      pl.BlockSpec((TPAD, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((fl.shape[0], 1), jnp.float32),
        )(fl, tb)
        return out[:, 0]

    for rows in (8, 64, 256, 512):
        timeit(f"gather scan rows={rows}", jax.jit(partial(gather, rows)),
               flat, table)

    # gather via one-hot matmul row-select + single lane shuffle
    def gather_mm_kernel(flat_ref, table_ref, out_ref, *, t_rows, rows):
        f = flat_ref[:]
        hi = jax.lax.shift_right_logical(f, jnp.int32(7))
        lo = jax.lax.bitwise_and(f, jnp.int32(127))
        acc = jnp.zeros((rows, 1), jnp.float32)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (128, t_rows), 1)
        for r0 in range(0, rows, 128):
            hi_b = hi[r0:r0 + 128, :]
            lo_b = lo[r0:r0 + 128, :]
            # P[s, t] built per 128-slot sub-row group is wrong shape; do
            # row-of-reads at a time: G[c, l] for one row r
            # simpler: per sublane row r in this 128-row block:
            # use matmul P (128x t_rows) @ table -> rowsel per lane-col c
            # P[c, t] = (hi[r, c] == t)
            for r in range(128):
                P = (hi_b[r:r + 1, :].reshape(128, 1) == iota_t[:1].reshape(1, t_rows)).astype(jnp.float32)
                G = jax.lax.dot_general(
                    P, table_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                v = jnp.take_along_axis(G, lo_b[r:r + 1, :].reshape(128, 1),
                                        axis=1)
                acc = acc.at[r0 + r, 0].set(jnp.sum(v))
        out_ref[:] = acc

    # (matmul variant is O(rows*128) tiny matmuls — skip unless scan is bad)

    # ---- scatter variants ----------------------------------------------
    def scatter_kernel(flat_ref, w_ref, out_ref, acc_ref, *, t_pad, rows):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        f = flat_ref[:]
        hi = jax.lax.shift_right_logical(f, jnp.int32(7))
        lo = jax.lax.bitwise_and(f, jnp.int32(127))
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 128), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        upd = jnp.zeros((t_pad, 128), jnp.float32)
        for r in range(rows):
            a = jnp.where(iota_t == hi[r:r + 1, :], w_ref[r, 0], 0.0)
            b = (iota_l == lo[r:r + 1, :]).astype(jnp.float32)
            upd = upd + jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + upd

        @pl.when(i == pl.num_programs(0) - 1)
        def _flush():
            out_ref[:] = acc_ref[:]

    def scatter(rows, fl, ww):
        n_tiles = fl.shape[0] // rows
        return pl.pallas_call(
            partial(scatter_kernel, t_pad=TPAD, rows=rows),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                      pl.BlockSpec((rows, 1), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((TPAD, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TPAD, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TPAD, 128), jnp.float32)],
        )(fl, ww.reshape(-1, 1))

    for rows in (8, 32, 64):
        timeit(f"scatter perrow-mm rows={rows}",
               jax.jit(partial(scatter, rows)), flat, w)

    # scatter via lane-one-hot matmul pair: contract over SLOTS once per
    # tile: A[t, s] = w*[hi==t] ([t_pad, rows*128]? needs flatten) — try
    # 2-matmul form per 8-sublane group to keep plain 2D shapes:
    def scatter_grp_kernel(flat_ref, w_ref, out_ref, acc_ref,
                           *, t_pad, rows):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        f = flat_ref[:]
        hi = jax.lax.shift_right_logical(f, jnp.int32(7))
        lo = jax.lax.bitwise_and(f, jnp.int32(127))
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        wv = w_ref[:]  # [rows, 1]
        # B[l, c-block] one-hot of lo built row-group-wise; contract via
        # t_pad-row masked adds: for each table row t, the contribution to
        # acc[t, l] is sum_c w[r]*[hi==t][r,c]*[lo==l][r,c]
        upd = jnp.zeros((t_pad, 128), jnp.float32)
        for r in range(rows):
            wmask = jnp.where(iota_l == lo[r:r + 1, :], wv[r, 0], 0.0)  # [128l? no]
            # wmask[l, c] = w if lo[r, c] == l
            a = (hi[r:r + 1, :] == jax.lax.broadcasted_iota(
                jnp.int32, (t_pad, 128), 0)).astype(jnp.float32)
            upd = upd + jax.lax.dot_general(
                a, wmask, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + upd

        @pl.when(i == pl.num_programs(0) - 1)
        def _flush():
            out_ref[:] = acc_ref[:]

    # correctness spot-check for gather at rows=256
    g8 = jax.jit(partial(gather, 8))(flat[:4096], table)
    g256 = jax.jit(partial(gather, 256))(flat[:4096], table)
    ref = np.asarray(table).reshape(-1)[np.asarray(flat[:4096])].sum(1)
    print("gather parity 8 vs ref:", np.allclose(np.asarray(g8), ref, rtol=1e-5, atol=1e-4),
          " 256 vs ref:", np.allclose(np.asarray(g256), ref, rtol=1e-5, atol=1e-4), flush=True)


if __name__ == "__main__":
    main()
