"""Fused Pallas TPU kernels for small-table gather-sum / scatter-add.

The model-update rounds' profile work is 250M (hit, position) lookups into
a ~2.5k-entry table per pass (reference: the getProb/update loops of
SingleModel.h:95-146,163-209). The XLA formulations run ~100x over the HBM
roofline: the widened-row gather moves ~2.7 ns/element and the one-hot MXU
contraction materializes its [S, 128] one-hot factor through HBM. Keeping
the table resident in VMEM removes both:

  * gather-sum: per [R, 128] index tile, scan the [t_pad, 128] table rows
    (broadcast + per-lane shuffle + masked select — pallas_round's theta
    "gather"), then reduce each row's 128 positional values to the per-hit
    sum in-register. HBM traffic = the index stream alone.
  * scatter-add: per tile, one-hot MXU contraction
    acc[t, l] += sum_s w * (hi == t) * (lo == l) with the one-hot factors
    built by iota compares in VMEM (pallas_round's count "scatter"),
    accumulated across the sequential grid with Kahan compensation.

Index layout contract (ops/conprb.PreIdx): [rows, 128] int32 where invalid
lanes carry a SENTINEL slot = the first padding slot of the table. The
table is zero-padded to t_pad*128, so sentinel gathers contribute 0 and
sentinel scatters land in slots that the caller slices off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

ROWS = 512  # gather index-tile rows per grid step (r4 sweep: 8 -> 512 is
# 13x — tiny tiles made the kernel grid-overhead-bound at 320k steps)
SCATTER_ROWS = 64  # scatter tile rows (per-row MXU contractions; 64 best)
# keep the whole-table row scan cheap: t_pad <= 64 rows (8192 slots) covers
# every profile/noise EFFECTIVE key window (conprb.KernelConfig key sizes)
MAX_TABLE_ROWS = 64


def table_rows_padded(size: int) -> int:
    """t_pad for a table of `size` real slots + 1 sentinel slot."""
    return -(-(size + 1) // 128)


def kernels_supported(size: int, backend: str = None) -> bool:
    if not PALLAS_AVAILABLE or table_rows_padded(size) > MAX_TABLE_ROWS:
        return False
    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    return backend == "tpu"


# --------------------------------------------------------------------- #
# gather-sum                                                             #
# --------------------------------------------------------------------- #
def _gather_sum_kernel(flat_ref, table_ref, out_ref, *, t_rows: int,
                       rows: int):
    f = flat_ref[:]  # [R, 128] i32
    hi = jax.lax.shift_right_logical(f, jnp.int32(7))
    lo = jax.lax.bitwise_and(f, jnp.int32(127))

    def g_body(t, g):
        row = table_ref[pl.ds(t, 1), :]  # [1, 128]
        rowb = jnp.broadcast_to(row, (rows, 128))
        v = jnp.take_along_axis(rowb, lo, axis=1)
        return jnp.where(hi == t, v, g)

    g = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(t_rows), g_body,
        jnp.zeros((rows, 128), jnp.float32),
    )
    out_ref[:] = jnp.sum(g, axis=1, keepdims=True)  # [R, 1]


def _gather_sum_x32(table_pad: jnp.ndarray, flat: jnp.ndarray,
                    interpret: bool = False, rows: int = ROWS) -> jnp.ndarray:
    t_pad = table_pad.shape[0]
    X = flat.shape[0]
    n_tiles = X // rows
    out = pl.pallas_call(
        partial(_gather_sum_kernel, t_rows=t_pad, rows=rows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((t_pad, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((X, 1), jnp.float32),
        interpret=interpret,
    )(flat, table_pad)
    return out[:, 0]


def gather_sum(table_pad: jnp.ndarray, flat: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """[X] f32: per-row sum of table_pad.reshape(-1)[flat[r, :]].

    table_pad: [t_pad, 128] f32 (zero-padded; sentinel slots 0).
    flat: [X, 128] int32 sentinel-masked indices; trailing rows beyond a
    ROWS multiple are padded internally with the table's last (zero) slot."""
    X = flat.shape[0]
    rows = ROWS if X >= ROWS else 8
    Xp = -(-X // rows) * rows
    if Xp != X:
        sentinel = table_pad.shape[0] * 128 - 1  # a zero-padding slot
        flat = jnp.pad(flat, ((0, Xp - X), (0, 0)), constant_values=sentinel)
    with jax.enable_x64(False):
        return _gather_sum_x32(table_pad, flat, interpret, rows=rows)[:X]


# --------------------------------------------------------------------- #
# scatter-add                                                            #
# --------------------------------------------------------------------- #
def _scatter_kernel(flat_ref, w_ref, out_ref, acc_ref, comp_ref,
                    *, t_pad: int, rows: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)

    f = flat_ref[:]  # [R, 128]
    hi = jax.lax.shift_right_logical(f, jnp.int32(7))
    lo = jax.lax.bitwise_and(f, jnp.int32(127))

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    upd = jnp.zeros((t_pad, 128), jnp.float32)
    for r in range(rows):
        # per-row weight is a static-index scalar load from the [R, 1]
        # VMEM block (a [R,1]->[R,128] broadcast is "both sublanes and
        # lanes" — Mosaic rejects it; SMEM blocks reject (1, R) shapes).
        # Precision: the one-hot factor b is EXACT in bf16, so splitting
        # the weighted factor a into two bf16 terms keeps ~16 mantissa
        # bits of each product (2^-17 relative) in 2 native MXU passes —
        # 3x cheaper than Precision.HIGHEST's 6 (r4 ablation: 193ms was
        # the model-round bottleneck). Scatter error stays RELATIVE to
        # each contribution (f32 accumulation), so small counts keep
        # their 2^-17 relative accuracy — unlike prefix-sum differencing,
        # this is safe for tiny-theta transcripts.
        a = jnp.where(iota_t == hi[r : r + 1, :], w_ref[r, 0], 0.0)
        b16 = (iota_l == lo[r : r + 1, :]).astype(jnp.bfloat16)  # b[l, s]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        upd = upd + jax.lax.dot_general(
            a_hi, b16, dn, preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            a_lo, b16, dn, preferred_element_type=jnp.float32,
        )
    # Kahan across the sequential grid
    y = upd - comp_ref[:]
    t_ = acc_ref[:] + y
    comp_ref[:] = (t_ - acc_ref[:]) - y
    acc_ref[:] = t_

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        out_ref[:] = acc_ref[:]


def _scatter_x32(flat: jnp.ndarray, w: jnp.ndarray, t_pad: int,
                 interpret: bool = False,
                 rows: int = SCATTER_ROWS) -> jnp.ndarray:
    X = flat.shape[0]
    n_tiles = X // rows
    out = pl.pallas_call(
        partial(_scatter_kernel, t_pad=t_pad, rows=rows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t_pad, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_pad, 128), jnp.float32),
            pltpu.VMEM((t_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(flat, w.reshape(-1, 1))
    return out.reshape(-1)


def scatter_add(flat: jnp.ndarray, w: jnp.ndarray, size: int,
                interpret: bool = False) -> jnp.ndarray:
    """[t_pad*128] f32: counts[t] += w[r] over flat[r, :] == t.

    flat: [X, 128] int32 sentinel-masked; w: [X] f32 per-ROW weight
    (broadcast across the 128 lanes). Caller slices [:size]. Trailing rows
    beyond a ROWS multiple are padded internally with zero weight."""
    t_pad = table_rows_padded(size)
    X = flat.shape[0]
    rows = SCATTER_ROWS if X >= SCATTER_ROWS else 8
    Xp = -(-X // rows) * rows
    if Xp != X:
        flat = jnp.pad(flat, ((0, Xp - X), (0, 0)))
        w = jnp.pad(w, (0, Xp - X))
    with jax.enable_x64(False):
        return _scatter_x32(flat, w, t_pad, interpret, rows=rows)


# ------------------------------------------------------------------- #
# XLA fallback: one-hot MXU contraction (no Pallas)                    #
# ------------------------------------------------------------------- #

def _pad1(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return x if x.shape[0] == n else jnp.pad(x, (0, n - x.shape[0]))


def onehot_scatter(flat: jnp.ndarray, w: jnp.ndarray, size: int,
                   block: int = 1 << 15) -> jnp.ndarray:
    """counts[t] = sum_i w[i] * [flat[i] == t], as two iota-compare one-hot
    factors contracted on the MXU.

    XLA lowers scatter-add on TPU to a serialized pass (~28 ns/element
    measured on the 2500-entry profile table — 7 s per model round at
    bench scale); the one-hot contraction runs at MXU/HBM rate instead.
    Split t = hi*128 + lo: per block  a[hi, s] = w[s]*[flat[s]>>7 == hi],
    b[s, lo] = [flat[s]&127 == lo],  acc += a @ b  ([t_rows, 128]).
    Accumulation order differs from scatter-add only in f32 rounding.
    Padding lanes must carry w == 0 (flat pad lands on t=0 with weight 0).
    Reference op: the suffstat collect loops of SingleModel.h:163-209."""
    t_rows = -(-size // 128)
    flat = flat.reshape(-1).astype(jnp.int32)
    w = w.reshape(-1).astype(jnp.float32)
    S = flat.shape[0]
    # keep a's [t_rows, block] working set bounded for big tables
    block = min(block, max(512, ((1 << 23) // max(t_rows, 1)) // 128 * 128))
    Sp = max(-(-S // block) * block, block)
    fl2 = _pad1(flat, Sp).reshape(-1, block)
    w2 = _pad1(w, Sp).reshape(-1, block)
    iota_t = jnp.arange(t_rows, dtype=jnp.int32)[:, None]
    iota_l = jnp.arange(128, dtype=jnp.int32)[None, :]

    def body(acc, args):
        f, ww = args
        hi = jax.lax.shift_right_logical(f, 7)
        lo = jax.lax.bitwise_and(f, jnp.int32(127))
        a = jnp.where(hi[None, :] == iota_t, ww[None, :], 0.0)
        b = (lo[:, None] == iota_l).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    acc0 = jnp.zeros((t_rows, 128), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (fl2, w2))
    return acc.reshape(-1)[:size]
