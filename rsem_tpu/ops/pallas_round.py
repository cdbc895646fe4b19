"""Fused Pallas TPU kernel for theta-only EM rounds.

The XLA formulation (fast_estep.py) spends ~80% of a round in two large
gathers (theta[sid] over bucket tiles + inverse-denominator[read] over
sid-sorted hits, ~3 ns/element on the XLA gather path). This kernel removes
both, plus the second (sid-sorted) hit layout, the cross-layout permutation
and the f64 cross-block cumsum, by fusing the entire round into one pass
over the dense read buckets:

  * hits live in [X, 128] slot tiles (bucket of width K: each lane-row holds
    128/K reads' hit groups; K >= 128 reads span whole rows);
  * theta "gather" = scan over the [T, 128] theta table rows resident in
    VMEM: per row a broadcast + per-lane shuffle (take_along_axis axis=1,
    ~150 Gelem/s on the VPU) + masked select — no gather op at all;
  * per-read denominators = intra-group butterfly (lane shuffles with static
    XOR indices), so the broadcast back over the read's hits is free;
  * expected-count "scatter" = one-hot MXU contraction per tile:
    counts[t, l] += sum_{slots} u * (hi == t) * (lo == l), with the one-hot
    factors built by iota compares — no scatter op;
  * counts accumulate in VMEM across the sequential grid with Kahan
    compensation (replaces the f64 cross-block pass).

Reference semantics: EM.cpp:199-244 (E_STEP over cached conprbs) +
EM.cpp:385-398 (count reduction / M-step). Numerics match fast_estep.py to
float32 rounding; tests/test_pallas_round.py pins the parity (interpret
mode on CPU, compiled on TPU).

The per-slot work scales with T = ceil((M+1)/128) table rows, so this path
is used for M up to ~64k transcripts (covers human annotation sets);
engine/em.py falls back to the XLA path beyond that and on non-TPU
backends.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_ROUND, MIN_ROUND, STOP_CRITERIA, THETA_CUT
from ..utils.jaxinit import configure as _configure_jax
from .ddsum import dd_add_f32, dd_sum, dd_to_f32

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

# rows of 128 slots per grid step; K>128 buckets use 8 (reads span K/128
# consecutive rows and the sublane butterfly gathers within an 8-row tile).
# r4: SMALLK 16 -> 64 — tiny tiles made the dominant buckets grid-overhead
# bound (same disease as pallas_table's ROWS=8; measured there 8->512 =
# 13x); 64 keeps the unrolled per-row MXU scatter loop compilable.
ROWS_SMALLK = 64
ROWS_BIGK = 8

# use this kernel only while the table scan stays cheap (T <= 512 rows
# = 65536 transcripts)
MAX_M_FOR_PALLAS = 512 * 128 - 1


class PallasRoundData(NamedTuple):
    """Static per-dataset device arrays (one entry per non-empty bucket).

    Registered as a custom pytree (below) whose int metadata (ks,
    table_rows, M, ...) is aux_data: the kernel grid and VMEM table shapes
    are sized from those ints, so they must stay concrete when a
    PallasRoundData is passed through jax.jit as an ARGUMENT — which is
    the right way to pass it (closure capture would embed the ~tens-of-MB
    tiles as program constants in every compile request)."""

    sid_t: Tuple[jnp.ndarray, ...]  # [X, 128] int32 (pad: 0)
    cps_t: Tuple[jnp.ndarray, ...]  # [X, 128] f32 (pad: 0)
    ncs_t: Tuple[jnp.ndarray, ...]  # [X, 128] f32 noise coeff per slot
    ks: Tuple[int, ...]  # bucket width K (pow2)
    restore_bidx: jnp.ndarray  # [H] int32 bucket index of each orig hit
    restore_slot: jnp.ndarray  # [H] int32 flat slot within its bucket
    restore_read: Tuple[jnp.ndarray, ...]  # per bucket orig read ids (i32)
    table_rows: int  # T = ceil((M+1)/128)
    n_reads: int
    M: int
    n0: float


def _prd_flatten(d: "PallasRoundData"):
    leaves = (d.sid_t, d.cps_t, d.ncs_t, d.restore_bidx, d.restore_slot,
              d.restore_read)
    aux = (d.ks, d.table_rows, d.n_reads, d.M, d.n0)
    return leaves, aux


def _prd_unflatten(aux, leaves):
    ks, table_rows, n_reads, M, n0 = aux
    sid_t, cps_t, ncs_t, restore_bidx, restore_slot, restore_read = leaves
    return PallasRoundData(
        sid_t=sid_t, cps_t=cps_t, ncs_t=ncs_t, ks=ks,
        restore_bidx=restore_bidx, restore_slot=restore_slot,
        restore_read=restore_read, table_rows=table_rows,
        n_reads=n_reads, M=M, n0=n0,
    )


jax.tree_util.register_pytree_node(
    PallasRoundData, _prd_flatten, _prd_unflatten
)


def scale_conprbs(hits, log_conprb: np.ndarray, log_ncp: np.ndarray):
    """Per-read max-logit scaling at freeze time so linear f32 never
    underflows (shared with fast_estep.build_fast_data)."""
    N = hits.n_reads
    offs = hits.read_offsets.astype(np.int64)
    nh = np.diff(offs)
    log_conprb = np.asarray(log_conprb, dtype=np.float64)
    log_ncp = np.asarray(log_ncp, dtype=np.float64)
    if hits.n_hits:
        read_max = np.maximum.reduceat(log_conprb, offs[:-1])
    else:
        read_max = np.full(N, -np.inf)
    read_max = np.maximum(read_max, log_ncp)
    safe_max = np.where(np.isfinite(read_max), read_max, 0.0)
    cps = np.exp(log_conprb - np.repeat(safe_max, nh)).astype(np.float32)
    cps[~np.isfinite(log_conprb)] = 0.0
    ncs = np.exp(log_ncp - safe_max).astype(np.float32)
    ncs[~np.isfinite(log_ncp)] = 0.0
    return cps, ncs, nh


def build_pallas_data(
    hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int, n0: float
) -> PallasRoundData:
    """Host-side layout build after conprb freeze (analogue of
    fast_estep.build_fast_data for the fused kernel)."""
    _configure_jax()
    H = hits.n_hits
    N = hits.n_reads
    sid = hits.sid.astype(np.int64)
    offs = hits.read_offsets.astype(np.int64)
    cps, ncs, nh = scale_conprbs(hits, log_conprb, log_ncp)

    sizes = []
    k = 1
    mx = int(nh.max()) if N else 1
    while k < mx:
        sizes.append(k)
        k *= 2
    sizes.append(k)
    bucket_of = np.searchsorted(np.asarray(sizes), nh)

    sid_tiles, cps_tiles, ncs_tiles, restore_read = [], [], [], []
    ks = []
    restore_bidx = np.empty(H, dtype=np.int32)
    restore_slot = np.empty(H, dtype=np.int32)
    for bi, K in enumerate(sizes):
        rsel = np.nonzero(bucket_of == bi)[0]
        if len(rsel) == 0:
            continue
        n_k = len(rsel)
        rows_per_tile = ROWS_BIGK if K > 128 else ROWS_SMALLK
        slots_per_tile = rows_per_tile * 128
        # rows of reads such that total slots is a tile multiple;
        # menu-round the tile count so jit signatures (and the persistent
        # compilation cache) stay stable across datasets of similar scale
        from .fast_estep import menu_round

        reads_per_tile = max(slots_per_tile // K, 1)
        n_tiles = menu_round(-(-n_k // reads_per_tile))
        n_rows = n_tiles * reads_per_tile
        sid_m = np.zeros((n_rows, K), dtype=np.int32)
        cps_m = np.zeros((n_rows, K), dtype=np.float32)
        orig_m = np.full((n_rows, K), -1, dtype=np.int64)
        nh_sel = nh[rsel]
        tot = int(nh_sel.sum())
        run_starts = np.cumsum(nh_sel) - nh_sel
        cols = np.arange(tot) - np.repeat(run_starts, nh_sel)
        rows_idx = np.repeat(np.arange(n_k), nh_sel)
        src = np.repeat(offs[rsel], nh_sel) + cols
        sid_m[rows_idx, cols] = sid[src]
        cps_m[rows_idx, cols] = cps[src]
        orig_m[rows_idx, cols] = src
        ncs_m = np.zeros((n_rows, K), dtype=np.float32)
        ncs_m[:n_k] = ncs[rsel][:, None]

        X = n_rows * K // 128
        bidx = len(ks)
        flat_orig = orig_m.reshape(-1)
        valid = flat_orig >= 0
        restore_bidx[flat_orig[valid]] = bidx
        restore_slot[flat_orig[valid]] = np.nonzero(valid)[0]
        sid_tiles.append(jnp.asarray(sid_m.reshape(X, 128)))
        cps_tiles.append(jnp.asarray(cps_m.reshape(X, 128)))
        ncs_tiles.append(jnp.asarray(ncs_m.reshape(X, 128)))
        restore_read.append(jnp.asarray(rsel.astype(np.int32)))
        ks.append(K)

    return PallasRoundData(
        sid_t=tuple(sid_tiles),
        cps_t=tuple(cps_tiles),
        ncs_t=tuple(ncs_tiles),
        ks=tuple(ks),
        restore_bidx=jnp.asarray(restore_bidx),
        restore_slot=jnp.asarray(restore_slot),
        restore_read=tuple(restore_read),
        table_rows=-(-(M + 1) // 128),
        n_reads=N,
        M=M,
        n0=float(n0),
    )


def _geometry(hits, M: int):
    """Host-side bucket geometry from sid/offsets ONLY (no conprbs): the
    per-bucket [n_rows, K] hit-index map, padded read ids, and restore
    arrays. Shared by the host fill (build_pallas_data) and the
    device-side fill (build_pallas_data_device)."""
    H = hits.n_hits
    N = hits.n_reads
    offs = hits.read_offsets.astype(np.int64)
    nh = np.diff(offs)
    sizes = []
    k = 1
    mx = int(nh.max()) if N else 1
    while k < mx:
        sizes.append(k)
        k *= 2
    sizes.append(k)
    bucket_of = np.searchsorted(np.asarray(sizes), nh)

    out = []
    restore_bidx = np.empty(H, dtype=np.int32)
    restore_slot = np.empty(H, dtype=np.int32)
    from .fast_estep import menu_round

    for bi, K in enumerate(sizes):
        rsel = np.nonzero(bucket_of == bi)[0]
        if len(rsel) == 0:
            continue
        n_k = len(rsel)
        rows_per_tile = ROWS_BIGK if K > 128 else ROWS_SMALLK
        slots_per_tile = rows_per_tile * 128
        reads_per_tile = max(slots_per_tile // K, 1)
        n_tiles = menu_round(-(-n_k // reads_per_tile))
        n_rows = n_tiles * reads_per_tile
        orig_m = np.full((n_rows, K), -1, dtype=np.int64)
        nh_sel = nh[rsel]
        tot = int(nh_sel.sum())
        run_starts = np.cumsum(nh_sel) - nh_sel
        cols = np.arange(tot) - np.repeat(run_starts, nh_sel)
        rows_idx = np.repeat(np.arange(n_k), nh_sel)
        src = np.repeat(offs[rsel], nh_sel) + cols
        orig_m[rows_idx, cols] = src
        bidx = len(out)
        flat_orig = orig_m.reshape(-1)
        valid = flat_orig >= 0
        restore_bidx[flat_orig[valid]] = bidx
        restore_slot[flat_orig[valid]] = np.nonzero(valid)[0]
        rsel_pad = np.full(n_rows, -1, dtype=np.int64)
        rsel_pad[:n_k] = rsel
        out.append((K, orig_m, rsel_pad, rsel))
    return out, restore_bidx, restore_slot


@jax.jit
def _fill_tiles_device(lcp, lnp, sid_h, origs, rsels):
    """Device-side tile fill from the frozen DEVICE conprbs: gathers +
    per-read max scaling, no host round-trip. Scaling is per-read and
    cancels exactly in the round math, so the f32 exp here is equivalent
    to the host f64 path."""
    with jax.enable_x64(False):
        sid_out, cps_out, ncs_out = [], [], []
        for o64, r64 in zip(origs, rsels):
            o = o64.astype(jnp.int32)
            r = r64.astype(jnp.int32)
            rows, K = o.shape
            valid = o >= 0
            oc = jnp.where(valid, o, 0)
            lcp_t = jnp.where(valid, lcp[oc], -jnp.inf)
            sid_t = jnp.where(valid, sid_h[oc], 0)
            rv = r >= 0
            lnp_r = jnp.where(rv, lnp[jnp.where(rv, r, 0)], -jnp.inf)
            smax = jnp.maximum(jnp.max(lcp_t, axis=1), lnp_r)
            safe = jnp.where(jnp.isfinite(smax), smax, 0.0)
            cps_t = jnp.exp(lcp_t - safe[:, None])
            ncs_r = jnp.exp(lnp_r - safe)
            X = rows * K // 128
            sid_out.append(sid_t.astype(jnp.int32).reshape(X, 128))
            cps_out.append(cps_t.astype(jnp.float32).reshape(X, 128))
            ncs_out.append(jnp.broadcast_to(
                ncs_r[:, None].astype(jnp.float32), (rows, K)
            ).reshape(X, 128))
        return tuple(sid_out), tuple(cps_out), tuple(ncs_out)


def build_pallas_data_device(
    hits, lcp_dev: jnp.ndarray, lnp_dev: jnp.ndarray, sid_dev: jnp.ndarray,
    M: int, n0: float, need_restore: bool = True,
) -> PallasRoundData:
    """build_pallas_data with the conprbs staying ON DEVICE: only the
    int32 hit-index geometry crosses the wire (the host fill paid a
    ~[H] f64 D2H plus a 3x [X,128] f32 H2D through the dev host's
    ~40-90 MB/s tunnel). lcp_dev/lnp_dev: frozen log conprbs (device,
    unpadded lengths H/N in their leading entries); sid_dev: padded
    device sid array (HitsDevice.sid)."""
    _configure_jax()
    geo, restore_bidx, restore_slot = _geometry(hits, M)
    H = hits.n_hits
    lcp = lcp_dev[: max(H, 1)].astype(jnp.float32)
    lnp = lnp_dev[: max(hits.n_reads, 1)].astype(jnp.float32)
    origs = tuple(jnp.asarray(g[1]) for g in geo)
    rsels = tuple(jnp.asarray(g[2]) for g in geo)
    sid_t, cps_t, ncs_t = _fill_tiles_device(
        lcp, lnp, sid_dev[: max(H, 1)].astype(jnp.int32), origs, rsels
    )
    return PallasRoundData(
        sid_t=sid_t,
        cps_t=cps_t,
        ncs_t=ncs_t,
        ks=tuple(g[0] for g in geo),
        restore_bidx=jnp.asarray(restore_bidx) if need_restore else None,
        restore_slot=jnp.asarray(restore_slot) if need_restore else None,
        restore_read=tuple(
            jnp.asarray(g[3].astype(np.int32)) for g in geo
        ) if need_restore else (),
        table_rows=-(-(M + 1) // 128),
        n_reads=hits.n_reads,
        M=M,
        n0=float(n0),
    )


def _round_kernel(
    sid_ref, cps_ref, ncs_ref, table_ref, th0_ref,
    contrib_ref, noise_ref,
    comp_ref, ncomp_ref,
    *, K: int, rows: int, t_rows: int,
):
    """One grid step: [rows, 128] slots -> accumulate counts + noise.

    contrib_ref [Tpad, 128] and noise_ref (SMEM scalar) persist across the
    sequential grid; comp/ncomp are Kahan compensations."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        contrib_ref[:] = jnp.zeros_like(contrib_ref)
        comp_ref[:] = jnp.zeros_like(comp_ref)
        noise_ref[0, 0] = 0.0
        ncomp_ref[0] = 0.0

    sidv = sid_ref[:]
    cpsv = cps_ref[:]
    hi = jax.lax.shift_right_logical(sidv, jnp.int32(7))
    lo = jax.lax.bitwise_and(sidv, jnp.int32(127))

    # --- theta gather: scan table rows, lane-shuffle + masked select -----
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

    def g_body(t, g):
        row = table_ref[pl.ds(t, 1), :]  # [1, 128]
        rowb = jnp.broadcast_to(row, (rows, 128))
        v = jnp.take_along_axis(rowb, lo, axis=1)
        return jnp.where(hi == t, v, g)

    # int32 bounds on both ends: with x64 enabled a weak-int lower bound
    # canonicalizes to int64, which Mosaic cannot lower
    g = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(t_rows), g_body,
        jnp.zeros((rows, 128), jnp.float32),
    )
    w = g * cpsv

    # --- per-read denominators: XOR butterflies within the K-slot group --
    d = w
    s = 1
    while s < min(K, 128):
        idx = jax.lax.bitwise_xor(lane, jnp.int32(s))
        d = d + jnp.take_along_axis(d, idx, axis=1)
        s *= 2
    if K > 128:
        rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        s = 1
        while s < K // 128:
            idx = jax.lax.bitwise_xor(rowi, jnp.int32(s))
            d = d + jnp.take_along_axis(d, idx, axis=0)
            s *= 2

    th0 = th0_ref[0]
    w0 = th0 * ncs_ref[:]
    denom = d + w0
    inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
    u = cpsv * inv

    # noise fraction: each read's K slots carry identical w0*inv
    nadd = jnp.sum(w0 * inv) * (1.0 / K)
    y = nadd - ncomp_ref[0]
    t_ = noise_ref[0, 0] + y
    ncomp_ref[0] = (t_ - noise_ref[0, 0]) - y
    noise_ref[0, 0] = t_

    # --- scatter: one-hot contraction over (hi, lo) ----------------------
    # Mosaic only lowers plain 2D matmuls, so contract one slot-row at a
    # time: upd[t, l] += sum_s u[s] * (hi[s] == t) * (lo[s] == l). The
    # `rows` loop is static (8/16 MXU matmuls of [t_pad,128]x[128,128]).
    t_pad = contrib_ref.shape[0]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    upd = jnp.zeros((t_pad, 128), jnp.float32)
    for r in range(rows):
        # 2-pass bf16 split: b is an EXACT one-hot, so a_hi+a_lo keeps
        # ~16 mantissa bits per product (2^-17 relative, local to each
        # contribution) at 1/3 the MXU passes of Precision.HIGHEST
        # (see pallas_table._scatter_kernel)
        a = jnp.where(iota_t == hi[r : r + 1, :], u[r : r + 1, :], 0.0)
        b16 = (iota_l == lo[r : r + 1, :]).astype(jnp.bfloat16)  # b[l, s]
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        upd = upd + jax.lax.dot_general(
            a_hi, b16, dn, preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            a_lo, b16, dn, preferred_element_type=jnp.float32,
        )  # [t_pad, 128]
    yc = upd - comp_ref[:]
    tc = contrib_ref[:] + yc
    comp_ref[:] = (tc - contrib_ref[:]) - yc
    contrib_ref[:] = tc


def _bucket_call(sid2d, cps2d, ncs2d, table, th0, K: int, t_rows: int,
                 interpret: bool = False):
    # Trace the kernel with x64 OFF: fast_estep enables x64 globally, which
    # makes jnp.take_along_axis build int64 indices — Mosaic has no 64-bit
    # types. Everything in the kernel is explicitly 32-bit anyway.
    with jax.enable_x64(False):
        return _bucket_call_x32(sid2d, cps2d, ncs2d, table, th0, K, t_rows,
                                interpret)


def _bucket_call_x32(sid2d, cps2d, ncs2d, table, th0, K: int, t_rows: int,
                     interpret: bool = False):
    X = sid2d.shape[0]
    rows = ROWS_BIGK if K > 128 else ROWS_SMALLK
    n_tiles = X // rows
    t_pad = table.shape[0]
    kern = partial(_round_kernel, K=K, rows=rows, t_rows=t_rows)
    contrib, noise = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((t_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_pad, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        interpret=interpret,
    )(sid2d, cps2d, ncs2d, table, th0)
    return contrib, noise[0, 0]


def pallas_supported(M: int, backend: str = None) -> bool:
    """True when the fused kernel path applies: Mosaic available, TPU
    backend, and the theta table fits the per-grid-step VMEM scan budget."""
    if not PALLAS_AVAILABLE or M > MAX_M_FOR_PALLAS:
        return False
    if backend is None:
        try:
            import jax

            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    return backend == "tpu"


def pallas_theta_round(
    theta: jnp.ndarray, data: PallasRoundData, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fixed-conprb EM round; returns (new_theta f32 [M+1], counts).

    Same math as fast_estep.fast_theta_round: counts_m = theta_m *
    sum_{hits of m} cps/denom(read); counts_0 = noise + n0; M-step
    normalize."""
    M = data.M
    t_rows = data.table_rows
    t_pad = -(-t_rows // 8) * 8
    table = jnp.zeros((t_pad * 128,), jnp.float32).at[: M + 1].set(
        theta
    ).reshape(t_pad, 128)
    th0 = theta[0:1]

    contrib_sum = None
    # noise across buckets in double-float (the kernel already Kahan-
    # compensates within a bucket); no f64 — see ops/ddsum
    noise = (jnp.float32(0.0), jnp.float32(0.0))
    for sid2d, cps2d, ncs2d, K in zip(data.sid_t, data.cps_t, data.ncs_t, data.ks):
        contrib, nz = _bucket_call(sid2d, cps2d, ncs2d, table, th0, K,
                                   t_rows, interpret=interpret)
        contrib_sum = contrib if contrib_sum is None else contrib_sum + contrib
        noise = dd_add_f32(noise, nz)
    counts_sum = contrib_sum.reshape(-1)[: M + 1]
    counts_t = counts_sum * theta
    counts = counts_t.at[0].set(dd_to_f32(noise) + data.n0)
    theta_new = counts / dd_to_f32(dd_sum(counts))
    return theta_new, counts


def run_pallas_em_loop(
    theta0: jnp.ndarray,
    data: PallasRoundData,
    min_round: int = MIN_ROUND,
    max_round: int = MAX_ROUND,
    start_round: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """On-device EM loop with the reference convergence rule
    (EM.cpp:53-55,407-416), fused-kernel rounds."""

    def cond(state):
        theta, counts, rounds, tot_num = state
        return (rounds < min_round) | ((tot_num > 0) & (rounds < max_round))

    def body(state):
        theta, counts, rounds, _ = state
        theta_new, counts = pallas_theta_round(theta, data, interpret=interpret)
        mask = theta >= THETA_CUT
        change = jnp.where(
            mask, jnp.abs(theta_new - theta) / jnp.where(mask, theta, 1.0), 0.0
        )
        tot_num = jnp.sum(change >= STOP_CRITERIA).astype(jnp.int32)
        return theta_new, counts, rounds + 1, tot_num

    init = (
        theta0,
        jnp.zeros_like(theta0),
        jnp.asarray(start_round, dtype=jnp.int32),
        jnp.asarray(1, dtype=jnp.int32),
    )
    theta, counts, rounds, _ = jax.lax.while_loop(cond, body, init)
    return theta, counts, rounds


def pallas_final_fracs(theta: jnp.ndarray, data: PallasRoundData):
    """Final posterior responsibilities in original hit/read order
    (EM.cpp:460-478). One-shot, so plain XLA gathers are fine here."""
    flat_parts = []
    noise_read = jnp.zeros(data.n_reads, dtype=jnp.float32)
    for sid2d, cps2d, ncs2d, K, rsel in zip(
        data.sid_t, data.cps_t, data.ncs_t, data.ks, data.restore_read
    ):
        w = theta[sid2d] * cps2d  # [X, 128]
        X = sid2d.shape[0]
        if K <= 128:
            grp = w.reshape(X, 128 // K, K)
            d = jnp.broadcast_to(grp.sum(axis=2, keepdims=True), grp.shape)
            d = d.reshape(X, 128)
        else:
            rows_per_read = K // 128
            grp = w.reshape(X // rows_per_read, rows_per_read * 128)
            d = jnp.broadcast_to(
                grp.sum(axis=1, keepdims=True), grp.shape
            ).reshape(X, 128)
        w0 = theta[0] * ncs2d
        denom = d + w0
        inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
        flat_parts.append((w * inv).reshape(-1))
        # per-read noise fraction: take the group's first slot
        nf = (w0 * inv).reshape(-1)
        if K <= 128:
            nf_read = nf.reshape(-1, K)[:, 0]
        else:
            nf_read = nf.reshape(-1, K)[:, 0]
        idx = rsel.astype(jnp.int32)
        noise_read = noise_read.at[idx].set(nf_read[: idx.shape[0]])

    sizes = [p.shape[0] for p in flat_parts]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    # int32 flat-index arithmetic below: guard against silent wraparound
    # if the padded slot total ever exceeds 2^31 (advisor r3)
    assert starts[-1] < 2**31, (
        f"padded bucket slots {starts[-1]} exceed int32 indexing range"
    )
    flat = jnp.concatenate(flat_parts) if len(flat_parts) > 1 else flat_parts[0]
    base = jnp.asarray(starts[:-1], dtype=jnp.int32)
    frac = flat[data.restore_slot.astype(jnp.int32) + base[data.restore_bidx]]
    return frac, noise_read


# module-level jitted entry points: one persistent jit cache per process
# (a fresh jax.jit wrapper per run_em call would re-trace every time);
# min/max_round are static so the while_loop bounds stay Python ints
@partial(jax.jit, static_argnums=(3, 4))
def jit_pallas_loop(theta0, data: PallasRoundData, start_round,
                    min_round: int, max_round: int):
    return run_pallas_em_loop(theta0, data, min_round=min_round,
                              max_round=max_round, start_round=start_round)


jit_pallas_final_fracs = jax.jit(pallas_final_fracs)


@jax.jit
def jit_pallas_counts(theta, data: PallasRoundData):
    """Expected counts at a FIXED theta (the reference's final E-step,
    EM.cpp:460-478, reduced to the [M+1] count vector) — lets the engine
    skip the per-hit posterior fetch when no downstream consumer needs
    posteriors."""
    interp = jax.default_backend() != "tpu"  # trace-time static
    return pallas_theta_round(theta, data, interpret=interp)[1]
