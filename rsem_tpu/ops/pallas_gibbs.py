"""Fused Pallas TPU kernel for collapsed-Gibbs sweeps.

The reference's Gibbs sampler (Gibbs.cpp:265-353) is a sequential scan: per
read, decrement counts at the current assignment, sample
z_i ~ (counts[sid_j] + pseudo_j) * conprb_j over the read's alignment slots,
increment counts. Round 4's XLA formulation ran ~33 proportional blocks per
sweep as chained graph nodes; the per-block XLA gather of counts[sid]
(~16 ms per block at bench scale) made a sweep 0.5-1.6 s vs the reference's
33 ms — the only stage losing to one reference CPU thread.

This kernel fuses a WHOLE sweep (all reads, every chain) into one on-device
program per alignment-width bucket:

  * the [M+1] count table lives in VMEM for the entire sweep (stored as
    counts + pseudo, reshaped [T, 128]; M <= 64k -> <= 256 KB), threaded
    through the sequential grid as a revisited output block;
  * reads are packed into [TILE_ROWS, 128] slot tiles (bucket width K:
    128/K reads per lane-row), SORTED by their smallest table row so each
    tile's sids span a narrow row window; the count gather and the count
    scatter are then short dynamic loops over the window's table rows
    (compare+select / masked column-reduce) instead of XLA gathers;
  * every tile is one "block" of the blocked-collapse approximation
    (counts refresh after each tile, each read's own assignment subtracted
    exactly) — FINER than the r4 path's 32 blocks, so strictly closer to
    the reference's sequential sweep;
  * sampling is inverse-CDF with one in-kernel PRNG uniform per read
    (pltpu.prng_*, seeded deterministically per (seed, sweep, part, chain,
    tile)): group prefix-sums via lane/sublane shuffles, noise slot first
    (matching engine/gibbs.GibbsData's slot order);
  * chains ride the leading grid dimension (the reference's
    thread-per-chain, Gibbs.cpp:207-254), each with its own table block.

The count table is exact: counts are integer-valued f32 (< 2^24), deltas
are +-1, and the noise count lives at table[0, 0] (sid 0 never aliases a
hit). Numerics/semantics are pinned against the XLA path in
tests/test_pallas_gibbs.py (interpret mode on CPU).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

from .pallas_round import MAX_M_FOR_PALLAS, scale_conprbs

TILE_ROWS = 64  # lane-rows of 128 slots per grid step (per chain)
R_WIN = 16  # soft row-window target for the greedy tile packing
NEG_ONE = -1.0


class GibbsPart(NamedTuple):
    """One alignment-width bucket's static tiles (leaves = device arrays;
    K and geometry ride as aux via PallasGibbsData's pytree)."""

    sid_t: jnp.ndarray  # [X, 128] i32 (padding: clamped in-window sid)
    cps_t: jnp.ndarray  # [X, 128] f32 scaled conprb (padding: 0)
    ncs_t: jnp.ndarray  # [X, 128] f32 noise coeff at group-first slot
    win_lo: jnp.ndarray  # [n_tiles] i32 table-row window start (gather)
    win_cnt: jnp.ndarray  # [n_tiles] i32 table-row window length
    wsc: jnp.ndarray  # [n_tiles] i32 scatter base (= clamp(win_lo, W))
    K: int  # slots per read (pow2)
    W: int  # static scatter-window height (R_WIN local / t_pad global)


class PallasGibbsData(NamedTuple):
    parts: Tuple[GibbsPart, ...]
    t_rows: int  # ceil((M+1)/128)
    t_pad: int  # table rows padded (mult of 8, >= R_WIN)
    M: int
    n_reads: int  # reads placed in tiles (>= 1 valid hit slot)
    n_noise_fixed: int  # reads with no valid hit slot: permanently noise


def _pgd_flatten(d: PallasGibbsData):
    leaves = tuple(
        (p.sid_t, p.cps_t, p.ncs_t, p.win_lo, p.win_cnt, p.wsc)
        for p in d.parts
    )
    aux = (
        tuple((p.K, p.W) for p in d.parts),
        d.t_rows,
        d.t_pad,
        d.M,
        d.n_reads,
        d.n_noise_fixed,
    )
    return leaves, aux


def _pgd_unflatten(aux, leaves):
    kws, t_rows, t_pad, M, n_reads, n_noise_fixed = aux
    parts = tuple(
        GibbsPart(sid_t=l[0], cps_t=l[1], ncs_t=l[2], win_lo=l[3],
                  win_cnt=l[4], wsc=l[5], K=kw[0], W=kw[1])
        for l, kw in zip(leaves, kws)
    )
    return PallasGibbsData(
        parts=parts, t_rows=t_rows, t_pad=t_pad, M=M, n_reads=n_reads,
        n_noise_fixed=n_noise_fixed,
    )


jax.tree_util.register_pytree_node(PallasGibbsData, _pgd_flatten,
                                   _pgd_unflatten)


def gibbs_pallas_supported(M: int, backend: Optional[str] = None) -> bool:
    if not PALLAS_AVAILABLE or M > MAX_M_FOR_PALLAS:
        return False
    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    return backend == "tpu"


def build_pallas_gibbs_data(
    hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int,
    tile_rows: int = TILE_ROWS, r_win: int = R_WIN,
) -> PallasGibbsData:
    """Host-side layout build from the frozen conprbs (the .ofg content:
    EM.cpp:435-457 / Gibbs.cpp:101-137)."""
    N = hits.n_reads
    offs = hits.read_offsets.astype(np.int64)
    sid = hits.sid.astype(np.int64)
    cps, ncs, nh = scale_conprbs(hits, log_conprb, log_ncp)
    keep = np.isfinite(np.asarray(log_conprb, dtype=np.float64))

    n_slots = (
        np.add.reduceat(keep.astype(np.int64), offs[:-1])
        if hits.n_hits
        else np.zeros(N, np.int64)
    )
    if hits.n_hits == 0:
        n_slots = np.zeros(N, np.int64)
    included = n_slots > 0
    n_noise_fixed = int(N - included.sum())

    t_rows = -(-(M + 1) // 128)
    t_pad = max(-(-t_rows // 8) * 8, 8)

    # per-read row span over kept hits
    hi = (sid >> 7).astype(np.int64)
    big = np.iinfo(np.int64).max
    hi_keep_min = np.where(keep, hi, big)
    hi_keep_max = np.where(keep, hi, -1)
    if hits.n_hits:
        r_min = np.minimum.reduceat(hi_keep_min, offs[:-1])
        r_max = np.maximum.reduceat(hi_keep_max, offs[:-1])
    else:
        r_min = np.zeros(N, np.int64)
        r_max = np.zeros(N, np.int64)

    sizes: List[int] = []
    k = 1
    mx = int(n_slots.max()) if included.any() else 1
    while k < mx:
        sizes.append(k)
        k *= 2
    sizes.append(k)
    bucket_of = np.searchsorted(np.asarray(sizes), n_slots)

    t_pad = max(t_pad, r_win)
    # kept-hit positions, grouped by read (keep_pos[kept_offs[r]:...])
    keep_pos = np.flatnonzero(keep)
    kept_offs = np.concatenate(
        [[0], np.cumsum(np.add.reduceat(keep.astype(np.int64), offs[:-1]))]
    ) if hits.n_hits else np.zeros(N + 1, np.int64)

    parts: List[GibbsPart] = []
    for bi, K in enumerate(sizes):
        rsel = np.flatnonzero(included & (bucket_of == bi))
        if len(rsel) == 0:
            continue
        # narrow reads first, sorted by window start; wide reads trail —
        # fixed tiles of consecutive sorted reads then have tight windows
        # in dense sid regions; tiles whose window still exceeds r_win
        # (wide multireads, sparse tails) use the full-table scatter
        wide = (r_max[rsel] - r_min[rsel]) >= r_win
        order = np.lexsort((r_min[rsel], wide))
        rsel = rsel[order]
        n_k = len(rsel)
        reads_per_tile = max(tile_rows * 128 // K, 1)
        n_tiles = -(-n_k // reads_per_tile)
        n_rows = n_tiles * reads_per_tile

        # vectorized slot packing into [n_rows, K]
        nh_sel = n_slots[rsel]
        tot = int(nh_sel.sum())
        run_starts = np.cumsum(nh_sel) - nh_sel
        cols = np.arange(tot) - np.repeat(run_starts, nh_sel)
        rows_idx = np.repeat(np.arange(n_k), nh_sel)
        src = keep_pos[np.repeat(kept_offs[rsel], nh_sel) + cols]
        sid_m = np.zeros((n_rows, K), dtype=np.int32)
        cps_m = np.zeros((n_rows, K), dtype=np.float32)
        ncs_m = np.zeros((n_rows, K), dtype=np.float32)
        sid_m[rows_idx, cols] = sid[src]
        cps_m[rows_idx, cols] = cps[src]
        ncs_m[:n_k, 0] = ncs[rsel]

        # per-tile windows (reduceat over the fixed tile boundaries)
        bounds = np.arange(n_tiles) * reads_per_tile
        w_lo_t = np.minimum.reduceat(r_min[rsel], bounds).astype(np.int64)
        w_hi_t = np.maximum.reduceat(r_max[rsel], bounds).astype(np.int64)
        # pad slots carry an in-window sid so the gather/scatter loops
        # never index out of window (their cps is 0)
        pad_sid = np.maximum(w_lo_t * 128, 1).astype(np.int32)
        sid_t3 = sid_m.reshape(n_tiles, reads_per_tile, K)
        sid_t3 = np.where(
            cps_m.reshape(n_tiles, reads_per_tile, K) > 0,
            sid_t3, pad_sid[:, None, None],
        )

        is_global = (w_hi_t - w_lo_t) >= r_win
        from .fast_estep import menu_round

        for wfull in (False, True):
            tsel = np.flatnonzero(is_global == wfull)
            if len(tsel) == 0:
                continue
            W = t_pad if wfull else r_win
            # menu-pad the tile count: grid size (and so the compiled
            # executable) stays stable across datasets of similar scale,
            # keeping the persistent compilation cache hot; padding tiles
            # have zero windows and all-padding slots (no-op sweeps)
            n_sel = len(tsel)
            n_menu = menu_round(n_sel)
            pad_t = n_menu - n_sel
            win_lo = np.pad(w_lo_t[tsel], (0, pad_t)).astype(np.int32)
            win_cnt = np.pad(
                (w_hi_t[tsel] - w_lo_t[tsel] + 1), (0, pad_t)
            ).astype(np.int32)
            win_cnt[n_sel:] = 0
            wsc = (
                np.zeros(n_menu, np.int32)
                if wfull
                else np.minimum(win_lo, t_pad - W).astype(np.int32)
            )
            X = n_menu * tile_rows

            def sel_pad(a3, fill=0):
                flat = a3.reshape(n_tiles, -1)[tsel]
                return np.concatenate(
                    [flat, np.full((pad_t, flat.shape[1]), fill,
                                   dtype=flat.dtype)]
                ).reshape(X, 128)

            parts.append(
                GibbsPart(
                    sid_t=jnp.asarray(sel_pad(sid_t3, fill=1)),
                    cps_t=jnp.asarray(sel_pad(cps_m)),
                    ncs_t=jnp.asarray(sel_pad(ncs_m)),
                    win_lo=jnp.asarray(win_lo),
                    win_cnt=jnp.asarray(win_cnt),
                    wsc=jnp.asarray(wsc),
                    K=K,
                    W=W,
                )
            )

    return PallasGibbsData(
        parts=tuple(parts),
        t_rows=t_rows,
        t_pad=t_pad,
        M=M,
        n_reads=int(included.sum()),
        n_noise_fixed=n_noise_fixed,
    )


# ------------------------------------------------------------------ #
# in-kernel group primitives over [R, 128] tiles, groups of K slots  #
# (row-major: K <= 128 -> lane groups; K > 128 -> K/128 whole rows)  #
# ------------------------------------------------------------------ #
def _mix32(h):
    """murmur3 fmix32: full-avalanche 32-bit mixer (int32 wrap-around)."""
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(16)))
    h = h * jnp.int32(-2048144789)  # 0x85EBCA6B
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(13)))
    h = h * jnp.int32(-1028477387)  # 0xC2B2AE35
    h = jax.lax.bitwise_xor(
        h, jax.lax.shift_right_logical(h, jnp.int32(16)))
    return h


def _geom(K: int, R: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    if K <= 128:
        lig = jax.lax.bitwise_and(lane, jnp.int32(K - 1))
        rig = jnp.zeros_like(rowi)
    else:
        rpr = K // 128
        lig = lane
        rig = jax.lax.bitwise_and(rowi, jnp.int32(rpr - 1))
    return lane, rowi, lig, rig


def _greduce(x, K: int, op):
    """Butterfly all-reduce within each K-slot group; result broadcast to
    every slot of the group."""
    R = x.shape[0]
    lane, rowi, _, _ = _geom(K, R)
    s = 1
    while s < min(K, 128):
        idx = jax.lax.bitwise_xor(lane, jnp.int32(s))
        x = op(x, jnp.take_along_axis(x, idx, axis=1))
        s *= 2
    if K > 128:
        s = 1
        while s < K // 128:
            idx = jax.lax.bitwise_xor(rowi, jnp.int32(s))
            x = op(x, jnp.take_along_axis(x, idx, axis=0))
            s *= 2
    return x


def _gsum(x, K):
    return _greduce(x, K, jax.lax.add)


def _gmax(x, K):
    return _greduce(x, K, jax.lax.max)


def _gmin(x, K):
    return _greduce(x, K, jax.lax.min)


def _gprefix(x, K: int):
    """Inclusive prefix sum within each K-slot group (row-major slot
    order)."""
    R = x.shape[0]
    lane, rowi, lig, rig = _geom(K, R)
    # within-row prefix (Hillis-Steele over lanes, masked to the group)
    s = 1
    while s < min(K, 128):
        idx = jnp.maximum(lane - jnp.int32(s), 0)
        sh = jnp.take_along_axis(x, idx, axis=1)
        x = x + jnp.where(lig >= s, sh, 0.0)
        s *= 2
    if K > 128:
        rpr = K // 128
        # add preceding whole-row totals within the group
        rt = jnp.broadcast_to(x[:, 127:128], x.shape)
        acc = rt
        s = 1
        while s < rpr:
            idx = jnp.maximum(rowi - jnp.int32(s), 0)
            sh = jnp.take_along_axis(acc, idx, axis=0)
            acc = acc + jnp.where(rig >= s, sh, 0.0)
            s *= 2
        x = x + (acc - rt)  # exclusive row prefix
    return x


def _sweep_kernel(
    seed_ref, win_lo_ref, win_cnt_ref, wsc_ref,
    sid_ref, cps_ref, ncs_ref, zoh_ref, table_in_ref,
    zoh_out_ref, table_ref,
    *, K: int, rows: int, W: int, C: int, ablate: str = "",
):
    """One grid step = one tile, ALL chains: resample every read of every
    chain against that chain's live VMEM count table, then apply the
    count deltas (each tile is one block of the blocked-collapse sweep).

    Chains are stacked along rows ([C*rows, 128], chain-major): the
    per-slot-row scatter then issues ONE [C*W, 128] x [128, 128] MXU
    contraction serving all chains (the lane one-hot is chain-invariant),
    instead of C narrow matmuls — the difference between ~15 ms and ~1 ms
    sweeps at bench scale."""
    i = pl.program_id(0)
    CR = C * rows

    @pl.when(i == 0)
    def _load_table():
        table_ref[...] = table_in_ref[...]

    sid1 = sid_ref[:]
    hi1 = jax.lax.shift_right_logical(sid1, jnp.int32(7))
    lo1 = jax.lax.bitwise_and(sid1, jnp.int32(127))
    # chain-stacked views [C*rows, 128]
    sid = jnp.concatenate([sid1] * C, axis=0)
    cps = jnp.concatenate([cps_ref[:]] * C, axis=0)
    ncs = jnp.concatenate([ncs_ref[:]] * C, axis=0)
    hi = jax.lax.shift_right_logical(sid, jnp.int32(7))
    lo = jax.lax.bitwise_and(sid, jnp.int32(127))
    zoh = zoh_ref[:].reshape(CR, 128)
    w_lo = win_lo_ref[i]
    w_hi = w_lo + win_cnt_ref[i]

    # ---- count gather: scan the window's table rows, per chain --------
    def g_body(t, g):
        rows_c = table_ref[:, pl.ds(t, 1), :]  # [C, 1, 128]
        rowb = jnp.broadcast_to(rows_c, (C, rows, 128)).reshape(CR, 128)
        v = jnp.take_along_axis(rowb, lo, axis=1)
        return jnp.where(hi == t, v, g)

    if "nogather" in ablate:
        cg = cps + 1.0
    else:
        cg = jax.lax.fori_loop(
            w_lo, w_hi, g_body, jnp.zeros((CR, 128), jnp.float32)
        )

    # ---- weights (counts - own + pseudo are IN the table values) ------
    sidf = sid.astype(jnp.float32)
    has = _gsum(zoh, K)  # 1 if currently on a hit slot
    sch = _gsum(sidf * zoh, K)  # current sid (0 when on noise)
    own = ((sidf == sch) & (has > 0.5)).astype(jnp.float32)
    w = jnp.maximum(cg - own, 0.0) * cps

    # noise count (+ pseudo0) per chain, broadcast lane-first (2D gather)
    # then sublane (Mosaic has no fused sublane+lane broadcast and only
    # lowers 2D gathers)
    c0_row = table_ref[:, 0:1, :].reshape(C, 128)
    c0_l = jnp.take_along_axis(
        c0_row, jnp.zeros((C, 128), jnp.int32), axis=1
    )
    c0 = jnp.broadcast_to(c0_l[:, None, :], (C, rows, 128)).reshape(CR, 128)
    own0 = 1.0 - has
    w0_first = jnp.maximum(c0 - own0, 0.0) * ncs
    w0 = _gsum(w0_first, K)  # broadcast (nonzero only at first slot)
    toth = _gsum(w, K)

    # ---- one uniform per read (group-first slot) ----------------------
    # counter-hash RNG (murmur3 finalizers over (seed, sweep, tile, row,
    # lane) — the row index spans chains): portable across compiled Mosaic
    # and interpret mode — Mosaic's pltpu.prng_* have no CPU interpret
    # impl — and deterministic, so CPU parity tests replay the TPU chains
    lane2, rowi2, lig, rig = _geom(K, CR)
    h = _mix32(
        seed_ref[0]
        + seed_ref[1] * jnp.int32(-1640531527)  # 0x9E3779B9
        + i * jnp.int32(0x7F4A7C15)
    )
    k1 = h + rowi2 * jnp.int32(128) + lane2
    u = (
        jax.lax.bitwise_and(
            jax.lax.shift_right_logical(_mix32(_mix32(k1)), jnp.int32(7)),
            jnp.int32(0xFFFFFF),
        ).astype(jnp.float32)
        * (1.0 / (1 << 24))
    )
    first = (lig == 0) & (rig == 0)
    ub = _gsum(jnp.where(first, u, 0.0), K)

    # ---- inverse-CDF sample: noise slot first, then hit slots ---------
    target = ub * (toth + w0)
    pick_noise = target < w0
    t2 = target - w0
    pre = _gprefix(w, K)
    slotidx = (rig * 128 + lig).astype(jnp.float32) if K > 128 else (
        lig.astype(jnp.float32))
    lastv = _gmax(jnp.where(w > 0, slotidx, NEG_ONE), K)
    cand = jnp.where(pre > t2, slotidx, lastv)
    chosen = _gmin(cand, K)
    znew = (
        (slotidx == chosen) & (~pick_noise) & (chosen >= 0.0)
    ).astype(jnp.float32)
    if "nosample" in ablate:
        znew = zoh + 0.0 * znew

    # ---- apply deltas to the VMEM tables ------------------------------
    # per slot-row one-hot MXU contraction over all chains at once:
    # upd[cW + t, l'] += sum_s delta_c[s] * (hi[s]-wsc == t) * (lo[s]==l')
    # — deltas are exactly +-1/0 and the one-hots exact, so a single bf16
    # pass is exact; W is R_WIN for window tiles, t_pad for wide ones.
    delta = znew - zoh
    delta3 = delta.reshape(C, rows, 128)
    w_sc = wsc_ref[i]
    iota_cw = jax.lax.broadcasted_iota(jnp.int32, (C * W, 128), 0)
    iota_t = jax.lax.rem(iota_cw, jnp.int32(W))  # window row within chain
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    dn = (((1,), (1,)), ((), ()))

    upd = jnp.zeros((C * W, 128), jnp.float32)
    scat_rows = 0 if "noscatter" in ablate else rows
    for r in range(scat_rows):  # static unroll (pallas_round's scatter)
        hi_r = hi1[r : r + 1, :] - w_sc  # [1, 128] (chain-invariant)
        lo_r = lo1[r : r + 1, :]
        d_r = jnp.broadcast_to(
            delta3[:, r : r + 1, :], (C, W, 128)
        ).reshape(C * W, 128)  # chain-major blocks of W rows
        a = jnp.where(iota_t == hi_r, d_r, 0.0).astype(jnp.bfloat16)
        b = (iota_l == lo_r).astype(jnp.bfloat16)  # b[l', s]
        upd = upd + jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32
        )
    for c in range(C):
        table_ref[c, pl.ds(w_sc, W), :] = (
            table_ref[c, pl.ds(w_sc, W), :] + upd[c * W : (c + 1) * W]
        )

    # reads conserve mass: the noise count moves opposite the hit deltas
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
    for c in range(C):
        dnoise = jnp.sum(delta3[c])
        row0 = table_ref[c, 0:1, :]
        table_ref[c, 0:1, :] = jnp.where(lane0, row0 - dnoise, row0)

    zoh_out_ref[:] = znew.reshape(C, rows, 128)


def sweep_part(
    zoh: jnp.ndarray,  # [C, X, 128] f32
    table: jnp.ndarray,  # [C, t_pad, 128] f32 (counts + pseudo)
    part: GibbsPart,
    seed: jnp.ndarray,  # [2] i32 (base-seed folded with part, sweep idx)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run one sweep over this part's tiles for every chain. Returns
    (new zoh, new table)."""
    with jax.enable_x64(False):
        C, X, _ = zoh.shape
        t_pad = table.shape[1]
        n_tiles = X // TILE_ROWS
        from functools import partial

        import os as _os

        kern = partial(_sweep_kernel, K=part.K, rows=TILE_ROWS, W=part.W,
                       C=C, ablate=_os.environ.get("RSEM_GIBBS_ABLATE", ""))
        zoh_new, table_new = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),  # win_lo
                pl.BlockSpec(memory_space=pltpu.SMEM),  # win_cnt
                pl.BlockSpec(memory_space=pltpu.SMEM),  # wsc
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0)),
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0)),
                pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0)),
                pl.BlockSpec((C, TILE_ROWS, 128), lambda i: (0, i, 0)),
                pl.BlockSpec((C, t_pad, 128), lambda i: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((C, TILE_ROWS, 128), lambda i: (0, i, 0)),
                pl.BlockSpec((C, t_pad, 128), lambda i: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(zoh.shape, jnp.float32),
                jax.ShapeDtypeStruct(table.shape, jnp.float32),
            ],
            interpret=interpret,
        )(
            seed.astype(jnp.int32), part.win_lo, part.win_cnt, part.wsc,
            part.sid_t, part.cps_t, part.ncs_t, zoh, table,
        )
        return zoh_new, table_new


def init_chains(
    key, data: PallasGibbsData, table_base: jnp.ndarray, n_chains: int
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Initial assignments z ~ conprb-CDF (Gibbs.cpp:281-291) in tile
    layout, plus the per-chain count tables.

    table_base: [t_pad * 128] f32 = init_counts + pseudo, with
    [0] += N0 + n_noise_fixed. Returns (zoh per part [C, X, 128],
    tables [C, t_pad, 128])."""
    C = n_chains
    t_pad = data.t_pad
    zohs = []
    tables = jnp.broadcast_to(
        table_base[None], (C, t_pad * 128)
    ).reshape(C, t_pad, 128)

    from .pallas_table import onehot_scatter

    for pi, part in enumerate(data.parts):
        K = part.K
        X = part.sid_t.shape[0]
        nr = X * 128 // K
        cpsr = part.cps_t.reshape(nr, K)
        ncsr = part.ncs_t.reshape(nr, K)[:, 0]
        logits = jnp.concatenate(
            [
                jnp.where(ncsr[:, None] > 0, jnp.log(
                    jnp.maximum(ncsr[:, None], 1e-30)), -jnp.inf),
                jnp.where(cpsr > 0, jnp.log(jnp.maximum(cpsr, 1e-30)),
                          -jnp.inf),
            ],
            axis=1,
        )  # [nr, 1 + K]: noise slot first (GibbsData slot order)
        valid_read = jnp.isfinite(logits).any(axis=1)

        def chain_init(key, logits=logits, valid_read=valid_read, K=K,
                       nr=nr, X=X, pi=pi):
            g = jax.random.gumbel(
                jax.random.fold_in(key, pi), logits.shape, dtype=jnp.float32
            )
            pick = jnp.argmax(
                jnp.where(jnp.isfinite(logits), logits + g, -jnp.inf),
                axis=1,
            )
            zoh = (
                (pick[:, None] == (1 + jnp.arange(K, dtype=pick.dtype)))
                & valid_read[:, None]
            ).astype(jnp.float32)
            return zoh.reshape(X, 128)

        zoh0 = jax.vmap(chain_init)(key)  # [C, X, 128]; key: [C] PRNG keys
        zohs.append(zoh0)

        # counts: hit assignments scatter; noise = valid reads not on a hit
        def hit_counts(z, part=part):
            return onehot_scatter(
                part.sid_t.reshape(-1), z.reshape(-1), t_pad * 128
            )

        hc = jax.vmap(hit_counts)(zoh0)  # [C, t_pad*128]
        n_valid = jnp.sum(valid_read.astype(jnp.float32))
        n_noise = n_valid - jnp.sum(zoh0, axis=(1, 2))  # [C]
        hc = hc.at[:, 0].add(n_noise)
        tables = tables + hc.reshape(C, t_pad, 128)
    return tuple(zohs), tables


# persistent jit wrapper (one trace cache per process)
init_chains_jit = jax.jit(init_chains, static_argnums=(3,))
