"""TPU-optimized theta-only EM rounds.

The flat segment-softmax formulation (estep.py) is correct everywhere but
lowers to per-element gathers/scatters. This module reformulates the
fixed-conprb round around the TPU's strengths:

  * reads are bucketed by alignment count into dense [N_K, K] tiles
    (K = 1,2,4,...): the per-read denominator becomes a row sum and its
    broadcast back over hits is free — this removes the read-boundary
    segment sum (measured 25 ms/round at 2.5M hits) and the denominator
    gather (~7 ms) entirely;
  * reads are ordered by their smallest hit sid, so the one remaining
    cross-layout permutation (dense fracs -> sid-sorted) has near-sorted
    indices and good DMA locality;
  * expected counts come from a segment sum over *statically sorted* sids
    via a two-level blocked cumsum (f32 within 512-wide blocks, f64 across
    blocks) — no scatters; with only M+1 boundaries this costs ~2 ms;
  * gathers are widened to [len, G] row gathers — ~8x faster than
    elementwise gathers on the VPU/DMA path;
  * per-read conprbs are pre-scaled by exp(-max logit) at freeze time so
    linear f32 never underflows (replaces the per-round log-softmax pass).

The whole EM loop runs on device inside one lax.while_loop with the
reference's convergence rule (EM.cpp:53-55,407-416).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_ROUND, MIN_ROUND, STOP_CRITERIA, THETA_CUT

# the cross-block cumsum needs real float64 (counts magnitudes reach 1e9
# reads while EM convergence tests 1e-3 relative changes); everything hot
# stays explicitly float32/int32
jax.config.update("jax_enable_x64", True)

BLOCK = 512
GATHER_W = 8  # row-gather width
IDX_CHUNK = 262144  # split gather index arrays (measured ~1.7x on VMEM tables)
RSLICE = 131072  # denominator-table slice so each chunk's source fits VMEM


def _pad_np(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    if len(x) == n:
        return x
    return np.concatenate(
        [x, np.full((n - len(x),) + x.shape[1:], fill, dtype=x.dtype)]
    )


class FastEStepData(NamedTuple):
    """Static per-dataset arrays for fixed-conprb rounds (device).

    Hits live in dense read-major buckets; `flat` refers to the
    concatenation of all buckets' [N_K, K] tiles, row-major, padded rows
    (sid 0 / cps 0) included. `sorted` refers to the static sid-sort of the
    flat slots; the only per-round cross-layout op is the gather of
    per-read-slot inverse denominators at `rslot_sorted` (a [rows_total]
    table — gather cost grows with source-table size, so indexing the
    small denominator table beats permuting the [Hp] fracs)."""

    sid_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K, K] int32 (pad: 0)
    cps_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K, K] f32 (pad: 0)
    ncs_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K] f32 (pad rows: 0)
    # hits regrouped by (read-slot RSLICE chunk, sid), per chunk:
    cps_c: Tuple[jnp.ndarray, ...]  # f32 cps per sorted slot (pad: 0)
    rloc_c: Tuple[jnp.ndarray, ...]  # int32 read-slot % RSLICE (pad: 0)
    sid_starts_c: Tuple[jnp.ndarray, ...]  # [M+2] int32 local boundaries
    rows_pad: int  # C_r * RSLICE (invd padded length)
    restore_hit: jnp.ndarray  # [H] int32 flat slot of each original hit
    restore_read_b: Tuple[np.ndarray, ...]  # per bucket [N_K] orig read id
    n_reads: int
    M: int
    n0: float


def _bucket_sizes(max_hits: int) -> list:
    out = []
    k = 1
    while k < max_hits:
        out.append(k)
        k *= 2
    out.append(k)
    return out


def natural_rows(nh: np.ndarray, sizes) -> list:
    """Rows each bucket occupies for the given hits-per-read vector (the
    padding rule of build_fast_data), without building the tiles. Used to
    force identical tile shapes across read shards (shard_map requires
    equal local shapes on every device)."""
    bucket_of = np.searchsorted(np.asarray(sizes), nh)
    rows = []
    for bi, K in enumerate(sizes):
        n_k = int((bucket_of == bi).sum())
        if K >= BLOCK:
            rows.append(max(n_k, 1))
        else:
            q = BLOCK // K
            rows.append(max(-(-n_k // q) * q, q))
    return rows


def build_fast_data(
    hits,
    log_conprb: np.ndarray,
    log_ncp: np.ndarray,
    M: int,
    n0: float,
    sizes: Optional[list] = None,
    forced_rows: Optional[list] = None,
) -> FastEStepData:
    """Host-side setup after conprb freeze. hits: io.HitArrays (unpadded);
    log_conprb/log_ncp: numpy [H]/[N].

    sizes/forced_rows: externally imposed bucket widths and per-bucket row
    counts (>= the natural ones); used by build_fast_data_sharded so every
    read shard produces identically-shaped tiles. When forced, empty
    buckets are emitted as all-padding tiles instead of skipped."""
    H = hits.n_hits
    N = hits.n_reads
    sid = hits.sid.astype(np.int64)
    offs = hits.read_offsets.astype(np.int64)  # [N+1]
    nh = np.diff(offs)  # hits per read

    # per-read max logit over hits and noise slot
    rid = np.repeat(np.arange(N, dtype=np.int64), nh)
    read_max = np.full(N, -np.inf)
    np.maximum.at(read_max, rid, log_conprb)
    read_max = np.maximum(read_max, log_ncp)
    safe_max = np.where(np.isfinite(read_max), read_max, 0.0)
    cps = np.exp(log_conprb - safe_max[rid], dtype=np.float64).astype(np.float32)
    cps[~np.isfinite(log_conprb)] = 0.0
    ncs = np.exp(log_ncp - safe_max, dtype=np.float64).astype(np.float32)
    ncs[~np.isfinite(log_ncp)] = 0.0

    # read ordering key: smallest sid among the read's hits (gather locality)
    min_sid = np.full(N, np.iinfo(np.int64).max)
    np.minimum.at(min_sid, rid, sid)

    if sizes is None:
        sizes = _bucket_sizes(int(nh.max()) if N else 1)
    bucket_of = np.searchsorted(np.asarray(sizes), nh)  # smallest K >= nh

    sid_b, cps_b, ncs_b, restore_read_b = [], [], [], []
    flat_sid_parts, flat_orig_parts = [], []
    flat_cps_parts, flat_rslot_parts = [], []
    row_base = 0
    for bi, K in enumerate(sizes):
        rsel = np.nonzero(bucket_of == bi)[0]
        if len(rsel) == 0 and forced_rows is None:
            continue
        rsel = rsel[np.argsort(min_sid[rsel], kind="stable")]
        n_k = len(rsel)
        # pad rows so the flattened bucket is BLOCK-aligned
        if K >= BLOCK:
            assert K % BLOCK == 0
            rows = max(n_k, 1)
        else:
            q = BLOCK // K
            rows = max(-(-n_k // q) * q, q)
        if forced_rows is not None:
            assert forced_rows[bi] >= rows, (bi, forced_rows[bi], rows)
            rows = forced_rows[bi]
        sid_t = np.zeros((rows, K), dtype=np.int32)
        cps_t = np.zeros((rows, K), dtype=np.float32)
        orig_t = np.full((rows, K), -1, dtype=np.int64)
        nh_sel = nh[rsel]
        tot = int(nh_sel.sum())
        run_starts = np.cumsum(nh_sel) - nh_sel
        cols = np.arange(tot) - np.repeat(run_starts, nh_sel)
        rows_idx = np.repeat(np.arange(n_k), nh_sel)
        src = np.repeat(offs[rsel], nh_sel) + cols
        sid_t[rows_idx, cols] = sid[src]
        cps_t[rows_idx, cols] = cps[src]
        orig_t[rows_idx, cols] = src
        ncs_t = np.zeros(rows, dtype=np.float32)
        ncs_t[:n_k] = ncs[rsel]
        sid_b.append(sid_t)
        cps_b.append(cps_t)
        ncs_b.append(ncs_t)
        restore_read_b.append(rsel)
        flat_sid_parts.append(sid_t.reshape(-1))
        flat_orig_parts.append(orig_t.reshape(-1))
        flat_cps_parts.append(cps_t.reshape(-1))
        # global read-slot (row index across concatenated buckets)
        flat_rslot_parts.append(
            np.repeat(row_base + np.arange(rows, dtype=np.int64), K)
        )
        row_base += rows

    flat_sid = np.concatenate(flat_sid_parts)
    flat_orig = np.concatenate(flat_orig_parts)
    flat_cps = np.concatenate(flat_cps_parts)
    flat_rslot = np.concatenate(flat_rslot_parts)
    rows_total = row_base

    # regroup hits by (read-slot chunk, sid): per chunk the denominator
    # source is a VMEM-sized RSLICE slice and the sid run structure is
    # still sorted, so counts = sum of per-chunk segment sums. Padding
    # (cps 0) is appended per chunk with sid M+1 so it lands past the last
    # real segment.
    n_chunks = max(1, -(-rows_total // RSLICE))
    rchunk = flat_rslot // RSLICE
    order = np.lexsort((flat_sid, rchunk))
    cps_c, rloc_c, sid_starts_c = [], [], []
    for k in range(n_chunks):
        sel = order[rchunk[order] == k]
        n = len(sel)
        npad = (-n) % BLOCK if n else BLOCK
        sid_k = np.concatenate(
            [flat_sid[sel], np.full(npad, M + 1, dtype=flat_sid.dtype)]
        )
        cps_k = _pad_np(flat_cps[sel], n + npad)
        rloc_k = _pad_np(
            (flat_rslot[sel] - k * RSLICE).astype(np.int32), n + npad
        )
        sid_starts_c.append(jnp.asarray(
            np.searchsorted(sid_k, np.arange(M + 2)).astype(np.int32)
        ))
        cps_c.append(jnp.asarray(cps_k))
        rloc_c.append(jnp.asarray(rloc_k))

    # original hit -> flat slot (for final posterior weights)
    restore_hit = np.empty(H, dtype=np.int64)
    valid = flat_orig >= 0
    restore_hit[flat_orig[valid]] = np.nonzero(valid)[0]

    return FastEStepData(
        sid_b=tuple(jnp.asarray(t) for t in sid_b),
        cps_b=tuple(jnp.asarray(t) for t in cps_b),
        ncs_b=tuple(jnp.asarray(t) for t in ncs_b),
        cps_c=tuple(cps_c),
        rloc_c=tuple(rloc_c),
        sid_starts_c=tuple(sid_starts_c),
        rows_pad=n_chunks * RSLICE,
        restore_hit=jnp.asarray(restore_hit.astype(np.int32)),
        restore_read_b=tuple(restore_read_b),
        n_reads=N,
        M=M,
        n0=float(n0),
    )


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Fast TPU gather: widen x to [len, G] rows, row-gather, reduce back.
    Large index arrays are split into IDX_CHUNK pieces — on VMEM-resident
    source tables the split gathers pipeline ~1.7x faster than one big one."""
    xw = jnp.broadcast_to(x[:, None] * (1.0 / GATHER_W), (x.shape[0], GATHER_W))
    n = idx.shape[0]
    if n <= IDX_CHUNK or n % IDX_CHUNK:
        nc = n // IDX_CHUNK
        head = nc * IDX_CHUNK
        if nc >= 2:
            parts = [xw[c].sum(axis=1)
                     for c in jnp.split(idx[:head], nc)] + [
                         xw[idx[head:]].sum(axis=1)]
            return jnp.concatenate(parts)
        return xw[idx].sum(axis=1)
    parts = [xw[c].sum(axis=1) for c in jnp.split(idx, n // IDX_CHUNK)]
    return jnp.concatenate(parts)


def sum64(v: jnp.ndarray) -> jnp.ndarray:
    """Accurate scalar sum: f32 block sums (short, tree-reduced) + f64 total.
    Keeps float64 off large arrays (f64 is software-emulated on TPU)."""
    n = v.shape[0]
    nb = -(-n // BLOCK)
    v2 = jnp.pad(v, (0, nb * BLOCK - n)).reshape(nb, BLOCK)
    return jnp.sum(v2.sum(axis=1).astype(jnp.float64))


def seg_sum_sorted(v: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Segment sums of v (len multiple of BLOCK) at sorted boundaries.

    Two-level: in-block f32 prefix (short sums, accurate) + cross-block f64
    cumsum (exact to ~1e-9 of total). Only the [nb]-sized block level is
    float64 — f64 on TPU is emulated, so it must never touch [H]-sized
    arrays."""
    nb = v.shape[0] // BLOCK
    v2 = v.reshape(nb, BLOCK)
    block_sums = v2.sum(axis=1).astype(jnp.float64)
    cs_blocks = jnp.concatenate(
        [jnp.zeros(1, jnp.float64), jnp.cumsum(block_sums)]
    )
    pre = jnp.cumsum(v2, axis=1)  # [nb, BLOCK] f32 within-block prefix
    blk = starts // BLOCK
    off = starts % BLOCK
    within = jnp.where(
        off > 0,
        pre[jnp.clip(blk, 0, nb - 1), jnp.maximum(off - 1, 0)],
        0.0,
    ).astype(jnp.float64)
    cs_at = cs_blocks[jnp.clip(blk, 0, nb)] + within
    return (cs_at[1:] - cs_at[:-1]).astype(jnp.float32)


def _bucket_denoms(theta: jnp.ndarray, data: FastEStepData):
    """Per-read-slot inverse denominators. Returns (invd [rows_total],
    noise fraction total (f64 scalar), per-bucket (w, inv) tiles)."""
    inv_parts = []
    noise_terms = []
    tiles = []
    for sid_t, cps_t, ncs_t in zip(data.sid_b, data.cps_b, data.ncs_b):
        rows, K = sid_t.shape
        w = gather_rows(theta, sid_t.reshape(-1)).reshape(rows, K) * cps_t
        w0 = theta[0] * ncs_t  # [rows]
        denom = w.sum(axis=1) + w0
        inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
        inv_parts.append(inv)
        noise_terms.append(sum64(w0 * inv))
        tiles.append((w, inv, w0))
    invd = jnp.concatenate(inv_parts) if len(inv_parts) > 1 else inv_parts[0]
    noise = noise_terms[0]
    for t in noise_terms[1:]:
        noise = noise + t
    return invd, noise, tiles


def fast_theta_round(
    theta: jnp.ndarray, data: FastEStepData, axis_name: Optional[str] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fixed-conprb EM round; returns (new_theta f32 [M+1], counts).

    With axis_name set (inside shard_map over read shards), the per-shard
    partial counts and noise mass are psum-merged before the replicated
    M-step — the TPU-native equivalent of the reference's serial countvs
    reduction (EM.cpp:385-398).

    counts_m = theta_m * sum_{hits of m} cps / denom(read): theta factors
    out of the per-transcript sum, so the segment sum runs over static
    (cps, read-slot) arrays and no per-round array ever needs permuting —
    the only cross-layout op is the invd gather, chunked so each chunk
    reads a VMEM-sized slice of the denominator table."""
    invd, noise, _ = _bucket_denoms(theta, data)
    rows_pad = len(data.cps_c) * RSLICE  # static (tuple length, not a leaf)
    invd = jnp.pad(invd, (0, rows_pad - invd.shape[0]))
    counts_sum = None
    for k, (cps_k, rloc_k, starts_k) in enumerate(
        zip(data.cps_c, data.rloc_c, data.sid_starts_c)
    ):
        sl = jax.lax.slice(invd, (k * RSLICE,), ((k + 1) * RSLICE,))
        u = cps_k * gather_rows(sl, rloc_k)
        part = seg_sum_sorted(u, starts_k)
        counts_sum = part if counts_sum is None else counts_sum + part
    if axis_name is not None:
        counts_sum = jax.lax.psum(counts_sum, axis_name)
        noise = jax.lax.psum(noise, axis_name)
    counts_t = counts_sum * theta  # [M+1]
    counts = counts_t.at[0].set(noise.astype(jnp.float32) + data.n0)
    theta_new = counts / jnp.sum(counts.astype(jnp.float64)).astype(jnp.float32)
    return theta_new, counts


def run_fast_em_loop(
    theta0: jnp.ndarray,
    data: FastEStepData,
    min_round: int = MIN_ROUND,
    max_round: int = MAX_ROUND,
    start_round: int = 0,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full on-device EM loop with the reference convergence rule.

    Returns (theta, counts, rounds_executed_total). With axis_name set the
    loop runs inside shard_map: theta/counts are replicated, the round's
    sufficient statistics are psum'd, so the convergence decision is
    identical on every device."""

    def cond(state):
        theta, counts, rounds, tot_num = state
        return (rounds < min_round) | ((tot_num > 0) & (rounds < max_round))

    def body(state):
        theta, counts, rounds, _ = state
        theta_new, counts = fast_theta_round(theta, data, axis_name=axis_name)
        mask = theta >= THETA_CUT
        change = jnp.where(mask, jnp.abs(theta_new - theta) / jnp.where(mask, theta, 1.0), 0.0)
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


def fast_final_fracs(theta: jnp.ndarray, data: FastEStepData):
    """Final posterior responsibilities in ORIGINAL hit/read order
    (EM.cpp:460-478 calcExpectedWeights)."""
    _, _, tiles = _bucket_denoms(theta, data)
    flat_parts = [(w * inv[:, None]).reshape(-1) for w, inv, _ in tiles]
    flat = jnp.concatenate(flat_parts) if len(flat_parts) > 1 else flat_parts[0]
    frac = flat[data.restore_hit]
    frac_noise = jnp.zeros(data.n_reads, dtype=jnp.float32)
    for (_, inv, w0), rsel in zip(tiles, data.restore_read_b):
        idx = jnp.asarray(rsel.astype(np.int32))
        nf = w0 * inv
        frac_noise = frac_noise.at[idx].set(nf[: idx.shape[0]])
    return frac, frac_noise
