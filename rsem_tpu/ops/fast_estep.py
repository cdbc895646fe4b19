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
    (sid 0 / cps 0) included."""

    sid_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K, K] int32 (pad: 0)
    cps_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K, K] f32 (pad: 0)
    ncs_b: Tuple[jnp.ndarray, ...]  # per bucket [N_K] f32 (pad rows: 0)
    perm: jnp.ndarray  # [Hp] int32 flat index for each sid-sorted slot
    sid_starts: jnp.ndarray  # [M+2] int32 segment boundaries, sorted order
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


def build_fast_data(
    hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int, n0: float
) -> FastEStepData:
    """Host-side setup after conprb freeze. hits: io.HitArrays (unpadded);
    log_conprb/log_ncp: numpy [H]/[N]."""
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

    sizes = _bucket_sizes(int(nh.max()) if N else 1)
    bucket_of = np.searchsorted(np.asarray(sizes), nh)  # smallest K >= nh

    sid_b, cps_b, ncs_b, restore_read_b = [], [], [], []
    flat_sid_parts, flat_orig_parts = [], []
    flat_off = 0
    # original hit index grid helper
    for bi, K in enumerate(sizes):
        rsel = np.nonzero(bucket_of == bi)[0]
        if len(rsel) == 0:
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
        flat_off += rows * K

    flat_sid = np.concatenate(flat_sid_parts)
    flat_orig = np.concatenate(flat_orig_parts)
    Hp = len(flat_sid)
    assert Hp % BLOCK == 0

    # static sid-sort permutation over flat slots; padding (sid 0, cps 0)
    # sorts into segment 0, which is overwritten by the noise count
    perm = np.argsort(flat_sid, kind="stable").astype(np.int32)
    sid_sorted = flat_sid[perm]
    sid_starts = np.searchsorted(sid_sorted, np.arange(M + 2)).astype(np.int32)

    # original hit -> flat slot (for final posterior weights)
    restore_hit = np.empty(H, dtype=np.int64)
    valid = flat_orig >= 0
    restore_hit[flat_orig[valid]] = np.nonzero(valid)[0]

    return FastEStepData(
        sid_b=tuple(jnp.asarray(t) for t in sid_b),
        cps_b=tuple(jnp.asarray(t) for t in cps_b),
        ncs_b=tuple(jnp.asarray(t) for t in ncs_b),
        perm=jnp.asarray(perm),
        sid_starts=jnp.asarray(sid_starts),
        restore_hit=jnp.asarray(restore_hit.astype(np.int32)),
        restore_read_b=tuple(restore_read_b),
        n_reads=N,
        M=M,
        n0=float(n0),
    )


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Fast TPU gather: widen x to [len, G] rows, row-gather, reduce back."""
    xw = jnp.broadcast_to(x[:, None] * (1.0 / GATHER_W), (x.shape[0], GATHER_W))
    return xw[idx].sum(axis=1)


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


def _bucket_fracs(theta: jnp.ndarray, data: FastEStepData):
    """Per-bucket posterior fractions. Returns (flat fracs [Hp],
    noise fraction sums per bucket (f64 scalar), noise fracs per bucket)."""
    flat_parts = []
    noise_terms = []
    noise_fracs = []
    for sid_t, cps_t, ncs_t in zip(data.sid_b, data.cps_b, data.ncs_b):
        rows, K = sid_t.shape
        w = gather_rows(theta, sid_t.reshape(-1)).reshape(rows, K) * cps_t
        w0 = theta[0] * ncs_t  # [rows]
        denom = w.sum(axis=1) + w0
        inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
        frac = w * inv[:, None]
        flat_parts.append(frac.reshape(-1))
        nf = w0 * inv
        noise_fracs.append(nf)
        noise_terms.append(sum64(nf))
    flat = jnp.concatenate(flat_parts) if len(flat_parts) > 1 else flat_parts[0]
    noise = noise_terms[0]
    for t in noise_terms[1:]:
        noise = noise + t
    return flat, noise, noise_fracs


def fast_theta_round(
    theta: jnp.ndarray, data: FastEStepData
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fixed-conprb EM round; returns (new_theta f32 [M+1], counts)."""
    flat, noise, _ = _bucket_fracs(theta, data)
    frac_sorted = gather_rows(flat, data.perm)
    counts_t = seg_sum_sorted(frac_sorted, data.sid_starts)  # [M+1]
    counts = counts_t.at[0].set(noise.astype(jnp.float32) + data.n0)
    theta_new = counts / jnp.sum(counts.astype(jnp.float64)).astype(jnp.float32)
    return theta_new, counts


def run_fast_em_loop(
    theta0: jnp.ndarray,
    data: FastEStepData,
    min_round: int = MIN_ROUND,
    max_round: int = MAX_ROUND,
    start_round: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full on-device EM loop with the reference convergence rule.

    Returns (theta, counts, rounds_executed_total)."""

    def cond(state):
        theta, counts, rounds, tot_num = state
        return (rounds < min_round) | ((tot_num > 0) & (rounds < max_round))

    def body(state):
        theta, counts, rounds, _ = state
        theta_new, counts = fast_theta_round(theta, data)
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
    flat, _, noise_fracs = _bucket_fracs(theta, data)
    frac = flat[data.restore_hit]
    frac_noise = jnp.zeros(data.n_reads, dtype=jnp.float32)
    for nf, rsel in zip(noise_fracs, data.restore_read_b):
        idx = jnp.asarray(rsel.astype(np.int32))
        frac_noise = frac_noise.at[idx].set(nf[: idx.shape[0]])
    return frac, frac_noise
