"""E-step: segment softmax over each read's alignments + noise slot.

Replaces the reference's per-read C++ loop (EM.cpp:199-244). All work is flat
over hits: responsibilities are a numerically-stable per-read softmax of
log(theta[sid]) + log(conprb), with the noise isoform as one extra implicit
slot per read; expected counts are a segment scatter-add into the [M+1]
count vector.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .conprb import (
    CHUNK,
    LOG_EPS,
    NEG_INF,
    PreIdx,
    _ceil_to,
    _pad_chunk,
    map_hit_chunks,
    noise_scatter_pre,
    profile_indices,
    profile_scatter_pre,
)
from .pallas_table import onehot_scatter
from .layout import HitsDevice, KernelConfig, ReadsDevice, RefDevice


def map_chunks_reduce(fn, n: int, arrays, chunk: int = CHUNK):
    """lax.map `fn` over [chunk]-slices; fn returns an accumulator (or tuple);
    per-chunk accumulators are summed. Padding lanes must carry zero weight."""
    n_pad = max(_ceil_to(n, chunk), chunk)
    reshaped = tuple(
        _pad_chunk(a, n_pad, 0).reshape((n_pad // chunk, chunk) + a.shape[1:])
        for a in arrays
    )
    out = jax.lax.map(fn, reshaped)
    return jax.tree.map(lambda o: o.sum(axis=0), out)


class EStepOut(NamedTuple):
    frac_hit: jnp.ndarray  # [H] posterior responsibility per hit
    frac_noise: jnp.ndarray  # [N] noise responsibility per read
    counts: jnp.ndarray  # [M+1] expected counts (without +N0)


def estep_fracs(
    log_theta: jnp.ndarray,  # [M+1]
    sid: jnp.ndarray,  # [H]
    rid: jnp.ndarray,  # [H] sorted
    log_conprb: jnp.ndarray,  # [H]
    log_ncp: jnp.ndarray,  # [N]
    n_reads: int,
    M: int,
) -> EStepOut:
    lw = log_theta[sid] + log_conprb
    lw0 = log_theta[0] + log_ncp
    # reference zeroes absolute weights below EPSILON (EM.cpp:213-222)
    lw = jnp.where(lw < LOG_EPS, NEG_INF, lw)
    lw0 = jnp.where(lw0 < LOG_EPS, NEG_INF, lw0)

    seg_max = jax.ops.segment_max(
        lw, rid, num_segments=n_reads, indices_are_sorted=True
    )
    m = jnp.maximum(seg_max, lw0)
    m_safe = jnp.where(m > NEG_INF, m, 0.0)
    e_h = jnp.where(lw > NEG_INF, jnp.exp(lw - m_safe[rid]), 0.0)
    e_0 = jnp.where(lw0 > NEG_INF, jnp.exp(lw0 - m_safe), 0.0)
    denom = (
        jax.ops.segment_sum(e_h, rid, num_segments=n_reads, indices_are_sorted=True)
        + e_0
    )
    denom_safe = jnp.where(denom > 0, denom, 1.0)
    frac_hit = e_h / denom_safe[rid]
    frac_noise = e_0 / denom_safe

    counts = jnp.zeros(M + 1, dtype=jnp.float32).at[sid].add(frac_hit)
    counts = counts.at[0].add(jnp.sum(frac_noise))
    return EStepOut(frac_hit, frac_noise, counts)


def em_step(
    log_theta: jnp.ndarray,
    sid: jnp.ndarray,
    rid: jnp.ndarray,
    log_conprb: jnp.ndarray,
    log_ncp: jnp.ndarray,
    n_reads: int,
    M: int,
    n0: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One theta-only EM round (conprb fixed); returns (theta, counts)."""
    out = estep_fracs(log_theta, sid, rid, log_conprb, log_ncp, n_reads, M)
    counts = out.counts.at[0].add(n0)
    theta = counts / jnp.sum(counts)
    return theta, counts


# --------------------------------------------------------------------- #
# model sufficient statistics (update-model rounds; reference:           #
# SingleModel::update / PairedEndQModel::update)                         #
# --------------------------------------------------------------------- #
def suffstats(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
    frac_hit: jnp.ndarray,  # [H]
    frac_noise: jnp.ndarray,  # [N]
    model: Dict[str, jnp.ndarray],
    probF: float,
    pre: Optional[PreIdx] = None,
) -> Dict[str, jnp.ndarray]:
    """Posterior-weighted count tensors for this round's model refresh.

    With `pre` the profile scatter reuses the frozen [H, L] indices from
    precompute_profile_indices instead of re-walking the reference."""
    out: Dict[str, jnp.ndarray] = {}
    pro_size = cfg.pro_len * 25

    if pre is not None:
        # frozen sentinel-masked indices: one scatter over ALL hits with
        # the per-hit posterior as the row weight (sentinel lanes land in
        # sliced-off padding slots); VMEM-table Pallas kernel on TPU.
        # The scatter covers the effective key window (cfg.pro_keys());
        # slots beyond it are structurally unreachable -> zero-pad.
        pc = profile_scatter_pre(cfg, pre, frac_hit.astype(jnp.float32))
        if pc.shape[0] != pro_size:
            pc = jnp.pad(pc, (0, pro_size - pc.shape[0]))
        out["pro"] = pc.reshape(cfg.pro_len, 5, 5)
    else:
        def pro_chunk(args):
            if cfg.paired:
                rid, sid, dirs, pos, ins, frac = args
            else:
                rid, sid, dirs, pos, frac = args
                ins = None
            tl = ref.tot_len[sid]
            flat, valid = profile_indices(
                cfg, ref, m1.codes[rid],
                m1.quals[rid] if cfg.has_qual else None,
                m1.lens[rid], sid, pos, dirs,
            )
            w = jnp.where(valid, frac[:, None], 0.0)
            acc = onehot_scatter(flat, w, pro_size)
            if cfg.paired:
                flat2, valid2 = profile_indices(
                    cfg, ref, m2.codes[rid],
                    m2.quals[rid] if cfg.has_qual else None,
                    m2.lens[rid], sid, tl - pos - ins, 1 - dirs,
                )
                w2 = jnp.where(valid2, frac[:, None], 0.0)
                acc = acc + onehot_scatter(flat2, w2, pro_size)
            return acc

        arrays = (hits.rid, hits.sid, hits.dir, hits.pos)
        if cfg.paired:
            arrays = arrays + (hits.insert_len,)
        arrays = arrays + (frac_hit,)
        pro_counts = map_chunks_reduce(pro_chunk, hits.rid.shape[0], arrays)
        out["pro"] = pro_counts.reshape(cfg.pro_len, 5, 5)

    # noise sufficient statistics from alignable reads (updateNoise)
    npro_size = 500 if cfg.has_qual else 5

    def npro_for(mate: ReadsDevice):
        L = mate.codes.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        readc = mate.codes.astype(jnp.int32)
        if cfg.has_qual:
            flat = mate.quals.astype(jnp.int32) * 5 + readc
        else:
            flat = readc
        valid = (j < mate.lens[:, None]) & mate.valid[:, None]
        w = jnp.where(valid, frac_noise[:, None], 0.0)
        return onehot_scatter(flat, w, npro_size)

    if pre is not None and pre.nflat1 is not None:
        npro_counts = noise_scatter_pre(cfg, pre.nflat1, frac_noise)
        if cfg.paired:
            npro_counts = npro_counts + noise_scatter_pre(
                cfg, pre.nflat2, frac_noise)
        if npro_counts.shape[0] != npro_size:
            npro_counts = jnp.pad(
                npro_counts, (0, npro_size - npro_counts.shape[0]))
    else:
        npro_counts = npro_for(m1)
        if cfg.paired:
            npro_counts = npro_counts + npro_for(m2)
    out["npro"] = (
        npro_counts.reshape(100, 5) if cfg.has_qual else npro_counts
    )

    if cfg.paired:
        gspan = cfg.gld_ub - cfg.gld_lb
        ins_idx = jnp.clip(hits.insert_len - cfg.gld_lb - 1, 0, gspan - 1)
        out["gld"] = jnp.zeros(gspan, dtype=jnp.float32).at[ins_idx].add(
            jnp.where(hits.valid, frac_hit, 0.0)
        )

    if cfg.est_rspd:
        out["rspd"] = _rspd_stats(cfg, ref, m1, hits, frac_hit, model, probF)

    return out


def _rspd_stats(cfg, ref, m1, hits, frac_hit, model, probF):
    """RSPD bin masses with the single-dominant-strand rule
    (SingleModel.h:167-199; PairedEndQModel.h:165-170)."""
    B = cfg.B
    ORIVALVE = 0.1

    def overlaps(fpos, full_len, frac):
        """[C, B] fractional-bin spreading of each position interval."""
        # padding lanes carry sid 0 whose full_len is 0; they have frac 0 but
        # must not poison the sum with inf/NaN
        full_len = jnp.maximum(full_len, 1)
        lo = fpos.astype(jnp.float32) / full_len.astype(jnp.float32)
        hi = (fpos.astype(jnp.float32) + 1.0) / full_len.astype(jnp.float32)
        edges = jnp.arange(B + 1, dtype=jnp.float32) / B
        seg = jnp.minimum(hi[:, None], edges[None, 1:]) - jnp.maximum(
            lo[:, None], edges[None, :-1]
        )
        seg = jnp.maximum(seg, 0.0) * full_len.astype(jnp.float32)[:, None]
        return seg * frac[:, None]

    def chunk_fn(args):
        if cfg.paired:
            rid, sid, dirs, pos, ins, frac, valid = args
        else:
            rid, sid, dirs, pos, frac, valid = args
            ins = None
        fl = ref.full_len[sid]
        tl = ref.tot_len[sid]
        frac = jnp.where(valid, frac, 0.0)
        if cfg.paired:
            fpos = jnp.where(dirs == 1, tl - pos - ins, pos)
            use = fpos < fl
            return jnp.sum(overlaps(fpos, fl, jnp.where(use, frac, 0.0)), axis=0)
        l1 = m1.lens[rid]
        if probF >= ORIVALVE:
            fpos = pos
            use = (dirs == 0) & (fpos < fl)
        else:
            fpos = tl - pos - l1
            use = (dirs == 1) & (fpos < fl)
        # NOTE: the single-end + user-mld remarginalized update
        # (SingleModel.h:178-199) is handled by the engine separately.
        return jnp.sum(overlaps(fpos, fl, jnp.where(use, frac, 0.0)), axis=0)

    arrays = (hits.rid, hits.sid, hits.dir, hits.pos)
    if cfg.paired:
        arrays = arrays + (hits.insert_len,)
    arrays = arrays + (frac_hit, hits.valid)
    return map_chunks_reduce(chunk_fn, hits.rid.shape[0], arrays)
