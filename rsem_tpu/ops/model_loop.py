"""Fully on-device fused model-update EM rounds.

The reference runs 10 "model-update" EM rounds (EM.cpp:307-310): each round
recomputes every hit's conprb under the current model (SingleModel.h:95-146),
runs the E-step (EM.cpp:199-244), scatters posterior-weighted sufficient
statistics into the model tables (SingleModel.h:163-209) and renormalizes
them (collect/finish, EM.cpp:400-404). Round 3 of this framework ran that
cycle as 10 host-driven dispatch/sync pairs — 2.75 s/round of which the
math was milliseconds; the structure (host refit + re-upload + retrace
friction + 10 device syncs) was the cost.

This module folds all rounds into ONE jitted lax.fori_loop that never
leaves the device:

  * the conprb recompute is split once into a STATIC per-hit part
    (orientation, fragment/mate-length terms, RSPD, poly(A) masking — all
    round-invariant when the fragment length distribution is fixed) and the
    ROUND-VARYING part: the error-profile term, served from the frozen
    PreIdx indices by the VMEM-resident pallas_table gather over the
    EFFECTIVE key window (cfg.pro_keys()), and — paired — the re-estimated
    fragment-length term via two tiny-table lookups;
  * the E-step runs scale-free in linear f32: per-read max logits are
    frozen ONCE from the round-0 conprbs (model drift across update rounds
    is a few nats, clamped at +80), so the per-round segment max
    disappears; per-read denominators are a two-level blocked prefix sum
    at STATIC read boundaries (fast_estep.seg_sum_sorted) instead of an
    XLA segment op;
  * expected counts use the one-hot MXU contraction (pallas_table
    .onehot_scatter), sufficient statistics the pallas_table scatter;
  * table "finish" (normalize + cumsum) runs on device in f32 — the tables
    are KB-sized; the reference's float64 finish is reproduced on host once
    from the final round's fetched statistics, so the serialized model and
    everything downstream keeps the exact reference numerics.

Scope: model variants whose masking weights (mw) and RSPD stay fixed
across update rounds — `fused_supported` gates on that. est-RSPD and
paired-with-poly(A) fall back to the per-round host loop (engine/em.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .conprb import (
    LOG_EPS,
    NEG_INF,
    PreIdx,
    compute_log_conprb,
    compute_log_noise_conprb,
    log_lendist_pdf,
    profile_scatter_pre,
    profile_sum_pre,
)
from .fast_estep import gather_rows, seg_sum_sorted
from .layout import HitsDevice, KernelConfig, ReadsDevice, RefDevice
from .pallas_table import onehot_scatter

# w = exp(lw - s0) clamp: round-0 per-read max keeps lw - s0 <= ~0 plus a
# few nats of model drift; 80 caps runaway values below f32 overflow while
# leaving all realistic ratios exact
MAX_DRIFT = 80.0


def fused_supported(cfg: KernelConfig, has_polya: bool,
                    min_full_len: Optional[int] = None) -> bool:
    """The fused loop requires mw to be round-invariant and every
    round-varying conprb term to be expressible from frozen per-hit
    indices. mw: paired recomputes it every round and single-end
    recomputes it when est_rspd — but without poly(A) it is identically
    1 (PairedEndQModel.h:302-307, SingleModel.h:462-524 integrates only
    MASKED positions), so poly(A) is the real gate. est-RSPD (r5): the
    per-hit RSPD term and its 2-bin suffstat ride frozen indices —
    except the single-end + user-mld remarginalized update
    (SingleModel.h:178-199) and reads on transcripts shorter than B bins
    (a position can then span >2 bins)."""
    if has_polya and (cfg.paired or cfg.est_rspd):
        return False
    if cfg.est_rspd:
        if cfg.use_mld and not cfg.paired:
            return False
        if min_full_len is not None and min_full_len < cfg.B:
            return False
    return True


class ModelLoopData(NamedTuple):
    """Round-invariant device arrays for the fused loop (all leaves are
    arrays, so this NamedTuple rides through jit as a plain pytree)."""

    lp_static: jnp.ndarray  # [Hp] f32 non-profile static terms (-inf masks)
    log_mw_h: jnp.ndarray  # [Hp] f32 log mw[sid]
    lnp_static: jnp.ndarray  # [N] f32 noise length terms (-inf on lq)
    sid: jnp.ndarray  # [Hp] i32
    rid: jnp.ndarray  # [Hp] i32 (sorted; padding rows carry the last rid)
    starts: jnp.ndarray  # [N+1] i32 static read boundaries in hit space
    s0: jnp.ndarray  # [N] f32 frozen per-read max logit (round 0)
    s0_hit: jnp.ndarray  # [Hp] f32 s0[rid]
    flat1: jnp.ndarray  # PreIdx profile indices
    flat2: Optional[jnp.ndarray]
    # static per-read noise-key HISTOGRAM [N, npro_keys] (bf16 when the
    # per-read position total is <= 256 so counts stay exact, else f32):
    # the per-round noise table gather/scatter become two skinny MXU
    # matmuls instead of 128-lane table kernels (r4: 8.2 + 84.6 ms -> ~1 ms)
    noise_hist: jnp.ndarray
    npro_c: jnp.ndarray  # fixed N0 noise counts (compact key window)
    n0: jnp.ndarray  # f32 scalar
    # paired-only leaves (None on single-end)
    gld_num_idx: Optional[jnp.ndarray] = None  # [Hp] i32
    gld_den_idx: Optional[jnp.ndarray] = None  # [Hp] i32
    gld_valid: Optional[jnp.ndarray] = None  # [Hp] bool
    ins_idx: Optional[jnp.ndarray] = None  # [Hp] i32 (gld suffstat slot)
    hit_valid: Optional[jnp.ndarray] = None  # [Hp] bool
    # est-RSPD leaves (None otherwise): frozen evalCDF indices /
    # interpolants for fpos, fpos+1, effL (RSPD.h:63-75) and the 2-bin
    # suffstat spread (RSPD.h:43-59, use-masked weights)
    rs_if: Optional[jnp.ndarray] = None  # [Hp] i32
    rs_vf: Optional[jnp.ndarray] = None  # [Hp] f32
    rs_if1: Optional[jnp.ndarray] = None
    rs_vf1: Optional[jnp.ndarray] = None
    rs_ie: Optional[jnp.ndarray] = None
    rs_ve: Optional[jnp.ndarray] = None
    rs_ok: Optional[jnp.ndarray] = None  # [Hp] bool
    rs_b0: Optional[jnp.ndarray] = None  # [Hp] i32 (0-based bin)
    rs_w0: Optional[jnp.ndarray] = None  # [Hp] f32
    rs_b1: Optional[jnp.ndarray] = None
    rs_w1: Optional[jnp.ndarray] = None


def build_model_loop_data(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
    pre: PreIdx,
    model: Dict[str, jnp.ndarray],
    read_offsets: jnp.ndarray,
    npro_c: jnp.ndarray,
    n0,
    probF: float = 0.5,
) -> ModelLoopData:
    """Freeze every round-invariant term. `model` is the round-0 device
    model (its static distributions feed lp_static; its full conprb feeds
    the frozen per-read scale s0)."""
    lp_static, log_mw_h = compute_log_conprb(
        cfg, ref, m1, m2, hits, model, pre=pre, static_only=True
    )

    def len_term(lens):
        if cfg.paired or cfg.use_mld:
            return log_lendist_pdf(
                model["log_mld_pdf"], cfg.mld_lb, cfg.mld_ub, lens)
        return log_lendist_pdf(
            model["log_gld_pdf"], cfg.gld_lb, cfg.gld_ub, lens)

    lnp = len_term(m1.lens)
    if cfg.paired:
        lnp = lnp + len_term(m2.lens)
        lq = (m1.lq & m2.lq) | (m1.lens < cfg.seed_len) | (
            m2.lens < cfg.seed_len)
    else:
        lq = m1.lq
    lnp_static = jnp.where(lq | ~m1.valid, NEG_INF, lnp)

    # frozen per-read scale from the ROUND-0 full conprbs: theta <= 1 only
    # lowers logits, and profile/gld drift across update rounds is a few
    # nats, so exp(lw - s0) stays in f32 range for the whole loop
    n_reads = m1.lens.shape[0]
    lcp0 = compute_log_conprb(cfg, ref, m1, m2, hits, model, pre=pre)
    lnp0 = compute_log_noise_conprb(cfg, m1, m2, model, pre=pre)
    seg_max = jax.ops.segment_max(
        lcp0, hits.rid, num_segments=n_reads, indices_are_sorted=True
    )
    s0 = jnp.maximum(seg_max, lnp0)
    s0 = jnp.where(jnp.isfinite(s0), s0, 0.0).astype(jnp.float32)
    s0_hit = s0[hits.rid]

    # static noise-key histogram: nflat rows (sentinel = npro_keys) ->
    # per-read counts over the compact key window, chunked to bound the
    # one-hot intermediate
    K = cfg.npro_keys()
    # bf16 represents integers exactly only up to 256; per-key counts are
    # bounded by the total base positions per read, so long reads (or
    # paired reads summing past 256) keep the histogram in float32
    pos_total = pre.nflat1.shape[1] + (
        pre.nflat2.shape[1] if cfg.paired else 0)
    hist_dtype = jnp.bfloat16 if pos_total <= 256 else jnp.float32

    def hist_of(nflat):
        n_rows = nflat.shape[0]
        C = 2048
        n_pad = -(-n_rows // C) * C
        f = jnp.pad(nflat, ((0, n_pad - n_rows), (0, 0)),
                    constant_values=K)

        def chunk(fc):
            oh = fc[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None]
            return jnp.sum(oh, axis=1, dtype=jnp.int32)

        h = jax.lax.map(chunk, f.reshape(n_pad // C, C, -1))
        return h.reshape(n_pad, K)[:n_reads].astype(hist_dtype)

    noise_hist = hist_of(pre.nflat1)
    if cfg.paired:
        noise_hist = noise_hist + hist_of(pre.nflat2)

    kw = {}
    if cfg.paired:
        span = cfg.gld_ub - cfg.gld_lb
        tl = ref.tot_len[hits.sid]
        ins = hits.insert_len
        kw["gld_valid"] = (
            (ins > cfg.gld_lb) & (ins <= cfg.gld_ub) & (tl > cfg.gld_lb)
        )
        kw["gld_num_idx"] = jnp.clip(ins - cfg.gld_lb, 0, span).astype(
            jnp.int32)
        kw["gld_den_idx"] = jnp.clip(
            jnp.minimum(cfg.gld_ub, tl) - cfg.gld_lb, 0, span
        ).astype(jnp.int32)
        kw["ins_idx"] = jnp.clip(
            ins - cfg.gld_lb - 1, 0, span - 1).astype(jnp.int32)
        kw["hit_valid"] = hits.valid

    if cfg.est_rspd:
        # frozen per-hit RSPD indices (RSPD.h:63-75) + 2-bin suffstat
        # spread (RSPD.h:43-59, dominant-strand rule) — the round-varying
        # part is then two [B+2]-table lookups per hit
        B = cfg.B
        fl_i = ref.full_len[hits.sid].astype(jnp.int32)
        tl_i = ref.tot_len[hits.sid].astype(jnp.int32)
        pos_i = hits.pos.astype(jnp.int32)
        dirs_i = hits.dir.astype(jnp.int32)
        l1h = m1.lens[hits.rid].astype(jnp.int32)
        if cfg.paired:
            ins_i = hits.insert_len.astype(jnp.int32)
            fpos = jnp.where(dirs_i == 1, tl_i - pos_i - ins_i, pos_i)
            effL = jnp.minimum(fl_i, tl_i - ins_i + 1)
        else:
            fpos = jnp.where(dirs_i == 1, tl_i - pos_i - l1h, pos_i)
            effL = jnp.minimum(fl_i, tl_i - l1h + 1)
        fls = jnp.maximum(fl_i, 1)
        flf = fls.astype(jnp.float32)
        ok = (fpos >= 0) & (fpos < fl_i) & (effL >= 1)
        fpos_c = jnp.clip(fpos, 0, fls - 1)
        effL_c = jnp.clip(effL, 1, fls)

        def iv(x):
            return (
                ((x * B) // fls).astype(jnp.int32),
                x.astype(jnp.float32) * B / flf,
            )

        kw["rs_if"], kw["rs_vf"] = iv(fpos_c)
        kw["rs_if1"], kw["rs_vf1"] = iv(fpos_c + 1)
        kw["rs_ie"], kw["rs_ve"] = iv(effL_c)
        kw["rs_ok"] = ok
        if cfg.paired:
            fpos_s = fpos
            use = (fpos_s < fl_i) & hits.valid
        elif probF >= 0.1:  # ORIVALVE (utils.h)
            fpos_s = pos_i
            use = (dirs_i == 0) & (pos_i < fl_i) & hits.valid
        else:
            fpos_s = tl_i - pos_i - l1h
            use = (dirs_i == 1) & (fpos_s < fl_i) & hits.valid
        fpos_s = jnp.clip(fpos_s, 0, fls - 1)
        lo_e = fpos_s.astype(jnp.float32) / flf
        hi_e = (fpos_s.astype(jnp.float32) + 1.0) / flf
        b0 = jnp.clip((fpos_s * B) // fls, 0, B - 1).astype(jnp.int32)
        b1 = jnp.minimum(b0 + 1, B - 1)

        def edge(b):
            return b.astype(jnp.float32) / B

        w0 = jnp.maximum(
            jnp.minimum(hi_e, edge(b0 + 1)) - jnp.maximum(lo_e, edge(b0)),
            0.0,
        ) * flf
        w1 = jnp.maximum(
            jnp.minimum(hi_e, edge(b1 + 1)) - jnp.maximum(lo_e, edge(b1)),
            0.0,
        ) * flf
        w1 = jnp.where(b1 > b0, w1, 0.0)
        kw["rs_b0"] = b0
        kw["rs_w0"] = jnp.where(use, w0, 0.0)
        kw["rs_b1"] = b1
        kw["rs_w1"] = jnp.where(use, w1, 0.0)
        # lp_static carries the ROUND-0 rspd factor (via compute_log_conprb
        # static terms); strip it so the loop can re-add the live one
        r0 = _rspd_log_term(
            model["rspd_pdf"].astype(jnp.float32),
            model["rspd_cdf"].astype(jnp.float32),
            kw["rs_if"], kw["rs_vf"], kw["rs_if1"], kw["rs_vf1"],
            kw["rs_ie"], kw["rs_ve"], ok,
        )
        lp_static = jnp.where(
            jnp.isfinite(lp_static),
            lp_static - jnp.where(jnp.isfinite(r0), r0, 0.0),
            NEG_INF,
        )

    return ModelLoopData(
        lp_static=lp_static,
        log_mw_h=log_mw_h,
        lnp_static=lnp_static,
        sid=hits.sid,
        rid=hits.rid,
        starts=read_offsets.astype(jnp.int32),
        s0=s0,
        s0_hit=s0_hit,
        flat1=pre.flat1,
        flat2=pre.flat2,
        noise_hist=noise_hist,
        npro_c=jnp.asarray(npro_c, dtype=jnp.float32).reshape(-1)[
            : cfg.npro_keys()],
        n0=jnp.asarray(n0, dtype=jnp.float32),
        **kw,
    )


def tables_from_model(cfg: KernelConfig,
                      model: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Round-0 loop-carried tables (compact key windows) from the device
    model dict."""
    t = {
        "log_pro": model["log_pro"].reshape(-1).astype(jnp.float32)[
            : cfg.pro_keys()],
        "log_npro": model["log_npro"].reshape(-1).astype(jnp.float32)[
            : cfg.npro_keys()],
    }
    if cfg.paired:
        t["log_gld_pdf"] = model["log_gld_pdf"].astype(jnp.float32)
        t["log_gld_cdf"] = model["log_gld_cdf"].astype(jnp.float32)
    if cfg.est_rspd:
        t["rspd_pdf"] = model["rspd_pdf"].astype(jnp.float32)
        t["rspd_cdf"] = model["rspd_cdf"].astype(jnp.float32)
    return t


def _safe_log(x):
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), NEG_INF)


def _rspd_log_term(pdf, cdf, i_f, v_f, i_f1, v_f1, i_e, v_e, ok):
    """log RSPD::getAdjustedProb from frozen evalCDF indices (twin of
    conprb.lin_rspd_adjusted in the est_rspd branch); pdf/cdf are the
    [B+2] linear tables."""

    def ev(i, v):
        return gather_rows(cdf, i) + (
            v - i.astype(jnp.float32)
        ) * gather_rows(pdf, i + 1)

    num = ev(i_f1, v_f1) - ev(i_f, v_f)
    den = ev(i_e, v_e)
    r = jnp.where(ok & (den > 0), num / jnp.where(den > 0, den, 1.0), 0.0)
    return _safe_log(r)


def _finish_rspd(counts, pdf_prev, cdf_prev):
    """Linear [B+2] pdf/cdf from B bin masses (RSPD::finish; empty input
    keeps the previous tables)."""
    s = jnp.sum(counts)
    pdf1 = jnp.where(s > 0, counts / jnp.where(s > 0, s, 1.0), 0.0)
    z = jnp.zeros((1,), pdf1.dtype)
    pdf = jnp.concatenate([z, pdf1, z])
    cdf = jnp.concatenate([z, jnp.cumsum(pdf1), z])
    return jnp.where(s > 0, pdf, pdf_prev), jnp.where(s > 0, cdf, cdf_prev)


def _bf16_split(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x to ~16 mantissa bits
    (2^-17 relative). Against an exactly-representable second operand the
    two products keep that accuracy at 1/3 of Precision.HIGHEST's passes;
    errors stay local to each contribution under f32 accumulation."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _hist_gather(hist: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """[N] f32: per-read sum of table over the static key histogram
    (hist @ table). -inf table slots become -1e30 so absent keys
    (count 0) contribute exact zeros instead of NaN; present ones push
    the logit below the EPSILON cutoff, which maps it back to -inf."""
    t = jnp.where(table > NEG_INF, table, jnp.float32(-1e30))
    t_hi, t_lo = _bf16_split(t)
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hist, t_hi, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        hist, t_lo, dn, preferred_element_type=jnp.float32
    )


def _hist_scatter(hist: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[K] f32: posterior-weighted key counts (w @ hist)."""
    w_hi, w_lo = _bf16_split(w)
    dn = (((0,), (0,)), ((), ()))
    return jax.lax.dot_general(
        w_hi, hist, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        w_lo, hist, dn, preferred_element_type=jnp.float32
    )


def _finish_profile(pro_counts: jnp.ndarray) -> jnp.ndarray:
    """log of Profile/QProfile finish: rows normalized, empty rows zero
    (Profile.h finish; host twin model/profile.profile_finish)."""
    pc = pro_counts.reshape(-1, 5)
    s = jnp.sum(pc, axis=1, keepdims=True)
    p = jnp.where(s > 0, pc / jnp.where(s > 0, s, 1.0), 0.0)
    return _safe_log(p).reshape(-1)


def _finish_npro(cfg: KernelConfig, npro_counts: jnp.ndarray,
                 npro_c: jnp.ndarray, log_prev: jnp.ndarray) -> jnp.ndarray:
    """log of Noise(Q)Profile finish_from_counts: posterior counts + fixed
    N0 counts, normalized (per-qual row with quals, globally without).
    Empty input keeps the previous table (NoiseProfile.h:78-89)."""
    tot = npro_counts + npro_c
    if cfg.has_qual:
        t2 = tot.reshape(-1, 5)
        s = jnp.sum(t2, axis=1, keepdims=True)
        p = jnp.where(s > 0, t2 / jnp.where(s > 0, s, 1.0), 0.0)
        return _safe_log(p).reshape(-1)
    s = jnp.sum(tot)
    logp = _safe_log(jnp.where(s > 0, tot / jnp.where(s > 0, s, 1.0), 0.0))
    return jnp.where(s > 0, logp, log_prev)


def _finish_gld(gld_counts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log pdf/cdf over the frozen (lb, ub] window from posterior-weighted
    insert-length masses (PairedEndQModel.h:161-178 + LenDist finish)."""
    s = jnp.sum(gld_counts)
    pdf1 = jnp.where(s > 0, gld_counts / jnp.where(s > 0, s, 1.0), 0.0)
    z = jnp.zeros((1,), pdf1.dtype)
    pdf = jnp.concatenate([z, pdf1])
    cdf = jnp.concatenate([z, jnp.cumsum(pdf1)])
    return _safe_log(pdf), _safe_log(cdf)


def run_model_loop(
    cfg: KernelConfig,
    data: ModelLoopData,
    tables0: Dict[str, jnp.ndarray],
    theta0: jnp.ndarray,
    n_rounds: int,
    n_reads: int,
    M: int,
    axis_name: Optional[str] = None,
):
    """n_rounds fused model-update EM rounds; returns (theta, suff) where
    suff holds the FINAL round's raw sufficient statistics in the full
    reference shapes (the host refits the float64 model from them —
    engine/em.py).

    With axis_name set (inside shard_map over read shards), the per-shard
    counts and sufficient statistics psum before the M-step/table finish,
    so theta and the tables stay replicated — the fused TPU-native form of
    the reference's per-round fork/join/reduce (EM.cpp:373-404); data.n0
    must then be the TOTAL N0 (it is added once, after the psum)."""
    pre = PreIdx(flat1=data.flat1, flat2=data.flat2)
    gspan = cfg.gld_ub - cfg.gld_lb
    pro_keys = cfg.pro_keys()
    npro_keys = cfg.npro_keys()

    def body(i, carry):
        theta, t, _suff = carry
        lp = data.lp_static + profile_sum_pre(cfg, t["log_pro"], data.flat1)
        if cfg.paired:
            lp = lp + profile_sum_pre(cfg, t["log_pro"], data.flat2)
            num = gather_rows(t["log_gld_pdf"], data.gld_num_idx)
            den = gather_rows(t["log_gld_cdf"], data.gld_den_idx)
            g = jnp.where(
                data.gld_valid & (num > NEG_INF) & (den > NEG_INF),
                num - den, NEG_INF,
            )
            lp = lp + g
        if cfg.est_rspd:
            lp = lp + _rspd_log_term(
                t["rspd_pdf"], t["rspd_cdf"],
                data.rs_if, data.rs_vf, data.rs_if1, data.rs_vf1,
                data.rs_ie, data.rs_ve, data.rs_ok,
            )
        # reference op order: EPSILON cutoff on the full product, then /mw
        lp = jnp.where(lp < LOG_EPS, NEG_INF, lp)
        lp = jnp.where(data.log_mw_h > NEG_INF, lp - data.log_mw_h, NEG_INF)

        lnp = data.lnp_static + _hist_gather(data.noise_hist,
                                             t["log_npro"])
        lnp = jnp.where(lnp < LOG_EPS, NEG_INF, lnp)

        # ---- E-step, scale-free linear f32 (EM.cpp:199-244) -------------
        ltheta = _safe_log(theta)
        lw = lp + gather_rows(ltheta, data.sid)
        w = jnp.exp(jnp.minimum(lw - data.s0_hit, MAX_DRIFT))
        w0 = jnp.exp(jnp.minimum(lnp + ltheta[0] - data.s0, MAX_DRIFT))
        denom = seg_sum_sorted(w, data.starts) + w0
        inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0),
                        0.0)
        frac = w * gather_rows(inv, data.rid)
        frac_noise = w0 * inv
        counts = onehot_scatter(data.sid, frac, M + 1)
        counts = counts.at[0].add(jnp.sum(frac_noise))
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
        counts = counts.at[0].add(data.n0)
        theta_new = counts / jnp.sum(counts)

        # ---- sufficient statistics + on-device finish --------------------
        suff = {
            "pro": profile_scatter_pre(cfg, pre, frac),
            "npro": _hist_scatter(data.noise_hist, frac_noise),
        }
        if cfg.paired:
            suff["gld"] = onehot_scatter(
                data.ins_idx,
                jnp.where(data.hit_valid, frac, 0.0),
                gspan,
            )
        if cfg.est_rspd:
            suff["rspd"] = onehot_scatter(
                data.rs_b0, frac * data.rs_w0, cfg.B
            ) + onehot_scatter(data.rs_b1, frac * data.rs_w1, cfg.B)
        if axis_name is not None:
            suff = {k: jax.lax.psum(v, axis_name) for k, v in suff.items()}

        t_new = {
            "log_pro": _finish_profile(suff["pro"]),
            "log_npro": _finish_npro(cfg, suff["npro"], data.npro_c,
                                     t["log_npro"]),
        }
        if cfg.paired:
            t_new["log_gld_pdf"], t_new["log_gld_cdf"] = _finish_gld(
                suff["gld"])
        if cfg.est_rspd:
            t_new["rspd_pdf"], t_new["rspd_cdf"] = _finish_rspd(
                suff["rspd"], t["rspd_pdf"], t["rspd_cdf"])
        return theta_new, t_new, suff

    suff0 = {
        "pro": jnp.zeros(pro_keys, jnp.float32),
        "npro": jnp.zeros(npro_keys, jnp.float32),
    }
    if cfg.paired:
        suff0["gld"] = jnp.zeros(gspan, jnp.float32)
    if cfg.est_rspd:
        suff0["rspd"] = jnp.zeros(cfg.B, jnp.float32)
    theta, _t, suff = jax.lax.fori_loop(
        0, n_rounds, body, (theta0.astype(jnp.float32), tables0, suff0)
    )
    # expand compact key windows to the full reference shapes
    pro_full = cfg.pro_len * 25
    npro_full = 500 if cfg.has_qual else 5
    pro = suff["pro"]
    if pro.shape[0] != pro_full:
        pro = jnp.pad(pro, (0, pro_full - pro.shape[0]))
    npro = suff["npro"]
    if npro.shape[0] != npro_full:
        npro = jnp.pad(npro, (0, npro_full - npro.shape[0]))
    out = {"pro": pro.reshape(cfg.pro_len, 5, 5)}
    out["npro"] = npro.reshape(-1, 5) if cfg.has_qual else npro
    if cfg.paired:
        out["gld"] = suff["gld"]
    if cfg.est_rspd:
        out["rspd"] = suff["rspd"]
    return theta, out


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def jit_model_loop(cfg: KernelConfig, data: ModelLoopData,
                   tables0, theta0, n_rounds: int, n_reads: int, M: int):
    return run_model_loop(cfg, data, tables0, theta0, n_rounds, n_reads, M)


# jitted builder shared across calls (one trace per dataset geometry)
@partial(jax.jit, static_argnums=(0, 10))
def jit_build_model_loop_data(cfg: KernelConfig, ref, m1, m2, hits, pre,
                              model, read_offsets, npro_c, n0,
                              probF: float = 0.5):
    return build_model_loop_data(cfg, ref, m1, m2, hits, pre, model,
                                 read_offsets, npro_c, n0, probF=probF)
