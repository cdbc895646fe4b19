"""Per-hit alignment log-likelihood (conprb) kernels.

The reference computes conprb per (read, hit) in nested C++ loops
(SingleModel.h:95-146, PairedEndQModel.h:94-138). Here every hit is a lane of
a flat vectorized computation in log space: float32 log-probabilities remain
exact far below the linear-float32 underflow point, so the reference's
EPSILON=1e-300 cutoffs translate to a -690.776 logit cutoff.

All kernels process hits in fixed-size chunks via lax.map to bound peak
memory at [CHUNK, max_read_len] regardless of dataset size.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .fast_estep import gather_rows
from .layout import HitsDevice, KernelConfig, ReadsDevice, RefDevice

NEG_INF = -jnp.inf
LOG_EPS = math.log(1e-300)  # reference EPSILON cutoff, in logits
CHUNK = 16384


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_chunk(arr: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    if arr.shape[0] == n:
        return arr
    pad_width = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=fill)


def map_hit_chunks(fn, n: int, arrays: Tuple[jnp.ndarray, ...], chunk: int = CHUNK):
    """Apply fn over [chunk]-sized slices of flat per-hit arrays; returns the
    concatenated [n] (or tuple of [n]) results."""
    n_pad = max(_ceil_to(n, chunk), chunk)
    reshaped = tuple(
        _pad_chunk(a, n_pad, 0).reshape((n_pad // chunk, chunk) + a.shape[1:])
        for a in arrays
    )
    out = jax.lax.map(fn, reshaped)
    if isinstance(out, tuple):
        return tuple(o.reshape((n_pad,) + o.shape[2:])[:n] for o in out)
    return out.reshape((n_pad,) + out.shape[2:])[:n]


# --------------------------------------------------------------------- #
# distribution lookups (vector, log and linear)                          #
# --------------------------------------------------------------------- #
def log_lendist_adjusted(log_pdf, log_cdf, lb: int, ub: int, length, refL):
    """log of LenDist::getAdjustedProb (LenDist.h:63-70)."""
    span = ub - lb
    valid = (length > lb) & (length <= ub) & (refL > lb)
    denom = log_cdf[jnp.clip(jnp.minimum(ub, refL) - lb, 0, span)]
    num = log_pdf[jnp.clip(length - lb, 0, span)]
    out = num - denom
    return jnp.where(valid & (num > NEG_INF) & (denom > NEG_INF), out, NEG_INF)


def lin_lendist_adjusted(pdf, cdf, lb: int, ub: int, length, refL):
    span = ub - lb
    valid = (length > lb) & (length <= ub) & (refL > lb)
    denom = cdf[jnp.clip(jnp.minimum(ub, refL) - lb, 0, span)]
    num = pdf[jnp.clip(length - lb, 0, span)]
    return jnp.where(valid & (denom > 0), num / jnp.where(denom == 0, 1.0, denom), 0.0)


def log_lendist_pdf(log_pdf, lb: int, ub: int, length):
    """log of LenDist::getProb."""
    span = ub - lb
    valid = (length > lb) & (length <= ub)
    return jnp.where(valid, log_pdf[jnp.clip(length - lb, 0, span)], NEG_INF)


def rspd_eval_cdf(rspd_pdf, rspd_cdf, B: int, fpos, full_len):
    """RSPD::evalCDF linear interpolation (RSPD.h:63-68)."""
    i = (fpos.astype(jnp.int32) * B) // full_len.astype(jnp.int32)
    val = fpos.astype(jnp.float32) / full_len.astype(jnp.float32) * B
    return rspd_cdf[i] + (val - i.astype(jnp.float32)) * rspd_pdf[i + 1]


def lin_rspd_adjusted(cfg: KernelConfig, rspd_pdf, rspd_cdf, fpos, effL, full_len):
    """RSPD::getAdjustedProb (RSPD.h:70-75); out-of-support positions -> 0."""
    ok = (fpos >= 0) & (fpos < full_len) & (effL >= 1)
    if not cfg.est_rspd:
        return jnp.where(ok, 1.0 / jnp.maximum(effL, 1).astype(jnp.float32), 0.0)
    fpos_c = jnp.clip(fpos, 0, full_len - 1)
    effL_c = jnp.clip(effL, 1, full_len)
    denom = rspd_eval_cdf(rspd_pdf, rspd_cdf, cfg.B, effL_c, full_len)
    num = rspd_eval_cdf(
        rspd_pdf, rspd_cdf, cfg.B, fpos_c + 1, full_len
    ) - rspd_eval_cdf(rspd_pdf, rspd_cdf, cfg.B, fpos_c, full_len)
    out = jnp.where(denom > 0, num / jnp.where(denom == 0, 1.0, denom), 0.0)
    return jnp.where(ok, out, 0.0)


def _safe_log(x):
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), NEG_INF)


# --------------------------------------------------------------------- #
# profile index computation (shared by conprb and suffstats)             #
# --------------------------------------------------------------------- #
def profile_indices(
    cfg: KernelConfig,
    ref: RefDevice,
    read_codes: jnp.ndarray,  # [C, L] gathered rows
    read_quals: Optional[jnp.ndarray],
    read_lens: jnp.ndarray,  # [C]
    sid: jnp.ndarray,
    pos: jnp.ndarray,
    dirs: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat indices into the (pro_len*5*5) profile table per (hit, read
    position), plus a validity mask. Mirrors Profile/QProfile::getProb's
    ref.get_id(i+pos, dir) walk (RefSeq.h:99-104)."""
    L = cfg.max_read_len
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    off = ref.offsets[sid][:, None]
    tl = ref.tot_len[sid][:, None]
    posc = pos[:, None]
    fwd = off + posc + j
    rev = off + tl - 1 - posc - j
    ridx = jnp.where(dirs[:, None] == 1, rev, fwd)
    ridx = jnp.clip(ridx, 0, ref.codes.shape[0] - 1)
    refc = jnp.take(ref.codes, ridx).astype(jnp.int32)
    refc = jnp.where(
        dirs[:, None] == 1, jnp.where(refc < 4, 3 - refc, refc), refc
    )
    readc = read_codes.astype(jnp.int32)
    if cfg.has_qual:
        key = read_quals.astype(jnp.int32)
    else:
        key = jnp.broadcast_to(j, readc.shape)
    flat = (key * 5 + refc) * 5 + readc
    valid = j < read_lens[:, None]
    return flat, valid


def _profile_logprob(cfg, log_pro_flat, ref, read_codes, read_quals, read_lens,
                     sid, pos, dirs):
    flat, valid = profile_indices(
        cfg, ref, read_codes, read_quals, read_lens, sid, pos, dirs
    )
    # widened-row gather into the small (<=25k-entry) table: rows of
    # GATHER_W copies ride the DMA path ~8x faster than scalar gathers
    vals = gather_rows(log_pro_flat, flat.reshape(-1)).reshape(flat.shape)
    return jnp.sum(jnp.where(valid, vals, 0.0), axis=1)


class PreIdx(NamedTuple):
    """Round-invariant per-(hit, position) profile-table indices.

    The reference recomputes ref.get_id(pos+i, dir) per E_STEP round
    (SingleModel.h:95-146); on TPU the walk (reference-code gather + index
    arithmetic over [H, L]) dominates the conprb pass while its RESULT
    never changes across model rounds — only the table values do. Freezing
    the flat indices once turns every later conprb/suffstats pass into a
    pure table gather/scatter served by the VMEM-resident Pallas kernels
    (ops/pallas_table) or an XLA fallback.

    Layout contract: [Hp, 128] int32 (position axis padded 128-wide),
    invalid lanes (past read length, pad columns) carry the SENTINEL slot
    pro_size — the first zero-padding slot of the padded table, so they
    gather 0 and scatter into sliced-off slots. No separate validity mask
    is needed anywhere downstream."""

    flat1: jnp.ndarray  # [Hp, pre_cols] int32, sentinel-masked
    flat2: Optional[jnp.ndarray]  # paired: mate2 indices
    # per-READ noise-profile indices (same contract, sentinel = npro_size,
    # rows padded to the kernel tile); None when built by older callers
    nflat1: Optional[jnp.ndarray] = None
    nflat2: Optional[jnp.ndarray] = None


PRE_COLS = 128  # minimum PreIdx position-axis width (lane-aligned)


def pre_cols(max_read_len: int) -> int:
    """PreIdx position-axis width: the smallest 128 multiple covering the
    read length (128 for <=128bp, 256 for 150bp Illumina, ...)."""
    return max(PRE_COLS, _ceil_to(max_read_len, 128))


def precompute_profile_indices(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
) -> PreIdx:
    pro_size = cfg.pro_keys()  # effective key bound (sentinel slot)
    sentinel = jnp.int32(pro_size)
    cols = pre_cols(cfg.max_read_len)
    padC = cols - cfg.max_read_len

    def mask_pad(flat, valid):
        f = jnp.where(valid, flat, sentinel)
        if padC:
            f = jnp.pad(f, ((0, 0), (0, padC)), constant_values=pro_size)
        return f.astype(jnp.int32)

    def chunk_fn(args):
        if cfg.paired:
            rid, sid, dirs, pos, ins = args
        else:
            rid, sid, dirs, pos = args
        tl = ref.tot_len[sid]
        f1, v1 = profile_indices(
            cfg, ref, m1.codes[rid], m1.quals[rid] if cfg.has_qual else None,
            m1.lens[rid], sid, pos, dirs,
        )
        if not cfg.paired:
            return mask_pad(f1, v1)
        f2, v2 = profile_indices(
            cfg, ref, m2.codes[rid], m2.quals[rid] if cfg.has_qual else None,
            m2.lens[rid], sid, tl - pos - ins, 1 - dirs,
        )
        return mask_pad(f1, v1), mask_pad(f2, v2)

    arrays = (hits.rid, hits.sid, hits.dir, hits.pos)
    if cfg.paired:
        arrays = arrays + (hits.insert_len,)
    out = map_hit_chunks(chunk_fn, hits.rid.shape[0], arrays)

    npro_size = cfg.npro_keys()
    from .pallas_table import ROWS as _ROWS

    def noise_flat(mate: ReadsDevice) -> jnp.ndarray:
        L = mate.codes.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        readc = mate.codes.astype(jnp.int32)
        flat = (mate.quals.astype(jnp.int32) * 5 + readc
                if cfg.has_qual else readc)
        valid = (j < mate.lens[:, None]) & mate.valid[:, None]
        f = jnp.where(valid, flat, npro_size).astype(jnp.int32)
        N = f.shape[0]
        rpad = -(-N // _ROWS) * _ROWS - N
        return jnp.pad(f, ((0, rpad), (0, cols - L)),
                       constant_values=npro_size)

    nf1 = noise_flat(m1)
    nf2 = noise_flat(m2) if cfg.paired else None
    if cfg.paired:
        return PreIdx(flat1=out[0], flat2=out[1], nflat1=nf1, nflat2=nf2)
    return PreIdx(flat1=out, flat2=None, nflat1=nf1, nflat2=None)


def precompute_profile_indices_eager(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
) -> PreIdx:
    """PreIdx via EAGER full-array ops instead of one jitted program.

    On the axon remote-compile platform the monolithic jitted
    precompute_profile_indices program hit multi-minute (and occasionally
    unbounded) server-side compiles, unlike its individual ops which each
    compile in seconds and hit the per-op executable cache (measured r4:
    standalone u8 takes 2-6s first-call vs 211-1100s for the fused
    program). This variant runs the identical math op-by-op on full
    arrays; it is one-time per dataset, bounded by a few GB of transient
    HBM ([Hp, L] i32 intermediates)."""
    pro_size = cfg.pro_keys()
    cols = pre_cols(cfg.max_read_len)
    padC = cols - cfg.max_read_len

    def mask_pad(flat, valid):
        f = jnp.where(valid, flat, pro_size)
        if padC:
            f = jnp.pad(f, ((0, 0), (0, padC)), constant_values=pro_size)
        return f.astype(jnp.int32)

    rid, sid, dirs, pos = hits.rid, hits.sid, hits.dir, hits.pos
    tl = ref.tot_len[sid]

    def one(mate: ReadsDevice, p, d):
        f, v = profile_indices(
            cfg, ref, mate.codes[rid],
            mate.quals[rid] if cfg.has_qual else None,
            mate.lens[rid], sid, p, d,
        )
        return mask_pad(f, v)

    f1 = one(m1, pos, dirs)
    f2 = (one(m2, tl - pos - hits.insert_len, 1 - dirs)
          if cfg.paired else None)

    npro_size = cfg.npro_keys()
    from .pallas_table import ROWS as _ROWS

    def noise_flat(mate: ReadsDevice) -> jnp.ndarray:
        L = mate.codes.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        readc = mate.codes.astype(jnp.int32)
        flat = (mate.quals.astype(jnp.int32) * 5 + readc
                if cfg.has_qual else readc)
        valid = (j < mate.lens[:, None]) & mate.valid[:, None]
        f = jnp.where(valid, flat, npro_size).astype(jnp.int32)
        N = f.shape[0]
        rpad = -(-N // _ROWS) * _ROWS - N
        return jnp.pad(f, ((0, rpad), (0, cols - L)),
                       constant_values=npro_size)

    nf1 = noise_flat(m1)
    nf2 = noise_flat(m2) if cfg.paired else None
    return PreIdx(flat1=f1, flat2=f2, nflat1=nf1, nflat2=nf2)


def _win_pad(L: int) -> Tuple[int, int]:
    """(front pad P, padded window width) for the windowed ref-code
    layout."""
    P = _ceil_to(max(L, 1), 64)
    return P, _ceil_to(P + 64, 128)


def _build_ref_windows(codes: jnp.ndarray, L: int) -> jnp.ndarray:
    """Overlapping 64-aligned windows over the concatenated reference
    codes: ref2[k, t] = codes_padded[64*k + t], t < WINP, with a
    P = ceil64(L) front pad. Any L-wide span starting at absolute
    position p >= -P is then row (p + P) >> 6, lanes ((p + P) & 63) ..+L
    — one fast ROW gather plus a lane-shift kernel, instead of a [H, L]
    elementwise gather (~10x runtime; the shift runs as a Pallas kernel
    because every XLA formulation of it compiled for minutes on this
    platform)."""
    P, WINP = _win_pad(L)
    T = codes.shape[0]
    K = -(-(P + T) // 64) + 1
    total = K * 64 + WINP
    cp = jnp.concatenate([
        jnp.zeros(P, codes.dtype), codes,
        jnp.zeros(total - P - T, codes.dtype),
    ])
    parts = [
        cp[s * 64 : s * 64 + K * 64].reshape(K, 64)
        for s in range(WINP // 64)
    ]
    return jnp.concatenate(parts, axis=1)


_SHIFT_ROWS = 512  # row tile of the lane-shift kernel


def _lane_shift_kernel(shift_ref, rows_ref, out_ref, *, L: int):
    """out[r, :L] = rows[r, shift[r] : shift[r]+L] (shift in [0, 64)) via
    a 6-step binary roll cascade on the VPU."""
    try:
        from jax.experimental.pallas import tpu as pltpu_
    except Exception:  # pragma: no cover
        pltpu_ = None
    # i32 throughout: tpu.dynamic_rotate has no sub-32-bit support
    cur = rows_ref[:].astype(jnp.int32)
    s = shift_ref[:]  # [R, 1] i32
    WINP = cur.shape[1]
    for b in (32, 16, 8, 4, 2, 1):
        # left-shift by b == circular roll by WINP - b (positive shift);
        # wrapped lanes never reach [:, :L] since shift <= 63 < WINP - L
        try:
            rolled = pltpu_.roll(cur, WINP - b, axis=1)
        except Exception:
            rolled = jnp.roll(cur, WINP - b, axis=1)
        bit = jax.lax.bitwise_and(s, jnp.int32(b)) != 0
        cur = jnp.where(jnp.broadcast_to(bit, cur.shape), rolled, cur)
    out_ref[:] = cur[:, :L].astype(out_ref.dtype)


def _lane_shift(rows: jnp.ndarray, shift: jnp.ndarray, L: int,
                interpret: bool) -> jnp.ndarray:
    """Per-row dynamic lane shift [H, WINP] -> [H, L]."""
    try:
        from jax.experimental import pallas as pl_
        from jax.experimental.pallas import tpu as pltpu_
    except Exception:  # pragma: no cover — no Mosaic: XLA fallback
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(rows, shift[:, None] + j, axis=1)
    H, WINP = rows.shape
    R = _SHIFT_ROWS
    Hp = _ceil_to(max(H, R), R)
    rows_p = jnp.pad(rows, ((0, Hp - H), (0, 0)))
    shift_p = jnp.pad(shift, (0, Hp - H)).reshape(Hp, 1)
    out = pl_.pallas_call(
        partial(_lane_shift_kernel, L=L),
        grid=(Hp // R,),
        in_specs=[
            pl_.BlockSpec((R, 1), lambda i: (i, 0)),
            pl_.BlockSpec((R, WINP), lambda i: (i, 0)),
        ],
        out_specs=pl_.BlockSpec((R, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, L), rows.dtype),
        interpret=interpret,
    )(shift_p.astype(jnp.int32), rows_p)
    return out[:H]


def _refc_windowed(ref2: jnp.ndarray, starts: jnp.ndarray,
                   dirs: jnp.ndarray, L: int,
                   interpret: bool) -> jnp.ndarray:
    """[H, L] reference base codes for L-wide spans (absolute padded start
    per hit; reverse-strand rows are flipped and complemented)."""
    k = jax.lax.shift_right_logical(starts, jnp.int32(6))
    shift = jax.lax.bitwise_and(starts, jnp.int32(63))
    rows = ref2[k]  # [H, WINP] row gather (int8)
    win = _lane_shift(rows, shift, L, interpret).astype(jnp.int32)
    winr = jnp.flip(win, axis=1)
    refc = jnp.where(dirs[:, None] == 1, winr, win)
    return jnp.where(
        dirs[:, None] == 1, jnp.where(refc < 4, 3 - refc, refc), refc
    )


def profile_indices_windowed(
    cfg: KernelConfig,
    ref: RefDevice,
    ref2: jnp.ndarray,
    read_codes: jnp.ndarray,
    read_quals: Optional[jnp.ndarray],
    read_lens: jnp.ndarray,
    sid: jnp.ndarray,
    pos: jnp.ndarray,
    dirs: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """profile_indices with the windowed reference-code extraction
    (numerically identical on valid lanes; invalid lanes are masked by
    the returned validity exactly as in profile_indices)."""
    L = cfg.max_read_len
    P, _ = _win_pad(L)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    off = ref.offsets[sid].astype(jnp.int32)
    tl = ref.tot_len[sid].astype(jnp.int32)
    posc = pos.astype(jnp.int32)
    d = dirs.astype(jnp.int32)
    starts = jnp.where(
        d == 1, off + tl - 1 - posc - (L - 1), off + posc
    ) + P
    interpret = jax.default_backend() != "tpu"
    refc = _refc_windowed(ref2, starts, d, L, interpret)
    readc = read_codes.astype(jnp.int32)
    if cfg.has_qual:
        key = read_quals.astype(jnp.int32)
    else:
        key = jnp.broadcast_to(j, readc.shape)
    flat = (key * 5 + refc) * 5 + readc
    valid = j < read_lens[:, None]
    return flat, valid


@partial(jax.jit, static_argnums=(0,))
def precompute_profile_indices_fused(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
) -> PreIdx:
    """PreIdx as ONE jitted program built on the windowed reference-code
    extraction: r5 measured 7.5 s (eager elementwise path, int64-promoted
    gathers) -> well under 1 s at 2.5M hits x 100bp. The old eager variant
    remains behind RSEM_TPU_PREIDX_EAGER=1 as the escape hatch for the
    remote-compile blowups r4 saw on monolithic programs."""
    with jax.enable_x64(False):
        pro_size = cfg.pro_keys()
        cols = pre_cols(cfg.max_read_len)
        padC = cols - cfg.max_read_len
        ref2 = _build_ref_windows(ref.codes, cfg.max_read_len)

        def mask_pad(flat, valid):
            f = jnp.where(valid, flat, pro_size)
            if padC:
                f = jnp.pad(f, ((0, 0), (0, padC)),
                            constant_values=pro_size)
            return f.astype(jnp.int32)

        rid = hits.rid.astype(jnp.int32)
        sid = hits.sid.astype(jnp.int32)
        dirs = hits.dir.astype(jnp.int32)
        pos = hits.pos.astype(jnp.int32)
        tl = ref.tot_len[sid].astype(jnp.int32)

        def one(mate: ReadsDevice, p, d):
            f, v = profile_indices_windowed(
                cfg, ref, ref2, mate.codes[rid],
                mate.quals[rid] if cfg.has_qual else None,
                mate.lens[rid], sid, p, d,
            )
            return mask_pad(f, v)

        f1 = one(m1, pos, dirs)
        f2 = (
            one(m2, tl - pos - hits.insert_len.astype(jnp.int32), 1 - dirs)
            if cfg.paired else None
        )

        npro_size = cfg.npro_keys()
        from .pallas_table import ROWS as _ROWS

        def noise_flat(mate: ReadsDevice) -> jnp.ndarray:
            L = mate.codes.shape[1]
            j = jnp.arange(L, dtype=jnp.int32)[None, :]
            readc = mate.codes.astype(jnp.int32)
            flat = (mate.quals.astype(jnp.int32) * 5 + readc
                    if cfg.has_qual else readc)
            valid = (j < mate.lens[:, None]) & mate.valid[:, None]
            f = jnp.where(valid, flat, npro_size).astype(jnp.int32)
            N = f.shape[0]
            rpad = -(-N // _ROWS) * _ROWS - N
            return jnp.pad(f, ((0, rpad), (0, cols - L)),
                           constant_values=npro_size)

        nf1 = noise_flat(m1)
        nf2 = noise_flat(m2) if cfg.paired else None
        return PreIdx(flat1=f1, flat2=f2, nflat1=nf1, nflat2=nf2)


def preidx_bytes(cfg: KernelConfig, n_hits_padded: int,
                 n_reads: int = 0) -> int:
    """HBM footprint of PreIdx for gating (engine/em.py)."""
    mates = 2 if cfg.paired else 1
    return (n_hits_padded + n_reads) * pre_cols(cfg.max_read_len) * 4 * mates


def padded_table(values_flat: jnp.ndarray, size: int) -> jnp.ndarray:
    """[t_pad, 128] f32 zero-padded table (sentinel slots read 0)."""
    from .pallas_table import table_rows_padded

    t_pad = table_rows_padded(size)
    return jnp.zeros((t_pad * 128,), jnp.float32).at[:size].set(
        values_flat.astype(jnp.float32)
    ).reshape(t_pad, 128)


def profile_sum_pre(cfg: KernelConfig, log_pro_flat: jnp.ndarray,
                    flat: jnp.ndarray) -> jnp.ndarray:
    """[Hp] per-hit profile log-prob from frozen indices: VMEM-table Pallas
    gather-sum on TPU, widened-row XLA gather elsewhere. flat may be
    [Hp, k*128] for reads longer than 128bp (k 128-lane row groups)."""
    from . import pallas_table as pt

    size = cfg.pro_keys()
    table = padded_table(log_pro_flat[:size], size)
    if pt.kernels_supported(size):
        H, cols = flat.shape
        k = cols // 128
        s = pt.gather_sum(table, flat.reshape(H * k, 128))
        return s if k == 1 else s.reshape(H, k).sum(axis=1)
    vals = gather_rows(
        table.reshape(-1), flat.reshape(-1).astype(jnp.int32)
    ).reshape(flat.shape)
    return jnp.sum(vals, axis=1)


def profile_scatter_pre(cfg: KernelConfig, pre: PreIdx,
                        frac_hit: jnp.ndarray) -> jnp.ndarray:
    """[pro_size] posterior-weighted profile counts from frozen indices:
    VMEM-table Pallas scatter on TPU, one-hot MXU contraction elsewhere.
    Sentinel lanes deposit into sliced-off padding slots."""
    from . import pallas_table as pt

    size = cfg.pro_keys()

    def one(flat):
        if pt.kernels_supported(size):
            H, cols = flat.shape
            k = cols // 128
            w = frac_hit if k == 1 else jnp.repeat(frac_hit, k)
            return pt.scatter_add(flat.reshape(H * k, 128), w, size)
        w2d = jnp.broadcast_to(frac_hit[:, None], flat.shape)
        return pt.onehot_scatter(
            flat, w2d, pt.table_rows_padded(size) * 128
        )

    acc = one(pre.flat1)
    if cfg.paired:
        acc = acc + one(pre.flat2)
    return acc[:size]


# --------------------------------------------------------------------- #
# conprb                                                                 #
# --------------------------------------------------------------------- #
def compute_log_conprb(
    cfg: KernelConfig,
    ref: RefDevice,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    hits: HitsDevice,
    model: Dict[str, jnp.ndarray],
    pre: Optional[PreIdx] = None,
    *,
    static_only: bool = False,
) -> jnp.ndarray:
    """[H] float32 log conprb; -inf encodes the reference's exact zeros.

    With `pre` (precompute_profile_indices), the profile term is computed
    OUTSIDE the chunk loop from the frozen sentinel-masked indices — one
    Pallas gather-sum over the VMEM-resident table (profile_sum_pre) —
    and the chunked pass only evaluates the cheap per-hit terms.

    With `static_only` (fused model loop, ops/model_loop.py), returns the
    pair (lp_static, log_mw_hit): the model-round-invariant terms only —
    no profile term, no EPSILON cutoff, no mw division, and (paired) no
    fragment-length term, since the loop re-evaluates those per round."""
    assert not static_only or pre is not None
    log_pro_flat = model["log_pro"].reshape(-1).astype(jnp.float32)

    def chunk_fn(args):
        if cfg.paired:
            rid, sid, dirs, pos, ins, valid = args
        else:
            rid, sid, dirs, pos, valid = args
            ins = None
        fl = ref.full_len[sid]
        tl = ref.tot_len[sid]
        msk = ref.mask_start[sid]
        l1 = m1.lens[rid]
        c1 = m1.codes[rid]
        q1 = m1.quals[rid] if cfg.has_qual else None
        lq = m1.lq[rid] if m2 is None else (m1.lq[rid] & m2.lq[rid]) | (
            l1 < cfg.seed_len) | (m2.lens[rid] < cfg.seed_len)

        log_ori = model["log_ori"].astype(jnp.float32)

        if cfg.paired:
            l2 = m2.lens[rid]
            fpos = jnp.where(dirs == 1, tl - pos - ins, pos)
            effL = jnp.minimum(fl, tl - ins + 1)
            masked = (fpos >= fl) | ((fpos >= msk) & (fpos < fl))
            lp = (
                log_ori[dirs]
                + (0.0 if static_only else log_lendist_adjusted(
                    model["log_gld_pdf"], model["log_gld_cdf"],
                    cfg.gld_lb, cfg.gld_ub, ins, tl,
                ))
                + _safe_log(
                    lin_rspd_adjusted(
                        cfg, model["rspd_pdf"].astype(jnp.float32),
                        model["rspd_cdf"].astype(jnp.float32), fpos, effL, fl,
                    )
                )
                + log_lendist_adjusted(
                    model["log_mld_pdf"], model["log_mld_cdf"],
                    cfg.mld_lb, cfg.mld_ub, l1, ins,
                )
                + (0.0 if pre is not None else
                   _profile_logprob(cfg, log_pro_flat, ref, c1, q1, l1, sid,
                                    pos, dirs))
                + log_lendist_adjusted(
                    model["log_mld_pdf"], model["log_mld_cdf"],
                    cfg.mld_lb, cfg.mld_ub, l2, ins,
                )
                + (0.0 if pre is not None else
                   _profile_logprob(
                       cfg, log_pro_flat, ref, m2.codes[rid],
                       m2.quals[rid] if cfg.has_qual else None, l2, sid,
                       tl - pos - ins, 1 - dirs,
                   ))
            )
        else:
            fpos = jnp.where(dirs == 1, tl - pos - l1, pos)
            seed_pos = jnp.where(dirs == 1, tl - pos - cfg.seed_len, pos)
            masked = (seed_pos >= fl) | ((seed_pos >= msk) & (seed_pos < fl))
            if cfg.use_mld:
                # marginalize over fragment length (SingleModel.h:122-131)
                F = cfg.gld_ub - cfg.gld_lb
                fr = jnp.arange(cfg.gld_lb + 1, cfg.gld_ub + 1,
                                dtype=jnp.int32)[None, :]
                minL = jnp.maximum(l1, cfg.gld_lb + 1)[:, None]
                maxL = jnp.minimum(tl - pos, cfg.gld_ub)[:, None]
                in_r = (fr >= minL) & (fr <= maxL)
                pf = jnp.where(
                    dirs[:, None] == 1, tl[:, None] - pos[:, None] - fr,
                    jnp.broadcast_to(pos[:, None], (pos.shape[0], F)),
                )
                effL = jnp.minimum(fl[:, None], tl[:, None] - fr + 1)
                g = lin_lendist_adjusted(
                    model["gld_pdf"].astype(jnp.float32),
                    model["gld_cdf"].astype(jnp.float32),
                    cfg.gld_lb, cfg.gld_ub, fr, tl[:, None],
                )
                r = lin_rspd_adjusted(
                    cfg, model["rspd_pdf"].astype(jnp.float32),
                    model["rspd_cdf"].astype(jnp.float32), pf, effL, fl[:, None],
                )
                m = lin_lendist_adjusted(
                    model["mld_pdf"].astype(jnp.float32),
                    model["mld_cdf"].astype(jnp.float32),
                    cfg.mld_lb, cfg.mld_ub, l1[:, None], fr,
                )
                log_v = _safe_log(jnp.sum(jnp.where(in_r, g * r * m, 0.0), axis=1))
            else:
                effL = jnp.minimum(fl, tl - l1 + 1)
                log_v = log_lendist_adjusted(
                    model["log_gld_pdf"], model["log_gld_cdf"],
                    cfg.gld_lb, cfg.gld_ub, l1, tl,
                ) + _safe_log(
                    lin_rspd_adjusted(
                        cfg, model["rspd_pdf"].astype(jnp.float32),
                        model["rspd_cdf"].astype(jnp.float32), fpos, effL, fl,
                    )
                )
            lp = log_ori[dirs] + log_v + (
                0.0 if pre is not None else
                _profile_logprob(cfg, log_pro_flat, ref, c1, q1, l1, sid,
                                 pos, dirs)
            )

        lp = jnp.where(masked | lq | ~valid, NEG_INF, lp)
        log_mw = model["log_mw"].astype(jnp.float32)[sid]
        if pre is None:
            lp = jnp.where(lp < LOG_EPS, NEG_INF, lp)  # prob < EPSILON -> 0
            return jnp.where(log_mw > NEG_INF, lp - log_mw, NEG_INF)
        # profile term is added outside; defer cutoff + mw to preserve the
        # reference's op order (cutoff on the FULL product, then /mw)
        return lp, log_mw

    arrays = (hits.rid, hits.sid, hits.dir, hits.pos)
    if cfg.paired:
        arrays = arrays + (hits.insert_len,)
    arrays = arrays + (hits.valid,)
    out = map_hit_chunks(chunk_fn, hits.rid.shape[0], arrays)
    if pre is None:
        return out
    lp, log_mw = out
    if static_only:
        return lp, log_mw
    lp = lp + profile_sum_pre(cfg, log_pro_flat, pre.flat1)
    if cfg.paired:
        lp = lp + profile_sum_pre(cfg, log_pro_flat, pre.flat2)
    lp = jnp.where(lp < LOG_EPS, NEG_INF, lp)
    return jnp.where(log_mw > NEG_INF, lp - log_mw, NEG_INF)


def noise_sum_pre(cfg: KernelConfig, log_npro_flat: jnp.ndarray,
                  nflat: jnp.ndarray, n_reads: int) -> jnp.ndarray:
    """[N] per-read noise-profile log-prob from frozen indices (the noise
    analogue of profile_sum_pre; table 500 entries w/ quals, 5 without)."""
    from . import pallas_table as pt

    size = cfg.npro_keys()
    table = padded_table(log_npro_flat[:size], size)
    if pt.kernels_supported(size):
        R, cols = nflat.shape
        k = cols // 128
        s = pt.gather_sum(table, nflat.reshape(R * k, 128))
        s = s if k == 1 else s.reshape(R, k).sum(axis=1)
        return s[:n_reads]
    vals = gather_rows(
        table.reshape(-1), nflat.reshape(-1).astype(jnp.int32)
    ).reshape(nflat.shape)
    return jnp.sum(vals, axis=1)[:n_reads]


def noise_scatter_pre(cfg: KernelConfig, nflat: jnp.ndarray,
                      frac_noise: jnp.ndarray) -> jnp.ndarray:
    """[npro_size] posterior-weighted noise counts from frozen indices."""
    from . import pallas_table as pt

    size = cfg.npro_keys()
    w = jnp.pad(frac_noise.astype(jnp.float32),
                (0, nflat.shape[0] - frac_noise.shape[0]))
    if pt.kernels_supported(size):
        R, cols = nflat.shape
        k = cols // 128
        wk = w if k == 1 else jnp.repeat(w, k)
        return pt.scatter_add(nflat.reshape(R * k, 128), wk, size)[:size]
    w2d = jnp.broadcast_to(w[:, None], nflat.shape)
    return pt.onehot_scatter(
        nflat, w2d, pt.table_rows_padded(size) * 128
    )[:size]


def compute_log_noise_conprb(
    cfg: KernelConfig,
    m1: ReadsDevice,
    m2: Optional[ReadsDevice],
    model: Dict[str, jnp.ndarray],
    pre: Optional[PreIdx] = None,
) -> jnp.ndarray:
    """[N] log noise conprb (getNoiseConPrb; mw[0] is always 1)."""
    log_npro = model["log_npro"].reshape(-1).astype(jnp.float32)

    if pre is not None and pre.nflat1 is not None:
        n = m1.lens.shape[0]

        def len_term(lens):
            if cfg.paired or cfg.use_mld:
                return log_lendist_pdf(
                    model["log_mld_pdf"], cfg.mld_lb, cfg.mld_ub, lens)
            return log_lendist_pdf(
                model["log_gld_pdf"], cfg.gld_lb, cfg.gld_ub, lens)

        lp = noise_sum_pre(cfg, log_npro, pre.nflat1, n) + len_term(m1.lens)
        if cfg.paired:
            lp = lp + noise_sum_pre(cfg, log_npro, pre.nflat2, n) + len_term(
                m2.lens)
            lq = (m1.lq & m2.lq) | (m1.lens < cfg.seed_len) | (
                m2.lens < cfg.seed_len)
        else:
            lq = m1.lq
        lp = jnp.where(lq | ~m1.valid, NEG_INF, lp)
        return jnp.where(lp < LOG_EPS, NEG_INF, lp)

    def one_mate(codes, quals, lens):
        L = codes.shape[1]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        readc = codes.astype(jnp.int32)
        if cfg.has_qual:
            flat = quals.astype(jnp.int32) * 5 + readc
        else:
            flat = readc
        vals = gather_rows(log_npro, flat.reshape(-1)).reshape(flat.shape)
        base_term = jnp.sum(jnp.where(j < lens[:, None], vals, 0.0), axis=1)
        if cfg.paired or cfg.use_mld:
            len_term = log_lendist_pdf(
                model["log_mld_pdf"], cfg.mld_lb, cfg.mld_ub, lens
            )
        else:
            len_term = log_lendist_pdf(
                model["log_gld_pdf"], cfg.gld_lb, cfg.gld_ub, lens
            )
        return base_term + len_term

    def chunk_fn(args):
        if cfg.paired:
            c1, q1, l1, c2, q2, l2, lq, valid = args
            lp = one_mate(c1, q1, l1) + one_mate(c2, q2, l2)
        else:
            c1, q1, l1, lq, valid = args
            lp = one_mate(c1, q1, l1)
        lp = jnp.where(lq | ~valid, NEG_INF, lp)
        return jnp.where(lp < LOG_EPS, NEG_INF, lp)

    n = m1.lens.shape[0]
    dummy_q1 = m1.quals if cfg.has_qual else jnp.zeros_like(m1.codes)
    if cfg.paired:
        lq = (m1.lq & m2.lq) | (m1.lens < cfg.seed_len) | (m2.lens < cfg.seed_len)
        dummy_q2 = m2.quals if cfg.has_qual else jnp.zeros_like(m2.codes)
        arrays = (m1.codes, dummy_q1, m1.lens, m2.codes, dummy_q2, m2.lens,
                  lq, m1.valid)
    else:
        arrays = (m1.codes, dummy_q1, m1.lens, m1.lq, m1.valid)
    return map_hit_chunks(chunk_fn, n, arrays, chunk=4096)
