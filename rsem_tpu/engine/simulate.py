"""Read simulator (reference: simulation.cpp + per-model simulate methods).

Vectorized on device: transcript assignment, fragment length (truncated
inverse-CDF), start position (piecewise-linear RSPD inversion), quality
strings (Markov scan over positions), and per-base sequencing errors are all
drawn for a whole chunk of reads at once. Provenance is encoded in read names
as rid_dir_sid_pos[_insertL] exactly like the reference
(PairedEndQModel.h:425-427), so round-trip evaluation works unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON, NCODES, QSIZE
from ..model.generative import GenerativeModel
from ..utils.seq import decode

_ID2CHAR = np.frombuffer(b"ACGTN", dtype=np.uint8)


# ------------------------------------------------------------------ #
# simulation-ready distribution tables (reference startSimulation)    #
# ------------------------------------------------------------------ #
def sim_profile_matrix(p: np.ndarray) -> np.ndarray:
    """Fix zero rows of a [K, 5, 5] profile for sampling
    (reference: Profile.h/QProfile.h startSimulation)."""
    out = p.copy()
    K = p.shape[0]
    N = NCODES - 1
    for i in range(K):
        row_tot = p[i].sum(axis=1)
        cp_sum = row_tot[:N].sum()
        if cp_sum == 0.0:
            continue
        cp_d = sum(p[i, j, j] for j in range(N))
        cp_n = p[i, :N, N].sum()
        p_d = cp_d / cp_sum
        p_n = cp_n / cp_sum
        p_o = (1.0 - p_d - p_n) / (NCODES - 2)
        for j in range(N):
            if row_tot[j] > 0.0:
                continue
            for k in range(NCODES):
                out[i, j, k] = p_d if k == j else (p_n if k == N else p_o)
        if row_tot[N] == 0.0:
            p_o2 = (1.0 - p_n) / (NCODES - 1)
            out[i, N, :N] = p_o2
            out[i, N, N] = p_n
    return out


def sim_noise_qprofile(p: np.ndarray) -> np.ndarray:
    """Zero rows -> uniform ACGT (reference: NoiseQProfile.h startSimulation)."""
    out = p.copy()
    zero = out.sum(axis=1) < 1e-300
    out[zero] = np.array([0.25, 0.25, 0.25, 0.25, 0.0])
    return out


# ------------------------------------------------------------------ #
# vectorized samplers                                                 #
# ------------------------------------------------------------------ #
def _categorical_rows(key, log_p_rows):
    """One draw per row of log-probability matrix [n, K]."""
    g = jax.random.gumbel(key, log_p_rows.shape, dtype=jnp.float32)
    return jnp.argmax(log_p_rows + g, axis=1).astype(jnp.int32)


def _lendist_sample(key, pdf, cdf, lb: int, ub: int, refL):
    """Sample lengths from a LenDist truncated at refL (LenDist::simulate);
    refL = -1 rows use the full support. Returns (len [n], ok [n])."""
    refL = jnp.asarray(refL)
    span = ub - lb
    dlen = jnp.clip(jnp.where(refL < 0, ub, jnp.minimum(ub, refL)) - lb, 0, span)
    total = cdf[dlen]
    ok = (dlen > 0) & (total > 0.0)
    u = jax.random.uniform(key, refL.shape, dtype=jnp.float32)
    t = u * total
    # first index i in [1, span] with cdf[i] > t
    idx = jnp.searchsorted(cdf, t, side="right")
    idx = jnp.clip(idx, 1, jnp.maximum(dlen, 1))
    return (lb + idx).astype(jnp.int32), ok


def _rspd_sample(key, rspd_pdf, rspd_cdf, B: int, est: bool, effL, full_len):
    """Start position in [0, effL) (RSPD::simulate)."""
    u = jax.random.uniform(key, effL.shape, dtype=jnp.float32)
    if not est:
        pos = jnp.floor(u * effL).astype(jnp.int32)
        return jnp.minimum(pos, effL - 1), effL > 0
    # t = u * evalCDF(effL); invert the piecewise-linear CDF
    fl = full_len.astype(jnp.float32)
    i_eff = (effL * B) // full_len
    val_eff = effL.astype(jnp.float32) / fl * B
    tot = rspd_cdf[i_eff] + (val_eff - i_eff.astype(jnp.float32)) * rspd_pdf[i_eff + 1]
    ok = tot > 0.0
    t = u * tot
    bin_i = jnp.clip(jnp.searchsorted(rspd_cdf[1 : B + 1], t, side="right"), 0, B - 1)
    pdf_b = jnp.maximum(rspd_pdf[bin_i + 1], 1e-30)
    val = bin_i.astype(jnp.float32) + (t - rspd_cdf[bin_i]) / pdf_b
    pos = jnp.floor(val * fl / B).astype(jnp.int32)
    pos = jnp.clip(pos, 0, effL - 1)
    return pos, ok


def _qual_markov(key, p_init_log, p_tran_log, n: int, L: int):
    """[n, L] quality codes via first-order Markov chain (QualDist)."""
    k0, k1 = jax.random.split(key)
    q0 = _categorical_rows(k0, jnp.broadcast_to(p_init_log[None, :], (n, QSIZE)))

    def step(q_prev, k):
        q_next = _categorical_rows(k, p_tran_log[q_prev])
        return q_next, q_next

    keys = jax.random.split(k1, L - 1) if L > 1 else jnp.zeros((0, 2), jnp.uint32)
    _, rest = jax.lax.scan(step, q0, keys)
    return jnp.concatenate([q0[None, :], rest], axis=0).T  # [n, L]


def _read_bases(key, log_pro, key_codes, ref_codes):
    """[n, L] base codes: per position categorical over p[key, refbase, :]."""
    n, L = key_codes.shape
    rows = log_pro[key_codes.reshape(-1), ref_codes.reshape(-1)]  # [n*L, 5]
    out = _categorical_rows(key, rows)
    return out.reshape(n, L)


# ------------------------------------------------------------------ #
# main driver                                                         #
# ------------------------------------------------------------------ #
@dataclass
class SimResult:
    counts: np.ndarray  # [M+1] true counts (incl. noise at 0)
    n_resimulated: int


def simulate_reads(
    model: GenerativeModel,
    ref,
    tpm: np.ndarray,  # [M+1] TPM column of an isoforms results file
    theta0: float,
    n_reads: int,
    out_prefix: str,
    seed: int = 0,
    chunk: int = 200_000,
) -> SimResult:
    """Write out_prefix.fa/.fq (single) or _1/_2 mates (paired); returns true
    counts for writeResultsSimulation."""
    spec = model.spec
    eel = model.calc_eel()
    M = ref.M

    theta = np.zeros(M + 1)
    theta[1:] = tpm[1:] * eel[1:]
    denom = theta.sum()
    assert denom > EPSILON
    theta[0] = theta0
    theta[1:] = theta[1:] / denom * (1.0 - theta0)

    # device tables
    with np.errstate(divide="ignore"):
        log_theta = jnp.asarray(np.log(np.maximum(theta, 0.0)), jnp.float32)
        gpdf, gcdf = model.gld.device_arrays(model.gld.lb, model.gld.ub)
        glb, gub = model.gld.lb, model.gld.ub
        if model.mld is not None:
            mpdf, mcdf = model.mld.device_arrays(model.mld.lb, model.mld.ub)
            mlb, mub = model.mld.lb, model.mld.ub
        pro_sim = sim_profile_matrix(model.pro.p)
        log_pro = jnp.asarray(np.log(np.maximum(pro_sim, 1e-300)), jnp.float32)
        if spec.has_qual:
            npro_sim = sim_noise_qprofile(model.npro.p)
            log_npro = jnp.asarray(np.log(np.maximum(npro_sim, 1e-300)), jnp.float32)
            log_qinit = jnp.asarray(
                np.log(np.maximum(model.qd.p_init, 1e-300)), jnp.float32
            )
            log_qtran = jnp.asarray(
                np.log(np.maximum(model.qd.p_tran, 1e-300)), jnp.float32
            )
        else:
            pn = model.npro.p
            if pn.sum() < 1e-300:
                pn = np.array([0.25, 0.25, 0.25, 0.25, 0.0])
            log_npro = jnp.asarray(np.log(np.maximum(pn, 1e-300)), jnp.float32)

    gpdf_d, gcdf_d = jnp.asarray(gpdf, jnp.float32), jnp.asarray(gcdf, jnp.float32)
    if model.mld is not None:
        mpdf_d, mcdf_d = jnp.asarray(mpdf, jnp.float32), jnp.asarray(mcdf, jnp.float32)
    rspd_pdf = jnp.asarray(model.rspd.pdf, jnp.float32)
    rspd_cdf = jnp.asarray(model.rspd.cdf, jnp.float32)
    tot_len = jnp.asarray(ref.tot_len, jnp.int32)
    full_len = jnp.asarray(ref.full_len, jnp.int32)
    codes_d = jnp.asarray(ref.codes)
    offsets_d = jnp.asarray(ref.offsets, jnp.int32)
    B, est = spec.B, spec.est_rspd

    max_read = (model.mld.maxL if model.mld is not None else model.gld.maxL)

    def ref_base(sid, pos, dirs, j):
        """base code at read position j for (sid, pos, dir)."""
        tl = tot_len[sid][:, None]
        fwd = offsets_d[sid][:, None] + pos[:, None] + j
        rev = offsets_d[sid][:, None] + tl - 1 - pos[:, None] - j
        idx = jnp.where(dirs[:, None] == 1, rev, fwd)
        c = jnp.take(codes_d, jnp.clip(idx, 0, codes_d.shape[0] - 1)).astype(jnp.int32)
        return jnp.where(dirs[:, None] == 1, jnp.where(c < 4, 3 - c, c), c)

    def sample_chunk(key, n):
        """Returns dict of arrays for n reads; invalid rows marked."""
        ks = jax.random.split(key, 12)
        sid = _categorical_rows(
            ks[0], jnp.broadcast_to(log_theta[None, :], (n, M + 1))
        )
        dirs = (
            jax.random.uniform(ks[1], (n,)) >= model.ori.prob[0]
        ).astype(jnp.int32)
        tl = tot_len[sid]
        is_noise = sid == 0
        # fragment length (noise rows use full support via refL=-1)
        refL = jnp.where(is_noise, -1, tl)
        frag, ok_f = _lendist_sample(ks[2], gpdf_d, gcdf_d, glb, gub, refL)
        effL = jnp.minimum(full_len[sid], tl - frag + 1)
        pos, ok_p = _rspd_sample(
            ks[3], rspd_pdf, rspd_cdf, B, est, jnp.maximum(effL, 0), full_len[sid]
        )
        pos = jnp.where(dirs == 1, tl - pos - frag, pos)
        ok = is_noise | (ok_f & ok_p)

        out = dict(sid=sid, dirs=dirs, pos=jnp.where(is_noise, 0, pos),
                   frag=frag, ok=ok)
        j = jnp.arange(max_read, dtype=jnp.int32)[None, :]

        def one_mate(kq, kb, kl, mate_pos, mate_dir):
            if model.mld is not None:
                mrefL = jnp.where(is_noise, -1, frag)
                mlen, ok_m = _lendist_sample(kl, mpdf_d, mcdf_d, mlb, mub, mrefL)
            else:
                mlen, ok_m = frag, jnp.ones_like(ok)
            if spec.has_qual:
                quals = _qual_markov(kq, log_qinit, log_qtran, n, max_read)
                keyc = quals
            else:
                quals = None
                keyc = jnp.broadcast_to(j, (n, max_read))
            rb = ref_base(sid, mate_pos, mate_dir, j)
            sig = _read_bases(kb, log_pro, keyc, rb)
            if spec.has_qual:
                noise_rows = log_npro[quals.reshape(-1)]
            else:
                noise_rows = jnp.broadcast_to(
                    log_npro[None, :], (n * max_read, NCODES)
                )
            nb = _categorical_rows(jax.random.fold_in(kb, 1), noise_rows).reshape(n, max_read)
            bases = jnp.where(is_noise[:, None], nb, sig)
            return bases, quals, mlen, ok_m

        b1, q1, l1, ok1 = one_mate(ks[4], ks[5], ks[6], out["pos"], dirs)
        out.update(b1=b1, q1=q1, l1=l1)
        out["ok"] = out["ok"] & ok1
        if spec.paired:
            m2pos = tl - out["pos"] - frag
            b2, q2, l2, ok2 = one_mate(
                ks[7], ks[8], ks[9], jnp.where(is_noise, 0, m2pos), 1 - dirs
            )
            out.update(b2=b2, q2=q2, l2=l2)
            out["ok"] = out["ok"] & ok2
        return out

    sample_jit = jax.jit(sample_chunk, static_argnames=("n",))

    # output files
    ext = "fq" if spec.has_qual else "fa"
    if spec.paired:
        files = [open(f"{out_prefix}_1.{ext}", "w"), open(f"{out_prefix}_2.{ext}", "w")]
    else:
        files = [open(f"{out_prefix}.{ext}", "w")]

    counts = np.zeros(M + 1, dtype=np.int64)
    n_resim = 0
    key = jax.random.PRNGKey(seed)
    written = 0
    attempt = 0
    while written < n_reads:
        n = min(chunk, max(n_reads - written, 1024))
        out = sample_jit(jax.random.fold_in(key, attempt), n)
        attempt += 1
        ok = np.asarray(out["ok"])
        take = min(int(ok.sum()), n_reads - written)
        n_resim += int((~ok).sum())
        rows = np.flatnonzero(ok)[:take]
        sid = np.asarray(out["sid"])[rows]
        dirs = np.asarray(out["dirs"])[rows]
        pos = np.asarray(out["pos"])[rows]
        frag = np.asarray(out["frag"])[rows]
        np.add.at(counts, sid, 1)

        rids = np.arange(written, written + take)
        if spec.paired:
            names = [
                f"{r}_{d}_{s}_{p}_{f}"
                for r, d, s, p, f in zip(rids, dirs, sid, pos, frag)
            ]
        else:
            names = [f"{r}_{d}_{s}_{p}" for r, d, s, p in zip(rids, dirs, sid, pos)]

        def write_mate(f, bases_key, lens_key, quals_key, suffix):
            bases = np.asarray(out[bases_key])[rows]
            lens = np.asarray(out[lens_key])[rows]
            quals = np.asarray(out[quals_key])[rows] if spec.has_qual else None
            for r in range(take):
                L = int(lens[r])
                seqs = _ID2CHAR[bases[r, :L]].tobytes().decode()
                if spec.has_qual:
                    qs = (quals[r, :L] + 33).astype(np.uint8).tobytes().decode()
                    f.write(f"@{names[r]}{suffix}\n{seqs}\n+\n{qs}\n")
                else:
                    f.write(f">{names[r]}{suffix}\n{seqs}\n")

        if spec.paired:
            write_mate(files[0], "b1", "l1", "q1", "/1")
            write_mate(files[1], "b2", "l2", "q2", "/2")
        else:
            write_mate(files[0], "b1", "l1", "q1", "")
        written += take

    for f in files:
        f.close()
    return SimResult(counts=counts.astype(np.float64), n_resimulated=n_resim)
