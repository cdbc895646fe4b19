"""Credibility intervals via Gamma resampling (reference: calcCI.cpp).

Phase I (calcCI.cpp:93-164): for each Gibbs count vector, draw nSpC theta
vectors theta_j ~ Gamma(count_j + pseudo, 1)/mw_j, normalize, convert to TPM
and the per-sample mean effective length l_bar.

Phase II (calcCI.cpp:218-284): per transcript, the shortest interval over the
sorted nCV*nSpC TPM samples covering ceil(confidence * n) points, plus the
coefficient of quartile variation from Tukey's hinges; FPKM samples are
1e3 / l_bar * TPM; gene (and allele-transcript) intervals use summed sample
vectors.

Everything runs on device; the reference's 1GB disk transposition Buffer
(Buffer.h) is unnecessary because the [nSamples, M] TPM matrix lives in HBM
(tiled by transcript for very large M).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON


@dataclass
class CIConfig:
    confidence: float = 0.95
    nspc: int = 50  # theta samples per count vector
    pseudo_count: float = 1.0
    seed: int = 0
    cv_chunk: int = 50  # count vectors sampled per device dispatch


@dataclass
class CIBounds:
    lb: np.ndarray
    ub: np.ndarray
    cqv: np.ndarray


@dataclass
class CIResult:
    tpm: CIBounds  # [M+1] (index 0 zero)
    fpkm: CIBounds
    gene_tpm: CIBounds  # [m]
    gene_fpkm: CIBounds
    iso_tpm: Optional[CIBounds] = None  # [m_trans] allele mode
    iso_fpkm: Optional[CIBounds] = None


def _sample_tpm_chunk(key, cvecs, pseudo, inv_mw, eel, usable, nspc):
    """cvecs: [B, M+1] float32 -> (tpm [B*nspc, M], l_bar [B*nspc])."""
    B, M1 = cvecs.shape
    shape = (B, nspc, M1)
    alpha = jnp.maximum(cvecs[:, None, :] + pseudo, 1e-6)
    g = jax.random.gamma(key, alpha, shape=shape, dtype=jnp.float32)
    theta = jnp.where(usable[None, None, :], g * inv_mw[None, None, :], 0.0)
    theta = theta / jnp.sum(theta, axis=2, keepdims=True)
    tpm = jnp.where(
        eel[None, None, 1:] >= EPSILON,
        theta[:, :, 1:] / jnp.maximum(eel[None, None, 1:], 1e-30),
        0.0,
    )
    tpm = tpm / jnp.sum(tpm, axis=2, keepdims=True)
    l_bar = jnp.sum(tpm * eel[None, None, 1:], axis=2)
    tpm = tpm * 1e6
    return tpm.reshape(B * nspc, M1 - 1), l_bar.reshape(B * nspc)


def _shortest_interval(sorted_s: jnp.ndarray, cover: int):
    """sorted_s [n, T]; min-width window of `cover` consecutive points
    (calcCI.cpp:218-258)."""
    n = sorted_s.shape[0]
    width = sorted_s[cover - 1 :, :] - sorted_s[: n - cover + 1, :]
    p = jnp.argmin(width, axis=0)
    cols = jnp.arange(sorted_s.shape[1])
    lb = sorted_s[p, cols]
    ub = sorted_s[p + cover - 1, cols]
    return lb, ub


def _tukey_cqv(sorted_s: jnp.ndarray):
    """CQV from Tukey's hinges (calcCI.cpp:261-283)."""
    n = sorted_s.shape[0]
    q, r = divmod(n, 4)
    if r == 0:
        Q1 = (sorted_s[q - 1] + sorted_s[q]) / 2.0
        Q3 = (sorted_s[3 * q - 1] + sorted_s[3 * q]) / 2.0
    elif r == 3:
        Q1 = (sorted_s[q] + sorted_s[q + 1]) / 2.0
        Q3 = (sorted_s[3 * q + 1] + sorted_s[3 * q + 2]) / 2.0
    else:
        Q1 = sorted_s[q]
        Q3 = sorted_s[3 * q]
    return jnp.where(Q3 - Q1 > 0.0, (Q3 - Q1) / (Q3 + Q1), 0.0)


def _ci_columns(samples: jnp.ndarray, cover: int):
    s = jnp.sort(samples, axis=0)
    lb, ub = _shortest_interval(s, cover)
    cqv = _tukey_cqv(s)
    return lb, ub, cqv


def run_ci(
    countvectors: np.ndarray,  # [nCV, M+1] (Gibbs retained samples)
    eel: np.ndarray,
    mw: np.ndarray,
    gi,
    cfg: CIConfig,
    ta=None,
    mesh=None,
) -> CIResult:
    """mesh: optional jax Mesh — phase I shards count vectors over 'dp'
    (calcCI.cpp:166-216's thread-per-file), phase II shards transcripts
    (calcCI.cpp:404-420's gene ranges); gene sums cross shards via XLA
    collectives."""
    nCV, M1 = countvectors.shape
    M = M1 - 1
    n = nCV * cfg.nspc
    cover = int(cfg.confidence * n - 1e-8) + 1
    n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

    eel_d = jnp.asarray(eel, dtype=jnp.float32)
    mw_d = jnp.asarray(mw, dtype=jnp.float32)
    usable = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (jnp.asarray(countvectors[0, 1:] >= 0))
            & (eel_d[1:] >= EPSILON)
            & (mw_d[1:] >= EPSILON),
        ]
    )
    inv_mw = jnp.where(mw_d >= EPSILON, 1.0 / jnp.maximum(mw_d, 1e-30), 0.0)

    # ---- Phase I: sample TPM matrix [n, M] ----
    cvs = jnp.asarray(countvectors, dtype=jnp.float32)
    sample_fn = jax.jit(
        lambda key, cv: _sample_tpm_chunk(
            key, cv, cfg.pseudo_count, inv_mw, eel_d, usable, cfg.nspc
        )
    )
    key = jax.random.PRNGKey(cfg.seed)
    if mesh is not None and nCV % n_dev == 0:
        # one sharded dispatch: count-vector rows split across devices
        cvs = jax.device_put(cvs, NamedSharding(mesh, P("dp", None)))
        tpm, l_bar = sample_fn(key, cvs)
    else:
        tpm_rows = []
        lbar_rows = []
        for lo in range(0, nCV, cfg.cv_chunk):
            hi = min(nCV, lo + cfg.cv_chunk)
            t, l = sample_fn(jax.random.fold_in(key, lo), cvs[lo:hi])
            tpm_rows.append(t)
            lbar_rows.append(l)
        tpm = jnp.concatenate(tpm_rows, axis=0)  # [n, M]
        l_bar = jnp.concatenate(lbar_rows, axis=0)  # [n]
    inv_lbar = (1e3 / l_bar)[:, None]

    # ---- Phase II ----
    ci_fn = jax.jit(lambda s: _ci_columns(s, cover))
    # single-device: chunk the [n, T] sort by transcript columns — the
    # full matrix is n*M floats (4 GB at the 1000x50 x M=20k defaults)
    # and the sort needs comparable workspace (r4: ResourceExhausted)
    TCH = max(128, min(4096, (1 << 28) // max(int(n) * 4, 1)))

    def bounds(samples) -> CIBounds:
        if mesh is not None:
            # shard transcripts/groups across devices for the big sort
            T = samples.shape[1]
            padT = (-T) % n_dev
            s = jnp.pad(samples, ((0, 0), (0, padT)))
            s = jax.device_put(s, NamedSharding(mesh, P(None, "dp")))
            lb, ub, cqv = ci_fn(s)
            return CIBounds(np.array(lb)[:T], np.array(ub)[:T],
                            np.array(cqv)[:T])
        return bounds_chunked(lambda lo, hi: samples[:, lo:hi],
                              samples.shape[1])

    def bounds_chunked(get_chunk, T) -> CIBounds:
        lbs, ubs, cqvs = [], [], []
        for lo in range(0, T, TCH):
            hi = min(T, lo + TCH)
            s = get_chunk(lo, hi)
            if s.shape[1] < TCH:
                s = jnp.pad(s, ((0, 0), (0, TCH - s.shape[1])))
            lb, ub, cqv = ci_fn(s)
            lbs.append(np.asarray(lb)[: hi - lo])
            ubs.append(np.asarray(ub)[: hi - lo])
            cqvs.append(np.asarray(cqv)[: hi - lo])
        return CIBounds(np.concatenate(lbs), np.concatenate(ubs),
                        np.concatenate(cqvs))

    iso_tpm_b = (bounds(tpm) if mesh is not None else
                 bounds_chunked(lambda lo, hi: tpm[:, lo:hi], M))
    iso_fpkm_b = (bounds(tpm * inv_lbar) if mesh is not None else
                  bounds_chunked(lambda lo, hi: tpm[:, lo:hi] * inv_lbar,
                                 M))

    def with_zero(b: CIBounds) -> CIBounds:
        z = np.zeros(1)
        return CIBounds(
            np.concatenate([z, b.lb]),
            np.concatenate([z, b.ub]),
            np.concatenate([z, b.cqv]),
        )

    # gene-level from summed sample vectors (single-isoform genes reuse the
    # isoform CI directly, calcCI.cpp:350-357)
    m = gi.m
    gids = jnp.asarray(gi.gids_of(np.arange(1, M + 1)), dtype=jnp.int32)
    if mesh is not None:
        gene_tpm_samples = jax.ops.segment_sum(
            tpm.T, gids, num_segments=m, indices_are_sorted=True
        ).T
        gene_tpm_b = bounds(gene_tpm_samples)
        gene_fpkm_b = bounds(gene_tpm_samples * inv_lbar)
    else:
        # groups are contiguous in sid order: a gene chunk's sample sums
        # need only its member-isoform columns (no [n, m] materialization)
        gstarts = np.asarray(gi.starts, dtype=np.int64)

        def gene_chunk(scale):
            def get(lo, hi):
                c0, c1 = int(gstarts[lo]) - 1, int(gstarts[hi]) - 1
                cols = tpm[:, c0:c1]
                if scale is not None:
                    cols = cols * scale
                seg = gids[c0:c1] - lo
                return jax.ops.segment_sum(
                    cols.T, seg, num_segments=hi - lo,
                    indices_are_sorted=True,
                ).T
            return get

        gene_tpm_b = bounds_chunked(gene_chunk(None), m)
        gene_fpkm_b = bounds_chunked(gene_chunk(inv_lbar), m)
    n_iso = np.diff(gi.starts)
    single = n_iso == 1
    first_iso = gi.starts[:-1] - 1  # 0-based isoform index
    for b_gene, b_iso in ((gene_tpm_b, iso_tpm_b), (gene_fpkm_b, iso_fpkm_b)):
        b_gene.lb[single] = b_iso.lb[first_iso[single]]
        b_gene.ub[single] = b_iso.ub[first_iso[single]]
        b_gene.cqv[single] = b_iso.cqv[first_iso[single]]

    result = CIResult(
        tpm=with_zero(iso_tpm_b),
        fpkm=with_zero(iso_fpkm_b),
        gene_tpm=gene_tpm_b,
        gene_fpkm=gene_fpkm_b,
    )

    if ta is not None:
        m_trans = ta.m
        tids = jnp.asarray(ta.gids_of(np.arange(1, M + 1)), dtype=jnp.int32)
        if mesh is not None:
            it_samples = jax.ops.segment_sum(
                tpm.T, tids, num_segments=m_trans, indices_are_sorted=True
            ).T
            it_b = bounds(it_samples)
            if_b = bounds(it_samples * inv_lbar)
        else:
            tstarts = np.asarray(ta.starts, dtype=np.int64)

            def trans_chunk(scale):
                def get(lo, hi):
                    c0, c1 = int(tstarts[lo]) - 1, int(tstarts[hi]) - 1
                    cols = tpm[:, c0:c1]
                    if scale is not None:
                        cols = cols * scale
                    seg = tids[c0:c1] - lo
                    return jax.ops.segment_sum(
                        cols.T, seg, num_segments=hi - lo,
                        indices_are_sorted=True,
                    ).T
                return get

            it_b = bounds_chunked(trans_chunk(None), m_trans)
            if_b = bounds_chunked(trans_chunk(inv_lbar), m_trans)
        n_all = np.diff(ta.starts)
        single_t = n_all == 1
        first_a = ta.starts[:-1] - 1
        for b_t, b_iso in ((it_b, iso_tpm_b), (if_b, iso_fpkm_b)):
            b_t.lb[single_t] = b_iso.lb[first_a[single_t]]
            b_t.ub[single_t] = b_iso.ub[first_a[single_t]]
            b_t.cqv[single_t] = b_iso.cqv[first_a[single_t]]
        result.iso_tpm = it_b
        result.iso_fpkm = if_b

    return result
