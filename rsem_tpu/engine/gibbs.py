"""Collapsed Gibbs sampler over read assignments (reference: Gibbs.cpp).

The reference runs nThreads fully independent chains, each performing a
sequential sweep over all reads per round (Gibbs.cpp:265-353). A sequential
1-read-at-a-time sweep is hostile to TPUs, so the TPU-native sampler uses

  * chain parallelism (the reference's thread-per-chain, wider), and
  * *blocked* within-sweep updates: reads are processed in consecutive
    blocks per sweep; within a block every read samples
    z_i ~ (counts[sid] - [z_i == sid] + pseudo) * conprb with counts frozen
    at block start (its own previous assignment is subtracted exactly),
    then counts are refreshed. As blocks -> N1 this is exactly the
    reference's collapsed sweep; the within-block staleness is
    O(block_size / N1) and vanishes for typical N >> M.

Two sweep engines:

  * the FUSED PALLAS path (ops/pallas_gibbs, default on single-device
    TPU): a whole sweep for every chain is one on-device program with the
    count tables resident in VMEM; each [TILE_ROWS, 128]-slot tile is one
    block (thousands of reads -> finer than the XLA path's 32 blocks).
    r5: 4.4 s for the full driver-default run (burnin 200 + 1000 samples)
    at 1M reads / 2.5 aln / M=20k vs the reference's 39.75 s at 1 thread;
  * the XLA blocked sweep (vmapped chains + one-hot count refresh):
    non-TPU backends and the multi-chip mesh path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON
from ..ops.ddsum import dd_add, dd_add_f32, dd_sq
from ..utils.jaxinit import fetch64

NEG_INF = -jnp.inf


@dataclass
class GibbsConfig:
    burnin: int = 200
    nsamples: int = 1000
    gap: int = 1
    n_chains: int = 8
    # within-sweep count-refresh budget: reads are resampled in ~n_blocks
    # consecutive blocks per sweep, so any read samples against counts at
    # most ~N1/n_blocks reads stale (exact collapsed sweep as
    # n_blocks -> N1); per-bucket shares are ceil'd so no bucket exceeds
    # that staleness bound
    n_blocks: int = 32
    pseudo_count: float = 1.0
    seed: int = 0
    keep_countvectors: bool = True
    # sweeps per device dispatch: one executable spanning every sweep ran
    # for minutes at bench scale and tripped the TPU worker watchdog (r4)
    sweep_segment: int = 25
    # sweep kernel: 'auto' picks the fused Pallas sweep (ops/pallas_gibbs)
    # on single-device TPU, the XLA blocked sweep otherwise; 'pallas'
    # forces it (interpret-mode on non-TPU backends — tests)
    kernel: str = "auto"  # auto | pallas | xla


@dataclass
class GibbsResult:
    pme_c: np.ndarray  # [M+1] posterior mean counts
    pve_c: np.ndarray  # [M+1] posterior count variance
    pme_tpm: np.ndarray
    pme_fpkm: np.ndarray
    pve_c_genes: np.ndarray  # [m]
    pve_c_trans: Optional[np.ndarray]  # [m_trans] (allele mode)
    # [nsamples, M+1] f32 — a DEVICE array (jnp): CI consumes it on device;
    # writers np.asarray() it when serializing
    countvectors: Optional[jnp.ndarray]


class GibbsData:
    """Dense bucketed posterior matrix (the .ofg content, on device).

    Each read's slots = [noise (sid 0, ncp)] + hits with conprb >= EPSILON;
    reads are grouped into power-of-two-width buckets.
    """

    def __init__(self, hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int):
        N = hits.n_reads
        offsets = hits.read_offsets
        keep = np.isfinite(log_conprb)
        keep_noise = np.isfinite(log_ncp)
        n_slots = np.diff(offsets) * 0
        n_slots = np.add.reduceat(keep.astype(np.int64), offsets[:-1]) if hits.n_hits else np.zeros(N, np.int64)
        n_slots = n_slots + keep_noise.astype(np.int64)
        # reads with zero usable slots never get sampled (reference drops
        # empty .ofg lines, effectively shrinking N1); give them one noise
        # slot with weight 0 -> they always stay on the noise isoform
        empty = n_slots == 0

        widths = np.maximum(n_slots, 1)
        bucket_w = 1 << np.ceil(np.log2(widths)).astype(np.int64)
        self.buckets: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.read_index: List[np.ndarray] = []
        self.M = M
        self.N = N
        self.n_dropped = int(empty.sum())

        for w in np.unique(bucket_w):
            rows = np.flatnonzero(bucket_w == w)
            n = len(rows)
            sid_b = np.zeros((n, int(w)), dtype=np.int32)
            lcp_b = np.full((n, int(w)), -np.inf)
            for r, i in enumerate(rows):
                c = 0
                if keep_noise[i]:
                    sid_b[r, 0] = 0
                    lcp_b[r, 0] = log_ncp[i]
                    c = 1
                for h in range(offsets[i], offsets[i + 1]):
                    if keep[h]:
                        sid_b[r, c] = hits.sid[h]
                        lcp_b[r, c] = log_conprb[h]
                        c += 1
            self.buckets.append(
                (
                    jnp.asarray(sid_b),
                    jnp.asarray(lcp_b, dtype=jnp.float32),
                    jnp.asarray(rows, dtype=jnp.int32),
                )
            )
            self.read_index.append(rows)


def _sample_bucket(key, sid_b, lcp_b, counts, z_rows, pseudo):
    """Sample new assignments for every read in the bucket given current
    counts. counts: [M+1] float32; z_rows: [n] current sids for these reads;
    pseudo: [M+1] pseudo-count vector. Returns new sids [n]."""
    n, w = sid_b.shape
    own = (sid_b == z_rows[:, None]).astype(jnp.float32)
    c = counts[sid_b] - own + pseudo[sid_b]
    lw = jnp.where(
        (c > 0) & jnp.isfinite(lcp_b), jnp.log(jnp.maximum(c, 1e-30)) + lcp_b, NEG_INF
    )
    g = jax.random.gumbel(key, lw.shape, dtype=jnp.float32)
    pick = jnp.argmax(jnp.where(jnp.isfinite(lw), lw + g, NEG_INF), axis=1)
    new_sid = jnp.take_along_axis(sid_b, pick[:, None], axis=1)[:, 0]
    # reads with no valid slot stay where they are
    any_valid = jnp.any(jnp.isfinite(lw), axis=1)
    return jnp.where(any_valid, new_sid, z_rows)


def _setup_counts(cfg: GibbsConfig, M: int, N0: int, N1: int,
                  omit: Optional[np.ndarray], prior: Optional[np.ndarray]):
    """init_counts / pseudo / totc (Gibbs.cpp:152-194 load_omit_info +
    load_prior_info), shared by the XLA and Pallas paths."""
    init_counts = np.zeros(M + 1)
    if omit is not None and len(omit):
        init_counts[np.asarray(omit, dtype=np.int64)] = -1
    if prior is not None:
        pseudo = np.asarray(prior, dtype=np.float64).copy()
        pseudo[init_counts < 0] = 0.0
        totc = 1.0 + pseudo[1:][init_counts[1:] >= 0].sum() + N0 + N1
    else:
        pseudo = np.full(M + 1, cfg.pseudo_count)
        totc = (M + 1 - (init_counts < 0).sum()) * cfg.pseudo_count + N0 + N1
    return init_counts, pseudo, totc


def _make_expression_values(eel_d, mw_d, pseudo_d, totc):
    """theta -> polish -> tpm/fpkm on device (Gibbs.cpp:317-323)."""

    def expression_values(counts):
        theta = jnp.where(counts < 0, 0.0, (counts + pseudo_d) / totc)
        bad = (mw_d[1:] < EPSILON) | (eel_d[1:] < EPSILON)
        t = theta.at[1:].set(
            jnp.where(bad, 0.0, theta[1:] / jnp.where(bad, 1.0, mw_d[1:]))
        )
        t = t / jnp.sum(t)
        frac = jnp.where(eel_d[1:] >= EPSILON, t[1:], 0.0)
        denom = jnp.maximum(jnp.sum(frac), EPSILON)
        frac = frac / denom
        fpkm = jnp.where(
            eel_d[1:] >= EPSILON, frac * 1e9 / jnp.maximum(eel_d[1:], 1e-30),
            0.0,
        )
        denom2 = jnp.maximum(jnp.sum(fpkm), EPSILON)
        tpm = fpkm / denom2 * 1e6
        z = jnp.zeros(1, dtype=tpm.dtype)
        return jnp.concatenate([z, tpm]), jnp.concatenate([z, fpkm])

    return expression_values


def _finish_moments(accs, cfg: GibbsConfig, M: int, gi, ta, cvs) -> GibbsResult:
    """Merge chain moment accumulators ([C, n] dd pairs) into the posterior
    summaries (Gibbs.cpp:355-423 release())."""
    ns = cfg.nsamples
    sids = np.arange(1, M + 1)

    def acc_np(key):
        hi, lo = accs[key]
        return (fetch64(hi) + fetch64(lo)).sum(axis=0)

    pme_c = acc_np("pme_c") / ns
    pve_c = acc_np("pve_c")
    pve_c = (pve_c - ns * pme_c**2) / (ns - 1)
    pve_c[pve_c < 0] = 0.0
    pme_tpm = acc_np("pme_tpm") / ns
    pme_fpkm = acc_np("pme_fpkm") / ns

    gids_np = gi.gids_of(sids)
    m = gi.m
    pme_c_genes = np.bincount(gids_np, weights=pme_c[1:], minlength=m)
    pve_c_genes = acc_np("pve_c_genes")
    pve_c_genes = (pve_c_genes - ns * pme_c_genes**2) / (ns - 1)
    pve_c_genes[pve_c_genes < 0] = 0.0

    pve_c_trans = None
    if ta is not None:
        tids_np = ta.gids_of(sids)
        m_trans = ta.m
        pme_c_trans = np.bincount(tids_np, weights=pme_c[1:],
                                  minlength=m_trans)
        pve_c_trans = acc_np("pve_c_trans")
        pve_c_trans = (pve_c_trans - ns * pme_c_trans**2) / (ns - 1)
        pve_c_trans[pve_c_trans < 0] = 0.0

    countvectors = None
    if cfg.keep_countvectors:
        # stays a DEVICE array: downstream CI consumes it on device, and a
        # host fetch of [nsamples, M+1] costs seconds through the dev
        # host's ~20 MB/s tunnel; np.asarray() it only at file-write time
        countvectors = cvs.reshape(-1, M + 1)

    return GibbsResult(
        pme_c=pme_c,
        pve_c=pve_c,
        pme_tpm=pme_tpm,
        pme_fpkm=pme_fpkm,
        pve_c_genes=pve_c_genes,
        pve_c_trans=pve_c_trans,
        countvectors=countvectors,
    )


@partial(jax.jit, static_argnums=(0, 1))
def _pallas_seg_jit(seg: int, interpret: bool, zohs, tables, cvs_seg,
                    sweep0, seeds, pseudo_d, data):
    """`seg` sweeps over all parts; every sweep's count vector is
    snapshotted unconditionally into cvs_seg [C, seg, M+1] (a lax.cond
    around the snapshot forced XLA to copy the carried state every sweep
    — ~10x the sweep kernel's own cost at bench scale). Module-level jit:
    repeat run_gibbs calls in one process skip retracing."""
    from ..ops.pallas_gibbs import sweep_part

    C = tables.shape[0]
    M = data.M

    def body(s, state):
        zohs, tables, cvs_seg = state
        sweep_idx = (sweep0 + s).astype(jnp.int32)
        new_z = []
        for pi, part in enumerate(data.parts):
            seed_arr = jnp.stack([seeds[pi], sweep_idx])
            z, tables = sweep_part(
                zohs[pi], tables, part, seed_arr, interpret=interpret
            )
            new_z.append(z)
        zohs = tuple(new_z)
        counts = tables.reshape(C, -1)[:, : M + 1] - pseudo_d[None, :]
        cvs_seg = jax.lax.dynamic_update_slice(
            cvs_seg, counts[:, None, :], (0, s, 0)
        )
        return zohs, tables, cvs_seg

    return jax.lax.fori_loop(0, seg, body, (zohs, tables, cvs_seg))


def _init_jit(keys, data, table_base, C: int):
    from ..ops.pallas_gibbs import init_chains_jit

    return init_chains_jit(keys, data, table_base, C)


def _run_gibbs_pallas(
    hits, log_conprb, log_ncp, M: int, N0: int, eel, mw, gi,
    cfg: GibbsConfig, omit, prior, ta,
) -> GibbsResult:
    """Fused-kernel path: whole sweeps run as single Pallas programs with
    the count table resident in VMEM (ops/pallas_gibbs); retention math
    and moment accumulation stay in XLA on the threaded count tables."""
    from ..ops.pallas_gibbs import (
        build_pallas_gibbs_data,
        gibbs_pallas_supported,
    )
    from ..utils.jaxinit import sync as _sync

    interpret = not gibbs_pallas_supported(M)  # non-TPU backends: tests
    C = cfg.n_chains
    assert cfg.nsamples % C == 0, "nsamples must be divisible by n_chains"
    samples_per_chain = cfg.nsamples // C
    chain_len = 1 + (samples_per_chain - 1) * cfg.gap
    total_rounds = cfg.burnin + chain_len

    import os as _os
    import time as _time

    _timing = _os.environ.get("RSEM_TPU_GIBBS_TIMING") == "1"
    _tb = _time.perf_counter()
    data = build_pallas_gibbs_data(hits, log_conprb, log_ncp, M)
    if _timing:
        import sys as _sys

        print(f"[gibbs timing] build: {_time.perf_counter() - _tb:.3f}s",
              flush=True, file=_sys.stderr)
    N1 = hits.n_reads
    init_counts, pseudo, totc = _setup_counts(cfg, M, N0, N1, omit, prior)

    t_pad = data.t_pad
    table_base = np.zeros(t_pad * 128, dtype=np.float32)
    table_base[: M + 1] = init_counts + pseudo
    table_base[0] += N0 + data.n_noise_fixed

    eel_d = jnp.asarray(eel, dtype=jnp.float32)
    mw_d = jnp.asarray(mw, dtype=jnp.float32)
    pseudo_d = jnp.asarray(pseudo, dtype=jnp.float32)
    expression_values = _make_expression_values(eel_d, mw_d, pseudo_d, totc)

    # group sums over SORTED membership (gene ids are non-decreasing over
    # sid — .grp is a prefix-start array): two-level dd cumsum + boundary
    # diff instead of jax.ops.segment_sum, whose batched TPU scatter cost
    # ~100 ms per retained sweep at M=20k (fast_estep.seg_sum_sorted)
    from ..ops.fast_estep import BLOCK as _BLOCK, seg_sum_sorted

    m = gi.m
    m_trans = ta.m if ta is not None else 0
    Mpad = max(-(-M // _BLOCK) * _BLOCK, _BLOCK)
    g_starts = jnp.asarray(
        np.clip(np.asarray(gi.starts) - 1, 0, Mpad), dtype=jnp.int32)
    t_starts = (
        jnp.asarray(np.clip(np.asarray(ta.starts) - 1, 0, Mpad),
                    dtype=jnp.int32)
        if ta is not None else None
    )

    def group_sums(cnt, starts):
        v = jnp.pad(cnt[1:], (0, Mpad - M))
        return seg_sum_sorted(v, starts)

    # deterministic per-part seed bases (the kernel's counter hash folds in
    # sweep/chain/tile/slot)
    part_seeds = [
        ((int(cfg.seed) * 2654435761 + (pi + 1) * 40503) & 0xFFFFFFFF)
        - (1 << 32)
        if ((int(cfg.seed) * 2654435761 + (pi + 1) * 40503) & 0xFFFFFFFF)
        >= (1 << 31)
        else ((int(cfg.seed) * 2654435761 + (pi + 1) * 40503) & 0xFFFFFFFF)
        for pi in range(len(data.parts))
    ]

    seeds_d = jnp.asarray(part_seeds, dtype=jnp.int32)
    _t0 = [_time.perf_counter()]

    def _lap(name):
        if _timing:
            _sync(tables)
            t = _time.perf_counter()
            print(f"[gibbs timing] {name}: {t - _t0[0]:.3f}s", flush=True,
                  file=__import__("sys").stderr)
            _t0[0] = t

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), C)
    zohs, tables = _init_jit(keys, data, jnp.asarray(table_base), C)
    _lap("init")

    seg = max(1, min(cfg.sweep_segment, total_rounds))

    cvs = jnp.zeros((C, samples_per_chain, M + 1), jnp.float32)
    done = 0
    si = 0
    while done < total_rounds:
        step = min(seg, total_rounds - done)
        cvs_seg = jnp.zeros((C, step, M + 1), jnp.float32)
        zohs, tables, cvs_seg = _pallas_seg_jit(
            step, interpret, zohs, tables, cvs_seg,
            jnp.asarray(done, jnp.int32), seeds_d, pseudo_d, data,
        )
        # first retained sweep >= done (host-side statics)
        if done <= cfg.burnin:
            first_ret = cfg.burnin
        else:
            first_ret = cfg.burnin + cfg.gap * (
                -(-(done - cfg.burnin) // cfg.gap)
            )
        if first_ret < done + step:
            s0 = first_ret - done
            out0 = (first_ret - cfg.burnin) // cfg.gap
            n_sel = -(-((done + step) - first_ret) // cfg.gap)
            sel = cvs_seg[:, s0 :: cfg.gap, :][:, :n_sel, :]
            cvs = jax.lax.dynamic_update_slice(cvs, sel, (0, out0, 0))
        done += step
        si += 1
        if (si % 4) == 0 or done >= total_rounds:
            _sync(tables)  # bound the in-flight dispatch queue
        if _timing:
            _lap(f"segment {si} ({step} sweeps)")

    # ---- moments post-hoc: one jitted scan over the retained samples ----
    def upd(acc, cnt):
        tpm, fpkm = expression_values(cnt)
        gsum = group_sums(cnt, g_starts)
        return dict(
            pme_c=dd_add_f32(acc["pme_c"], cnt),
            pve_c=dd_add(acc["pve_c"], dd_sq(cnt)),
            pme_tpm=dd_add_f32(acc["pme_tpm"], tpm),
            pme_fpkm=dd_add_f32(acc["pme_fpkm"], fpkm),
            pve_c_genes=dd_add(acc["pve_c_genes"], dd_sq(gsum)),
            pve_c_trans=dd_add(
                acc["pve_c_trans"],
                dd_sq(group_sums(cnt, t_starts))
                if ta is not None
                else (jnp.zeros(1, jnp.float32),) * 2,
            ),
        )

    @jax.jit
    def moments_of(cvs):
        ddz = lambda n: (
            jnp.zeros((C, n), jnp.float32),
            jnp.zeros((C, n), jnp.float32),
        )
        acc0 = dict(
            pme_c=ddz(M + 1),
            pve_c=ddz(M + 1),
            pme_tpm=ddz(M + 1),
            pme_fpkm=ddz(M + 1),
            pve_c_genes=ddz(m),
            pve_c_trans=ddz(max(m_trans, 1)),
        )

        def step(acc, cnt_c):  # cnt_c: [C, M+1]
            return jax.vmap(upd)(acc, cnt_c), None

        acc, _ = jax.lax.scan(step, acc0, jnp.swapaxes(cvs, 0, 1))
        return acc

    accs = moments_of(cvs)
    _lap("moments scan")
    res = _finish_moments(
        accs, cfg, M, gi, ta, cvs if cfg.keep_countvectors else None
    )
    _lap("finish (fetch)")
    return res


def run_gibbs(
    hits,
    log_conprb: np.ndarray,
    log_ncp: np.ndarray,
    M: int,
    N0: int,
    eel: np.ndarray,
    mw: np.ndarray,
    gi,
    cfg: GibbsConfig,
    omit: Optional[np.ndarray] = None,
    prior: Optional[np.ndarray] = None,
    ta=None,
    mesh=None,
) -> GibbsResult:
    """hits: io.HitArrays; log_conprb/log_ncp: final model conprbs from EM
    (the .ofg content); gi: gene GroupInfo; ta: transcript->allele GroupInfo
    in allele mode; prior: [M+1] per-isoform pseudo-counts (pRSEM --prior).

    mesh: optional jax Mesh — chains are sharded over its 'dp' axis (the
    TPU-native form of the reference's thread-per-chain, Gibbs.cpp:207-254);
    the posterior matrix is replicated, chain moments merge on host."""
    from ..ops.pallas_gibbs import gibbs_pallas_supported

    if mesh is None and (
        cfg.kernel == "pallas"
        or (cfg.kernel == "auto" and gibbs_pallas_supported(M))
    ):
        return _run_gibbs_pallas(hits, log_conprb, log_ncp, M, N0, eel, mw,
                                 gi, cfg, omit, prior, ta)

    C = cfg.n_chains
    assert cfg.nsamples % C == 0, "nsamples must be divisible by n_chains"
    samples_per_chain = cfg.nsamples // C
    chain_len = 1 + (samples_per_chain - 1) * cfg.gap

    data = GibbsData(hits, log_conprb, log_ncp, M)
    N1 = data.N

    # init_counts / totc (Gibbs.cpp:152-167, load_prior_info)
    init_counts, pseudo, totc = _setup_counts(cfg, M, N0, N1, omit, prior)

    eel_d = jnp.asarray(eel, dtype=jnp.float32)
    mw_d = jnp.asarray(mw, dtype=jnp.float32)
    pseudo_d = jnp.asarray(pseudo, dtype=jnp.float32)
    init_counts_d = jnp.asarray(init_counts, dtype=jnp.float32)

    # gene / allele-transcript group membership for count-variance accumulation
    sids = np.arange(1, M + 1)
    gids = jnp.asarray(gi.gids_of(sids), dtype=jnp.int32)
    m = gi.m
    if ta is not None:
        tids = jnp.asarray(ta.gids_of(sids), dtype=jnp.int32)
        m_trans = ta.m
    else:
        tids, m_trans = None, 0

    # ---- per-chain state & one sweep ----
    # z lives as one array PER BUCKET (block slices are then contiguous
    # static slices instead of [N1]-wide scatters), and each bucket gets a
    # share of the n_blocks budget PROPORTIONAL to its read count: the
    # blocked-collapse staleness bound is ~N1/n_blocks reads per count
    # refresh either way, but the old per-bucket split ran n_buckets *
    # n_blocks sequential steps (r4: 350 steps -> 0.8 s/sweep, 6.5x the
    # reference's sequential C++ scan); proportional blocking keeps ~the
    # same bound at ~n_blocks steps total.
    n_buckets = len(data.buckets)
    total_reads_b = sum(b[0].shape[0] for b in data.buckets)

    def _count_hist(zb, weight):
        from ..ops.pallas_table import onehot_scatter

        w = jnp.full(zb.shape, weight, jnp.float32)
        return onehot_scatter(zb, w, M + 1)

    def init_chain(key):
        z_bs = []
        counts = init_counts_d.at[0].add(float(N0))
        for b, (sid_b, lcp_b, rows) in enumerate(data.buckets):
            kb = jax.random.fold_in(key, b)
            g = jax.random.gumbel(kb, lcp_b.shape, dtype=jnp.float32)
            pick = jnp.argmax(
                jnp.where(jnp.isfinite(lcp_b), lcp_b + g, NEG_INF), axis=1
            )
            zb = jnp.take_along_axis(sid_b, pick[:, None], axis=1)[:, 0]
            zb = jnp.where(jnp.any(jnp.isfinite(lcp_b), axis=1), zb, 0)
            z_bs.append(zb)
            counts = counts + _count_hist(zb, 1.0)
        return tuple(z_bs), counts

    def sweep(key, z_bs, counts):
        """One full Gibbs round (all buckets, blocked)."""
        z_out = list(z_bs)
        for b, (sid_b, lcp_b, rows) in enumerate(data.buckets):
            n = sid_b.shape[0]
            # ceil keeps each bucket's per-refresh staleness at or below
            # ~total_reads/n_blocks even for small buckets (advisor r4)
            nblk = max(1, min(
                -(-(cfg.n_blocks * n) // max(total_reads_b, 1)), n))
            blk = -(-n // nblk)
            zfull = z_out[b]
            for j in range(nblk):
                lo = j * blk
                hi = min(n, lo + blk)
                if lo >= hi:
                    continue
                kb = jax.random.fold_in(jax.random.fold_in(key, b), j)
                zb = zfull[lo:hi]
                new_zb = _sample_bucket(
                    kb, sid_b[lo:hi], lcp_b[lo:hi], counts, zb, pseudo_d
                )
                # count refresh via the one-hot MXU histogram of +/-1
                # deltas (an [M+1] scatter-add pair serializes on TPU)
                both = jnp.concatenate([zb, new_zb])
                w = jnp.concatenate([
                    jnp.full(zb.shape, -1.0, jnp.float32),
                    jnp.full(new_zb.shape, 1.0, jnp.float32),
                ])
                from ..ops.pallas_table import onehot_scatter

                counts = counts + onehot_scatter(both, w, M + 1)
                zfull = zfull.at[lo:hi].set(new_zb)
            z_out[b] = zfull
        return tuple(z_out), counts

    expression_values = _make_expression_values(eel_d, mw_d, pseudo_d, totc)

    def chain(key):
        z, counts = init_chain(jax.random.fold_in(key, 0x7FFFFFFF))

        # double-float (hi, lo) accumulators: the moment sums need ~f64
        # precision (pve = E[c^2] - E[c]^2 cancels catastrophically) but
        # TPU f64 is emulated and the global x64 flag poisons index math
        # everywhere else — see ops/ddsum
        ddz = lambda n: (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
        acc0 = dict(
            pme_c=ddz(M + 1),
            pve_c=ddz(M + 1),
            pme_tpm=ddz(M + 1),
            pme_fpkm=ddz(M + 1),
            pve_c_genes=ddz(m),
            pve_c_trans=ddz(max(m_trans, 1)),
        )
        cvs0 = jnp.zeros(
            (samples_per_chain if cfg.keep_countvectors else 1, M + 1),
            jnp.float32,
        )

        def round_body(r, state):
            z, counts, acc, cvs = state
            z, counts = sweep(jax.random.fold_in(key, r), z, counts)
            retain = (r >= cfg.burnin) & (((r - cfg.burnin) % cfg.gap) == 0)

            def do_retain(args):
                acc, cvs = args
                tpm, fpkm = expression_values(counts)
                gsum = jax.ops.segment_sum(counts[1:], gids, num_segments=m)
                acc = dict(
                    pme_c=dd_add_f32(acc["pme_c"], counts),
                    pve_c=dd_add(acc["pve_c"], dd_sq(counts)),
                    pme_tpm=dd_add_f32(acc["pme_tpm"], tpm),
                    pme_fpkm=dd_add_f32(acc["pme_fpkm"], fpkm),
                    pve_c_genes=dd_add(acc["pve_c_genes"], dd_sq(gsum)),
                    pve_c_trans=dd_add(
                        acc["pve_c_trans"],
                        dd_sq(jax.ops.segment_sum(counts[1:], tids,
                                                  num_segments=m_trans))
                        if ta is not None
                        else (jnp.zeros(1, jnp.float32),) * 2,
                    ),
                )
                if cfg.keep_countvectors:
                    idx = (r - cfg.burnin) // cfg.gap
                    cvs = jax.lax.dynamic_update_slice(
                        cvs, counts[None, :].astype(jnp.float32), (idx, 0)
                    )
                return acc, cvs

            acc, cvs = jax.lax.cond(retain, do_retain, lambda a: a, (acc, cvs))
            return z, counts, acc, cvs

        return z, counts, acc0, cvs0, round_body

    # ---- segmented dispatch (r4): one jit over ALL sweeps ran minutes on
    # a single executable at bench scale and tripped the remote TPU
    # worker's watchdog ("TPU worker process crashed"); sweeping in
    # bounded segments keeps each dispatch short, costs one tiny host
    # sync per segment, and leaves all chain state on device ----
    total_rounds = cfg.burnin + chain_len
    seg = max(1, min(cfg.sweep_segment, total_rounds))
    n_seg = -(-total_rounds // seg)

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), C)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(mesh.devices.shape))
        assert C % n_dev == 0, (
            f"n_chains={C} must be divisible by mesh size {n_dev}"
        )
        keys = jax.device_put(keys, NamedSharding(mesh, P("dp")))

    def chain_init(key):
        z, counts, acc0, cvs0, _rb = chain(key)
        return z, counts, acc0, cvs0

    def chain_segment(key, r0, state):
        _z, _c, _a, _cv, round_body = chain(key)

        def body(i, st):
            r = r0 + i
            return jax.lax.cond(
                r < total_rounds, lambda s: round_body(r, s), lambda s: s,
                st,
            )

        return jax.lax.fori_loop(0, seg, body, state)

    from ..utils.jaxinit import sync as _sync

    state = jax.jit(jax.vmap(chain_init))(keys)
    seg_fn = jax.jit(jax.vmap(chain_segment, in_axes=(0, None, 0)))
    for s in range(n_seg):
        state = seg_fn(keys, jnp.asarray(s * seg, jnp.int32), state)
        if (s % 4) == 3 or s == n_seg - 1:
            _sync(state[1])  # bound the in-flight dispatch queue
    _, _, accs, cvs = state
    return _finish_moments(accs, cfg, M, gi, ta, cvs)
