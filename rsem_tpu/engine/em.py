"""The EM quantification engine (reference: EM.cpp).

Structure per round:
  rounds 1..UPDATE_MODEL_ROUNDS ("model rounds"): recompute per-hit log
    conprb on device (model changed), run the segment-softmax E-step, pull
    tiny sufficient-statistic tensors to the host, re-normalize the model in
    float64, recompute masking weights — mirroring E_STEP + collect/finish
    (EM.cpp:364-416).
  later rounds ("theta rounds"): conprb is frozen; each round is a single
    jitted theta iteration (segment softmax + scatter-add + renormalize).

Convergence: max relative theta change over theta >= 1e-7 below 1e-3, with
round count in [MIN_ROUND, MAX_ROUND] (EM.cpp:53-55,407-416).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    EPSILON,
    MAX_ROUND,
    MIN_ROUND,
    STOP_CRITERIA,
    THETA_CUT,
    UPDATE_MODEL_ROUNDS,
)
from ..io.hits import HitArrays
from ..io.results import (
    calc_expression_values,
    gene_level_values,
    polish_theta,
)
from ..model.generative import GenerativeModel
from ..model.spec import ModelSpec
from ..ops.conprb import (
    CHUNK,
    compute_log_conprb,
    compute_log_noise_conprb,
    _ceil_to,
)
from ..ops.estep import em_step, estep_fracs, suffstats
from ..ops.layout import HitsDevice, KernelConfig, ReadsDevice, RefDevice


@dataclass
class EMConfig:
    update_model_rounds: int = UPDATE_MODEL_ROUNDS
    min_round: int = MIN_ROUND
    max_round: int = MAX_ROUND
    stop_criteria: float = STOP_CRITERIA
    verbose: bool = False


@dataclass
class EMResult:
    theta_raw: np.ndarray  # theta' before eel/mw polish [M+1]
    theta: np.ndarray  # polished theta
    counts: np.ndarray  # expected counts [M+1]
    eel: np.ndarray
    tpm: np.ndarray
    fpkm: np.ndarray
    model: GenerativeModel
    rounds: int
    # posterior weights for BAM writeback / Gibbs input
    frac_hit: Optional[np.ndarray] = None
    frac_noise: Optional[np.ndarray] = None
    log_conprb: Optional[np.ndarray] = None
    log_ncp: Optional[np.ndarray] = None


def _bchange(theta_new: np.ndarray, theta_old: np.ndarray):
    mask = theta_old >= THETA_CUT
    change = np.zeros_like(theta_old)
    change[mask] = np.abs(theta_new[mask] - theta_old[mask]) / theta_old[mask]
    return change.max(initial=0.0), int((change >= STOP_CRITERIA).sum())


def run_em(
    model: GenerativeModel,
    ref,
    bundle,
    em_cfg: Optional[EMConfig] = None,
    need_posteriors: bool = True,
) -> EMResult:
    """model: GenerativeModel already initialized via estimate_from_stats;
    ref: refprep.Reference; bundle: io.AlignmentBundle."""
    em_cfg = em_cfg or EMConfig()
    spec = model.spec
    cnt = bundle.cnt
    M = ref.M
    N0, N1, N2, N_tot = cnt.N0, cnt.N1, cnt.N2, cnt.n_tot
    assert N1 > 0, "No alignable reads"

    # ---- device data ----
    refd = RefDevice.from_reference(ref)
    if spec.paired:
        m1 = ReadsDevice.from_arrays(bundle.reads.mate1)
        m2 = ReadsDevice.from_arrays(bundle.reads.mate2)
    else:
        m1 = ReadsDevice.from_arrays(bundle.reads)
        m2 = None
    h_pad = max(_ceil_to(bundle.hits.n_hits, CHUNK), CHUNK)
    hd = HitsDevice.from_arrays(bundle.hits, h_pad)
    max_read_len = m1.codes.shape[1] if m2 is None else max(
        m1.codes.shape[1], m2.codes.shape[1]
    )
    # pad mates to a common L so one KernelConfig serves both
    if m2 is not None and m1.codes.shape[1] != m2.codes.shape[1]:
        def _repad(r: ReadsDevice) -> ReadsDevice:
            padL = max_read_len - r.codes.shape[1]
            return r._replace(
                codes=jnp.pad(r.codes, ((0, 0), (0, padL))),
                quals=jnp.pad(r.quals, ((0, 0), (0, padL))) if r.quals is not None else None,
            )
        m1, m2 = _repad(m1), _repad(m2)
    kcfg = KernelConfig.from_model(model, max_read_len)

    n_reads = m1.lens.shape[0]

    # device arrays are passed as jit arguments (not closure constants) so
    # executables stay small and buffers are donated/shared across calls
    conprb_fn = jax.jit(partial(compute_log_conprb, kcfg))
    ncp_fn = jax.jit(partial(compute_log_noise_conprb, kcfg))

    @partial(jax.jit, static_argnames=("with_suff",))
    def round_fn(log_theta, log_conprb, log_ncp, dev_model, refd_, m1_, m2_,
                 hd_, with_suff: bool):
        out = estep_fracs(
            log_theta, hd_.sid, hd_.rid, log_conprb, log_ncp, n_reads, M
        )
        counts = out.counts.at[0].add(float(N0))
        theta = counts / jnp.sum(counts)
        if with_suff:
            suff = suffstats(
                kcfg, refd_, m1_, m2_, hd_, out.frac_hit, out.frac_noise,
                dev_model, float(spec.probF),
            )
            return theta, counts, suff
        return theta, counts, None

    @jax.jit
    def theta_step(log_theta, log_conprb, log_ncp, hd_):
        return em_step(
            log_theta, hd_.sid, hd_.rid, log_conprb, log_ncp,
            n_reads, M, float(N0),
        )

    def to_dev(model_np: Dict[str, np.ndarray]):
        return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in model_np.items()}

    # ---- theta init (EM.cpp:343-346) ----
    theta = np.empty(M + 1)
    theta[0] = max(N0 / (N_tot - N2), 1e-8)
    theta[1:] = (1.0 - theta[0]) / M

    dev_model = to_dev(model.device_arrays())
    log_conprb = conprb_fn(refd, m1, m2, hd, dev_model)
    log_ncp = ncp_fn(m1, m2, dev_model)

    # ---- model-update rounds (conprb recomputed each round) ----
    # sufficient statistics run in the native C++ sidecar when available:
    # tiny-table scatter is CPU-cache work (reference: EM.cpp mhp.update)
    from ..native import get_lib, native_suffstats

    use_native = get_lib() is not None

    estep_jit = jax.jit(
        lambda lt, lc, ln, hd_: estep_fracs(
            lt, hd_.sid, hd_.rid, lc, ln, n_reads, M
        )
    )

    rounds = 0
    tot_num = 1
    while rounds < em_cfg.update_model_rounds and rounds < em_cfg.max_round:
        rounds += 1
        log_theta = jnp.asarray(_safe_log_np(theta), dtype=jnp.float32)
        if use_native:
            out = estep_jit(log_theta, log_conprb, log_ncp, hd)
            counts = np.asarray(out.counts, dtype=np.float64)
            counts[0] += N0
            new_theta = counts / counts.sum()
            frac_hit = np.asarray(out.frac_hit)[: bundle.hits.n_hits]
            frac_noise = np.asarray(out.frac_noise)[: bundle.reads.n]
            suff_np = native_suffstats(
                bundle.hits, frac_hit, frac_noise, bundle.reads, ref, model
            )
        else:
            new_theta, counts, suff = round_fn(
                log_theta, log_conprb, log_ncp, dev_model, refd, m1, m2, hd,
                with_suff=True,
            )
            new_theta = np.asarray(new_theta, dtype=np.float64)
            suff_np = {
                k: np.asarray(v, dtype=np.float64) for k, v in suff.items()
            }
        model.finish_round(suff_np)
        dev_model = to_dev(model.device_arrays())
        log_conprb = conprb_fn(refd, m1, m2, hd, dev_model)
        log_ncp = ncp_fn(m1, m2, dev_model)
        bchg, tot_num = _bchange(new_theta, theta)
        theta = new_theta
        if em_cfg.verbose:
            print(f"ROUND = {rounds}, bChange = {bchg:.6g}, totNum = {tot_num}")

    # ---- theta-only rounds: on-device while_loop over the fast layout ----
    from ..ops.fast_estep import (
        build_fast_data,
        fast_final_fracs,
        run_fast_em_loop,
    )

    lcp_np = np.asarray(log_conprb, dtype=np.float64)[: bundle.hits.n_hits]
    lnp_np = np.asarray(log_ncp, dtype=np.float64)[: bundle.hits.n_reads]
    fdata = build_fast_data(bundle.hits, lcp_np, lnp_np, M, float(N0))

    loop_fn = jax.jit(
        partial(
            run_fast_em_loop,
            min_round=em_cfg.min_round,
            max_round=em_cfg.max_round,
        ),
        static_argnames=(),
    )
    theta_dev, counts_dev, rounds_dev = loop_fn(
        jnp.asarray(theta, dtype=jnp.float32), fdata,
        start_round=jnp.asarray(rounds, dtype=jnp.int32),
    )
    theta = np.asarray(theta_dev, dtype=np.float64)
    rounds = int(rounds_dev)

    # ---- final pass: expected weights & counts (EM.cpp:460-478) ----
    final_fn = jax.jit(fast_final_fracs)
    frac_hit, frac_noise = final_fn(jnp.asarray(theta, dtype=jnp.float32), fdata)
    frac_hit = np.asarray(frac_hit, dtype=np.float64)[: bundle.hits.n_hits]
    frac_noise = np.asarray(frac_noise, dtype=np.float64)
    counts = np.zeros(M + 1)
    np.add.at(counts, bundle.hits.sid, frac_hit)
    counts[0] = frac_noise.sum() + N0

    theta_raw = theta.copy()
    eel = model.calc_eel()
    theta_polished = polish_theta(theta, eel, model.mw)
    tpm, fpkm = calc_expression_values(theta_polished, eel)

    res = EMResult(
        theta_raw=theta_raw,
        theta=theta_polished,
        counts=counts,
        eel=eel,
        tpm=tpm,
        fpkm=fpkm,
        model=model,
        rounds=rounds,
    )
    if need_posteriors:
        res.frac_hit = frac_hit
        res.frac_noise = frac_noise[: bundle.reads.n]
        res.log_conprb = lcp_np
        res.log_ncp = lnp_np
    return res


def _safe_log_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return np.log(x)


def write_theta_file(path: str, theta_raw: np.ndarray, theta: np.ndarray):
    """.theta interop (EM.cpp:484-500)."""
    with open(path, "w") as f:
        f.write(f"{len(theta)}\n")
        f.write(" ".join(f"{x:.15g}" for x in theta_raw) + "\n")
        f.write(" ".join(f"{x:.15g}" for x in theta) + "\n")
