"""The EM quantification engine (reference: EM.cpp).

Hybrid execution model, playing each processor to its strengths:

  * model-update rounds (1..10): per-base likelihood (conprb) and
    sufficient-statistic scatter into tiny tables are random-access work on
    KB-sized tables — CPU-cache territory. They run in the multithreaded
    C++ sidecar (rsem_tpu/native) with exact float64 reference semantics
    (E_STEP + collect/finish, EM.cpp:177-247,400-404).
  * theta-only rounds (the long tail, hundreds to thousands of rounds):
    dense O(nHits) segment-softmax iterations run on the TPU inside a single
    lax.while_loop (ops/fast_estep), scaling with chips via shard_map.

A pure-JAX path (`backend='device'`) covers toolchain-free environments and
serves as the cross-check in tests.

Convergence: max relative theta change over theta >= 1e-7 below 1e-3, round
count in [MIN_ROUND, MAX_ROUND] (EM.cpp:53-55,407-416).
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
from ..io.results import calc_expression_values, polish_theta
from ..model.generative import GenerativeModel
from ..ops.conprb import (
    CHUNK,
    _ceil_to,
    compute_log_conprb,
    compute_log_noise_conprb,
    precompute_profile_indices,
    preidx_bytes,
)
from ..ops.estep import estep_fracs, suffstats
from ..ops.layout import HitsDevice, KernelConfig, ReadsDevice, RefDevice
from ..utils.jaxinit import configure as _configure_jax, fetch64


@dataclass
class EMConfig:
    update_model_rounds: int = UPDATE_MODEL_ROUNDS
    min_round: int = MIN_ROUND
    max_round: int = MAX_ROUND
    stop_criteria: float = STOP_CRITERIA
    verbose: bool = False
    backend: str = "auto"  # auto | hybrid | device | native
    theta_backend: str = "device"  # device (TPU loop) | native (CPU loop)
    # theta-loop kernel on single-device TPU: auto picks the fused Pallas
    # round when supported (TPU backend, M <= 64k), else the XLA round
    fast_kernel: str = "auto"  # auto | pallas | xla

    def __post_init__(self):
        # the segmented theta-loop drivers assume min_round <= max_round
        # (a violation would spin the outer host while forever)
        if self.min_round > self.max_round:
            raise ValueError(
                f"min_round ({self.min_round}) must be <= max_round "
                f"({self.max_round})"
            )


@dataclass
class EMResult:
    theta_raw: np.ndarray
    theta: np.ndarray
    counts: np.ndarray
    eel: np.ndarray
    tpm: np.ndarray
    fpkm: np.ndarray
    model: GenerativeModel
    rounds: int
    frac_hit: Optional[np.ndarray] = None
    frac_noise: Optional[np.ndarray] = None
    log_conprb: Optional[np.ndarray] = None
    log_ncp: Optional[np.ndarray] = None


def _bchange(theta_new: np.ndarray, theta_old: np.ndarray):
    mask = theta_old >= THETA_CUT
    change = np.zeros_like(theta_old)
    change[mask] = np.abs(theta_new[mask] - theta_old[mask]) / theta_old[mask]
    return change.max(initial=0.0), int((change >= STOP_CRITERIA).sum())


def _n_fast_devices() -> int:
    """Devices the theta-only loop shards over (1 = single-device path)."""
    try:
        return len(jax.devices())
    except RuntimeError:
        return 1


def _run_fast_loop(theta, bundle, lcp_np, lnp_np, M, N0, em_cfg, rounds,
                   lcp_dev=None, lnp_dev=None, sid_dev=None,
                   need_restore=True):
    """Dispatch the theta-only EM while_loop: read-sharded over the mesh
    when >1 device is visible (EM.cpp:373-389's pthread loop, psum-merged),
    single-device otherwise. Returns (theta f64, rounds, final,
    final_counts): `final(theta)` recomputes the per-hit posterior fracs
    (host arrays); `final_counts(theta)` (or None) fetches only the [M+1]
    expected counts — the cheap path when no posteriors are needed.

    With lcp_dev/lnp_dev/sid_dev set (the DEVICE frozen conprbs + sid),
    the Pallas layout is filled on device — no conprb D2H, no tile H2D
    (~40-90 MB/s tunnel on the dev host); lcp_np/lnp_np may then be None
    and are only materialized if the XLA fallback actually runs."""
    n_dev = _n_fast_devices()

    def _host_conprbs():
        nonlocal lcp_np, lnp_np
        if lcp_np is None:
            lcp_np = fetch64(lcp_dev)[: bundle.hits.n_hits]
            lnp_np = fetch64(lnp_dev)[: bundle.hits.n_reads]
        return lcp_np, lnp_np

    if n_dev > 1:
        from ..parallel.fast_sharded import (
            build_fast_data_sharded,
            fast_final_fracs_sharded,
            place_fast_sharded,
            run_fast_em_loop_sharded,
        )
        from ..parallel.mesh import make_mesh

        lcp_np, lnp_np = _host_conprbs()
        mesh = make_mesh(n_dev)
        sd = place_fast_sharded(
            mesh,
            build_fast_data_sharded(bundle.hits, lcp_np, lnp_np, M,
                                    float(N0), n_dev),
        )
        theta_dev, counts_dev, rounds_dev = run_fast_em_loop_sharded(
            jnp.asarray(theta, dtype=jnp.float32), sd, mesh,
            min_round=em_cfg.min_round, max_round=em_cfg.max_round,
            start_round=rounds,
        )
        final = lambda th: fast_final_fracs_sharded(
            jnp.asarray(th, dtype=jnp.float32), sd)
        return fetch64(theta_dev), int(rounds_dev), final, None

    from ..ops import pallas_round as _pr

    use_pallas = em_cfg.fast_kernel == "pallas" or (
        em_cfg.fast_kernel == "auto" and _pr.pallas_supported(M)
    )
    if use_pallas:
        if lcp_dev is not None:
            pdata = _pr.build_pallas_data_device(
                bundle.hits, lcp_dev, lnp_dev, sid_dev, M, float(N0),
                need_restore=need_restore,
            )
        else:
            pdata = _pr.build_pallas_data(bundle.hits, lcp_np, lnp_np, M,
                                          float(N0))
        # pdata rides through jit as an ARGUMENT: its custom pytree keeps
        # the grid-sizing int metadata concrete (aux_data) while the tiles
        # stay device buffers instead of embedded program constants
        try:
            theta_dev, counts_dev, rounds_dev = _pr.jit_pallas_loop(
                jnp.asarray(theta, dtype=jnp.float32), pdata,
                jnp.asarray(rounds, dtype=jnp.int32),
                em_cfg.min_round, em_cfg.max_round,
            )
            # JAX dispatch is async (and on the axon platform
            # block_until_ready returns at dispatch): force execution via a
            # scalar fetch so RUNTIME Mosaic/driver failures surface inside
            # this try block and hit the XLA fallback too (advisor r3)
            from ..utils.jaxinit import sync as _sync

            _sync(theta_dev, rounds_dev)
        except Exception as exc:  # Mosaic/driver regression: XLA fallback
            if em_cfg.fast_kernel == "pallas":
                raise
            import warnings

            warnings.warn(
                f"pallas theta loop failed ({type(exc).__name__}: {exc}); "
                "falling back to the XLA round"
            )
        else:
            def final(th):
                f, fn_ = _pr.jit_pallas_final_fracs(
                    jnp.asarray(th, dtype=jnp.float32), pdata)
                return (
                    fetch64(f)[: bundle.hits.n_hits],
                    fetch64(fn_)[: bundle.hits.n_reads],
                )

            def final_counts(th):
                return fetch64(_pr.jit_pallas_counts(
                    jnp.asarray(th, dtype=jnp.float32), pdata))

            return fetch64(theta_dev), int(rounds_dev), final, final_counts

    from ..ops.fast_estep import (
        build_fast_data,
        fast_final_fracs,
        jit_fast_theta_round,
        run_fast_em_loop,
    )

    lcp_np, lnp_np = _host_conprbs()
    fdata = build_fast_data(bundle.hits, lcp_np, lnp_np, M, float(N0))
    # bounded-segment dispatch: at large M a single while_loop spanning
    # hundreds of rounds runs for minutes and trips the remote TPU
    # worker's watchdog (r4); semantics are identical — the convergence
    # test runs inside each segment, capped at SEG rounds per dispatch
    SEG = 64
    loop_fn = jax.jit(run_fast_em_loop)
    theta_dev = jnp.asarray(theta, dtype=jnp.float32)
    r = rounds
    tot = 1
    while r < em_cfg.min_round or (tot > 0 and r < em_cfg.max_round):
        target = min(r + SEG, em_cfg.max_round)
        theta_dev, counts_dev, rounds_dev, tot_dev = loop_fn(
            theta_dev, fdata,
            min_round=jnp.asarray(min(em_cfg.min_round, target),
                                  dtype=jnp.int32),
            max_round=jnp.asarray(target, dtype=jnp.int32),
            start_round=jnp.asarray(r, dtype=jnp.int32),
        )
        r = int(rounds_dev)
        tot = int(tot_dev)

    def final(th):
        # fdata as ARGUMENT: a closure would serialize the layout into the
        # remote compile request (HTTP 413 at M=200k scale, r4)
        f, fn_ = jax.jit(fast_final_fracs)(
            jnp.asarray(th, dtype=jnp.float32), fdata)
        return (
            fetch64(f)[: bundle.hits.n_hits],
            fetch64(fn_)[: bundle.hits.n_reads],
        )

    def final_counts(th):
        return fetch64(
            jit_fast_theta_round(jnp.asarray(th, dtype=jnp.float32),
                                 fdata)[1]
        )

    return fetch64(theta_dev), int(rounds_dev), final, final_counts


def _theta_init(cnt, M: int) -> np.ndarray:
    theta = np.empty(M + 1)
    theta[0] = max(cnt.N0 / (cnt.n_tot - cnt.N2), 1e-8)
    theta[1:] = (1.0 - theta[0]) / M
    return theta


def _safe_log_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return np.log(x)


def _finish(model, ref, bundle, theta, counts, rounds, frac_hit, frac_noise,
            lcp_np, lnp_np, need_posteriors) -> EMResult:
    theta_raw = theta.copy()
    eel = model.calc_eel()
    theta_polished = polish_theta(theta, eel, model.mw)
    tpm, fpkm = calc_expression_values(theta_polished, eel)
    res = EMResult(
        theta_raw=theta_raw, theta=theta_polished, counts=counts, eel=eel,
        tpm=tpm, fpkm=fpkm, model=model, rounds=rounds,
    )
    if need_posteriors:
        res.frac_hit = frac_hit
        res.frac_noise = frac_noise
        res.log_conprb = lcp_np
        res.log_ncp = lnp_np
    return res


# --------------------------------------------------------------------- #
# hybrid path: native model rounds + TPU theta loop                      #
# --------------------------------------------------------------------- #
def _run_em_hybrid(model, ref, bundle, em_cfg, need_posteriors) -> EMResult:
    from ..native import native_conprb, native_em_count_step, native_suffstats

    cnt = bundle.cnt
    M = ref.M
    N0 = cnt.N0
    theta = _theta_init(cnt, M)

    rounds = 0
    conprb = ncp = None
    while rounds < em_cfg.update_model_rounds and rounds < em_cfg.max_round:
        rounds += 1
        conprb, ncp = native_conprb(bundle.hits, bundle.reads, ref, model)
        frac, frac_noise, counts = native_em_count_step(
            bundle.hits, conprb, ncp, theta, M
        )
        counts[0] += N0
        new_theta = counts / counts.sum()
        suff = native_suffstats(
            bundle.hits, frac.astype(np.float32),
            frac_noise.astype(np.float32), bundle.reads, ref, model,
        )
        model.finish_round(suff)
        bchg, _tot = _bchange(new_theta, theta)
        theta = new_theta
        if em_cfg.verbose:
            print(f"ROUND = {rounds}, bChange = {bchg:.6g}")

    # final model -> final conprbs
    conprb, ncp = native_conprb(bundle.hits, bundle.reads, ref, model)
    lcp_np = _safe_log_np(conprb)
    lnp_np = _safe_log_np(ncp)

    if em_cfg.theta_backend == "native":
        tot_num = 1
        while rounds < em_cfg.min_round or (
            tot_num > 0 and rounds < em_cfg.max_round
        ):
            rounds += 1
            _f, _fn, counts = native_em_count_step(
                bundle.hits, conprb, ncp, theta, M
            )
            counts[0] += N0
            new_theta = counts / counts.sum()
            _b, tot_num = _bchange(new_theta, theta)
            theta = new_theta
    else:
        theta, rounds, _final, _fc = _run_fast_loop(
            theta, bundle, lcp_np, lnp_np, M, N0, em_cfg, rounds
        )

    # final expected weights & counts (EM.cpp:460-478)
    frac_hit, frac_noise, counts = native_em_count_step(
        bundle.hits, conprb, ncp, theta, M
    )
    counts[0] += N0
    return _finish(model, ref, bundle, theta, counts, rounds, frac_hit,
                   frac_noise, lcp_np, lnp_np, need_posteriors)


# --------------------------------------------------------------------- #
# sharded device path: model rounds + conprb freeze + fast loop, all     #
# under the mesh (EM.cpp:373-404's thread fork/join/reduce, psum'd)      #
# --------------------------------------------------------------------- #
def _run_em_device_sharded(model, ref, bundle, em_cfg, need_posteriors,
                           n_dev) -> EMResult:
    from ..parallel.fast_sharded import partition_reads_by_hits
    from ..parallel.mesh import (
        make_mesh,
        make_sharded_conprb,
        make_sharded_round,
        place_sharded,
        shard_bundle_by_read,
    )

    spec = model.spec
    cnt = bundle.cnt
    M = ref.M
    N0 = cnt.N0
    mesh = make_mesh(n_dev)
    sharded = place_sharded(mesh, shard_bundle_by_read(bundle, n_dev))
    bounds = partition_reads_by_hits(bundle.hits.read_offsets, n_dev)
    hit_bounds = bundle.hits.read_offsets[bounds]

    refd = RefDevice.from_reference(ref)
    kcfg = KernelConfig.from_model(model, sharded.m1.codes.shape[2])

    def to_dev(model_np: Dict[str, np.ndarray]):
        return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in model_np.items()}

    dev_model = to_dev(model.device_arrays())
    conprb_fn = make_sharded_conprb(mesh, kcfg)(
        refd, sharded.m1, sharded.m2, sharded.hits, dev_model
    )

    theta = _theta_init(cnt, M)
    rounds = 0
    n_model_rounds = min(em_cfg.update_model_rounds, em_cfg.max_round)
    from ..ops.model_loop import fused_supported

    import os as _os

    min_fl = int(np.min(ref.full_len[1:])) if M >= 1 else 0
    fused = (
        n_model_rounds > 0
        and fused_supported(kcfg, model.spec.has_polya, min_full_len=min_fl)
        and _os.environ.get("RSEM_TPU_FUSED_MODEL", "1") != "0"
    )
    if fused:
        # ALL model rounds in one psum-merged dispatch (r5: the r4 fused
        # loop ported under shard_map — no per-round host refit/re-upload)
        from ..parallel.mesh import make_sharded_model_loop

        loop_fn = make_sharded_model_loop(
            mesh, kcfg, M, float(N0), float(spec.probF),
            sharded.n_reads_dev, n_model_rounds,
        )(refd, sharded.m1, sharded.m2, sharded.hits, dev_model)
        theta_dev, suff = loop_fn(
            jnp.asarray(theta, dtype=jnp.float32), refd, sharded.m1,
            sharded.m2, sharded.hits, dev_model, sharded.read_offsets,
            jnp.asarray(np.asarray(model.npro.c).reshape(-1),
                        dtype=jnp.float32)[: kcfg.npro_keys()],
        )
        suff_np = {k: fetch64(v) for k, v in suff.items()}
        model.finish_round(suff_np)
        dev_model = to_dev(model.device_arrays())
        theta = fetch64(theta_dev)
        rounds = n_model_rounds
    else:
        round_fn = make_sharded_round(
            mesh, kcfg, M, float(N0), float(spec.probF),
            sharded.n_reads_dev, with_suff=True,
        )(refd, sharded.m1, sharded.m2, sharded.hits, dev_model)
        while rounds < n_model_rounds:
            rounds += 1
            log_theta = jnp.asarray(_safe_log_np(theta), dtype=jnp.float32)
            new_theta, counts, suff = round_fn(
                log_theta, refd, sharded.m1, sharded.m2, sharded.hits,
                dev_model
            )
            suff_np = {k: fetch64(v) for k, v in suff.items()}
            model.finish_round(suff_np)
            dev_model = to_dev(model.device_arrays())
            new_theta = fetch64(new_theta)
            bchg, _ = _bchange(new_theta, theta)
            theta = new_theta
            if em_cfg.verbose:
                print(f"ROUND = {rounds}, bChange = {bchg:.6g}")

    # conprb freeze under the mesh, unpadded + restitched on host
    lcp_sh, lnp_sh = conprb_fn(refd, sharded.m1, sharded.m2, sharded.hits,
                               dev_model)
    lcp_sh = fetch64(lcp_sh)
    lnp_sh = fetch64(lnp_sh)
    lcp_np = np.concatenate([
        lcp_sh[d, : hit_bounds[d + 1] - hit_bounds[d]] for d in range(n_dev)
    ]) if bundle.hits.n_hits else np.zeros(0)
    lnp_np = np.concatenate([
        lnp_sh[d, : bounds[d + 1] - bounds[d]] for d in range(n_dev)
    ])

    theta, rounds, final, _fc = _run_fast_loop(
        theta, bundle, lcp_np, lnp_np, M, N0, em_cfg, rounds
    )
    frac_hit, frac_noise = final(theta)
    counts = np.zeros(M + 1)
    np.add.at(counts, bundle.hits.sid, frac_hit)
    counts[0] = frac_noise.sum() + N0
    return _finish(model, ref, bundle, theta, counts, rounds, frac_hit,
                   frac_noise, lcp_np, lnp_np, need_posteriors)


class _PhaseClock:
    """Env-gated wall-clock accounting for run_em phases
    (RSEM_TPU_EM_TIMING=1 prints a per-phase table at the end)."""

    def __init__(self):
        import os

        self.on = os.environ.get("RSEM_TPU_EM_TIMING") == "1"
        self.acc: Dict[str, float] = {}
        self._t0 = time.perf_counter()

    def lap(self, name: str):
        t = time.perf_counter()
        self.acc[name] = self.acc.get(name, 0.0) + (t - self._t0)
        self._t0 = t

    def report(self, label: str):
        if self.on:
            import sys

            total = sum(self.acc.values())
            print(f"[em timing] {label}: total {total:.2f}s", flush=True,
                  file=sys.stderr)
            for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1]):
                print(f"[em timing]   {k:28s} {v:8.2f}s", flush=True,
                      file=sys.stderr)


# --------------------------------------------------------------------- #
# pure device path                                                       #
# --------------------------------------------------------------------- #
def _run_em_device(model, ref, bundle, em_cfg, need_posteriors) -> EMResult:
    spec = model.spec
    cnt = bundle.cnt
    M = ref.M
    N0 = cnt.N0

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
    if m2 is not None and m1.codes.shape[1] != m2.codes.shape[1]:
        def _repad(r: ReadsDevice) -> ReadsDevice:
            padL = max_read_len - r.codes.shape[1]
            return r._replace(
                codes=jnp.pad(r.codes, ((0, 0), (0, padL))),
                quals=jnp.pad(r.quals, ((0, 0), (0, padL)))
                if r.quals is not None else None,
            )
        m1, m2 = _repad(m1), _repad(m2)
    # effective key-window bound for the PreIdx table kernels: quality
    # codes actually present (host numpy max; ops/layout.KernelConfig)
    qmax = None
    if spec.has_qual:
        r1 = bundle.reads.mate1 if spec.paired else bundle.reads
        qmax = int(np.max(r1.quals)) if r1.quals is not None else None
        if spec.paired and bundle.reads.mate2.quals is not None:
            qmax = max(qmax or 0, int(np.max(bundle.reads.mate2.quals)))
    kcfg = KernelConfig.from_model(model, max_read_len, qmax=qmax)
    n_reads = m1.lens.shape[0]

    conprb_fn = jax.jit(partial(compute_log_conprb, kcfg))
    ncp_fn = jax.jit(partial(compute_log_noise_conprb, kcfg))

    # freeze the round-invariant profile-table indices once: the per-round
    # conprb/suffstats passes then skip the reference walk entirely
    # (ops/conprb.PreIdx). Gated on HBM footprint.
    pre = None
    import os as _os

    pre_budget = int(_os.environ.get("RSEM_TPU_PREIDX_BUDGET",
                                     6 * 1024**3))
    clock = _PhaseClock()
    if clock.on:
        from ..utils.jaxinit import sync as _sync0

        _sync0(m1.codes, hd.sid)
    clock.lap("setup+H2D")
    if preidx_bytes(kcfg, int(hd.rid.shape[0]),
                    int(m1.lens.shape[0])) <= pre_budget:
        if _os.environ.get("RSEM_TPU_PREIDX_EAGER") == "1":
            # escape hatch: op-by-op eager build (r4 saw multi-minute
            # remote compiles on SOME monolithic programs; the fused
            # windowed builder below compiles in seconds and runs ~10x
            # faster — see precompute_profile_indices_fused)
            from ..ops.conprb import precompute_profile_indices_eager

            pre = precompute_profile_indices_eager(kcfg, refd, m1, m2, hd)
        else:
            from ..ops.conprb import precompute_profile_indices_fused

            pre = precompute_profile_indices_fused(kcfg, refd, m1, m2, hd)
        if clock.on:
            from ..utils.jaxinit import sync as _sync_

            _sync_(pre.flat1)
    clock.lap("PreIdx build")

    @jax.jit
    def round_fn(log_theta, log_conprb, log_ncp, dev_model, refd_, m1_, m2_,
                 hd_, pre_):
        out = estep_fracs(
            log_theta, hd_.sid, hd_.rid, log_conprb, log_ncp, n_reads, M
        )
        counts = out.counts.at[0].add(float(N0))
        theta = counts / jnp.sum(counts)
        suff = suffstats(
            kcfg, refd_, m1_, m2_, hd_, out.frac_hit, out.frac_noise,
            dev_model, float(spec.probF), pre=pre_,
        )
        return theta, counts, suff

    def to_dev(model_np: Dict[str, np.ndarray]):
        return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in model_np.items()}

    theta = _theta_init(cnt, M)
    dev_model = to_dev(model.device_arrays())

    n_model_rounds = min(em_cfg.update_model_rounds, em_cfg.max_round)
    from ..ops.model_loop import fused_supported

    min_fl = int(np.min(ref.full_len[1:])) if M >= 1 else 0
    fused = (
        pre is not None
        and n_model_rounds > 0
        and fused_supported(kcfg, model.spec.has_polya, min_full_len=min_fl)
        and _os.environ.get("RSEM_TPU_FUSED_MODEL", "1") != "0"
    )
    rounds = 0
    if fused:
        # all model-update rounds in ONE on-device fori_loop: no per-round
        # host sync/refit/re-upload (the r3 profile's 27.5s); the float64
        # reference finish runs once on the final round's statistics
        from ..ops.model_loop import (
            jit_build_model_loop_data,
            jit_model_loop,
            tables_from_model,
        )

        mdata = jit_build_model_loop_data(
            kcfg, refd, m1, m2, hd, pre, dev_model,
            jnp.asarray(bundle.hits.read_offsets, dtype=jnp.int32),
            jnp.asarray(np.asarray(model.npro.c).reshape(-1),
                        dtype=jnp.float32),
            jnp.asarray(float(N0), dtype=jnp.float32),
            float(spec.probF),
        )
        if clock.on:
            from ..utils.jaxinit import sync as _sync2

            _sync2(mdata.s0)
            clock.lap("model: loop-data build")
        theta_dev, suff = jit_model_loop(
            kcfg, mdata, tables_from_model(kcfg, dev_model),
            jnp.asarray(theta, dtype=jnp.float32), n_model_rounds,
            n_reads, M,
        )
        suff_np = {k: fetch64(v) for k, v in suff.items()}
        clock.lap("model: fused device loop (sync at fetch)")
        model.finish_round(suff_np)
        dev_model = to_dev(model.device_arrays())
        theta = fetch64(theta_dev)
        rounds = n_model_rounds
        clock.lap("model: final host refit")
        log_conprb = conprb_fn(refd, m1, m2, hd, dev_model, pre)
        log_ncp = ncp_fn(m1, m2, dev_model, pre)
    else:
        log_conprb = conprb_fn(refd, m1, m2, hd, dev_model, pre)
        log_ncp = ncp_fn(m1, m2, dev_model, pre)
        while rounds < n_model_rounds:
            rounds += 1
            log_theta = jnp.asarray(_safe_log_np(theta), dtype=jnp.float32)
            new_theta, counts, suff = round_fn(
                log_theta, log_conprb, log_ncp, dev_model, refd, m1, m2,
                hd, pre
            )
            clock.lap("model: dispatch")
            suff_np = {k: fetch64(v) for k, v in suff.items()}
            clock.lap("model: conprb+estep+suff (sync at fetch)")
            model.finish_round(suff_np)
            dev_model = to_dev(model.device_arrays())
            clock.lap("model: host refit")
            log_conprb = conprb_fn(refd, m1, m2, hd, dev_model, pre)
            log_ncp = ncp_fn(m1, m2, dev_model, pre)
            new_theta = fetch64(new_theta)
            clock.lap("model: theta fetch")
            bchg, _ = _bchange(new_theta, theta)
            theta = new_theta
            if em_cfg.verbose:
                print(f"ROUND = {rounds}, bChange = {bchg:.6g}")

    # posterior consumers (Gibbs handoff, BAM writing) need the host
    # conprbs; the point-estimate path keeps everything on device
    lcp_np = lnp_np = None
    if need_posteriors:
        lcp_np = fetch64(log_conprb)[: bundle.hits.n_hits]
        lnp_np = fetch64(log_ncp)[: bundle.hits.n_reads]
    clock.lap("conprb freeze + D2H")
    theta, rounds, final, final_counts = _run_fast_loop(
        theta, bundle, lcp_np, lnp_np, M, N0, em_cfg, rounds,
        lcp_dev=log_conprb, lnp_dev=log_ncp, sid_dev=hd.sid,
        need_restore=need_posteriors,
    )
    clock.lap("theta loop (build+compile+run)")
    if need_posteriors or final_counts is None:
        frac_hit, frac_noise = final(theta)
        counts = np.zeros(M + 1)
        np.add.at(counts, bundle.hits.sid, frac_hit)
        counts[0] = frac_noise.sum() + N0
    else:
        # final E-step reduced to the [M+1] expected counts, on device
        # (counts[0] already includes N0 via the round's n0 term)
        frac_hit = frac_noise = None
        counts = final_counts(theta)
    clock.lap("final E-step + host scatter")
    clock.report("device path")
    return _finish(model, ref, bundle, theta, counts, rounds, frac_hit,
                   frac_noise, lcp_np, lnp_np, need_posteriors)


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
    assert bundle.cnt.N1 > 0, "No alignable reads"
    _configure_jax()  # x64 for the tiny f64 accumulators + XLA disk cache

    backend = em_cfg.backend
    if backend == "auto":
        from ..native import get_lib

        lib = get_lib()
        has_native = lib is not None and hasattr(lib, "conprb")
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        # r5: the pure-device path (fused model loop + device-built theta
        # layout + on-device final counts) beats the hybrid CPU-sidecar
        # path on TPU; hybrid remains the pick on CPU-only hosts
        backend = "device" if on_tpu else (
            "hybrid" if has_native else "device")
    if backend in ("hybrid", "native"):
        if backend == "native":
            em_cfg = EMConfig(**{**em_cfg.__dict__, "theta_backend": "native"})
        return _run_em_hybrid(model, ref, bundle, em_cfg, need_posteriors)
    n_dev = _n_fast_devices()
    if n_dev > 1:
        return _run_em_device_sharded(model, ref, bundle, em_cfg,
                                      need_posteriors, n_dev)
    return _run_em_device(model, ref, bundle, em_cfg, need_posteriors)


def write_theta_file(path: str, theta_raw: np.ndarray, theta: np.ndarray):
    """.theta interop (EM.cpp:484-500)."""
    with open(path, "w") as f:
        f.write(f"{len(theta)}\n")
        f.write(" ".join(f"{x:.15g}" for x in theta_raw) + "\n")
        f.write(" ".join(f"{x:.15g}" for x in theta) + "\n")
