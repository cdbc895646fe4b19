"""The master quantification driver (rsem-calculate-expression equivalent).

One in-memory pipeline replaces the reference's Perl + per-stage executables +
temp-file choreography (rsem-calculate-expression:371-816):

  [align via external aligner if reads given] -> parse alignments -> model
  estimation -> EM -> results; optionally collapsed Gibbs (--calc-pme) and
  credibility intervals (--calc-ci).

Interop artifacts (.cnt/.model/.theta/.mparams/.ofg) are still written under
sample_name.stat/ and sample_name.temp/ so reference tooling (plots, EBSeq)
keeps working.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..constants import DEFAULT_SEED_LEN
from ..engine import EMConfig, run_em
from ..engine.em import write_theta_file
from ..engine.gibbs import GibbsConfig, run_gibbs
from ..engine.ci import CIConfig, run_ci
from ..parallel.distributed import maybe_initialize as _maybe_init_distributed
from ..io import parse_alignments
from ..io.results import (
    ALLELE_TITLE_PME,
    GENE_TITLE_CI,
    GENE_TITLE_PME,
    ISO_TITLE_CI,
    ISO_TITLE_PME,
    gene_level_values,
    transcript_level_values,
    within_gene_pct,
    write_allele_results,
    write_gene_results,
    write_isoform_results,
    write_transcript_results_allele,
)
from ..io.bam_writer import write_transcript_bam
from ..io.bamsort import sort_bam
from ..io.sam import finalize_cnt
from ..io.tbam2gbam import tbam2gbam
from ..model import GenerativeModel, ModelSpec
from ..refprep.reference import Reference
from ..refprep.transcripts import GroupInfo, Transcripts


def _production_mesh(n_chains: int):
    """Mesh for the posterior stages when >1 device is visible (the
    reference parallelizes Gibbs chains / CI samples across threads in
    production, Gibbs.cpp:207-254, calcCI.cpp:404-420). None on a single
    device or when the chain count does not tile the mesh."""
    import jax

    try:
        n_dev = len(jax.devices())
    except RuntimeError:
        return None
    if n_dev <= 1 or n_chains % n_dev:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(n_dev)


@dataclass
class ExpressionConfig:
    """Mirrors the reference CLI surface (rsem-calculate-expression:129-205)."""

    paired_end: bool = False
    no_qualities: bool = False
    strandedness: str = "none"  # none | forward | reverse
    seed: Optional[int] = None
    seed_length: int = DEFAULT_SEED_LEN
    # model
    fragment_length_min: int = 1
    fragment_length_max: int = 1000
    fragment_length_mean: float = -1.0
    fragment_length_sd: float = 0.0
    estimate_rspd: bool = False
    num_rspd_bins: int = 20
    # posterior
    calc_pme: bool = False
    calc_ci: bool = False
    gibbs_burnin: int = 200
    gibbs_number_of_samples: int = 1000
    gibbs_sampling_gap: int = 1
    ci_credibility_level: float = 0.95
    ci_number_of_samples_per_count_vector: int = 50
    single_cell_prior: bool = False
    gibbs_chains: int = 8
    # BAM output (rsem-calculate-expression:94-99,505-527,645-674)
    no_bam_output: bool = False
    sampling_for_bam: bool = False
    output_genome_bam: bool = False
    sort_bam_by_coordinate: bool = False
    sort_bam_by_read_name: bool = False
    # pRSEM (rsem-calculate-expression:115-126,182-194,743-811)
    run_prsem: bool = False
    chipseq_peak_file: str = ""
    partition_model: str = "pk"
    mappability_bedgraph_file: Optional[str] = None
    chipseq_target_read_files: str = ""  # comma-separated per replicate
    chipseq_control_read_files: str = ""
    chipseq_read_files_multi_targets: str = ""
    chipseq_bed_files_multi_targets: str = ""
    cap_stacked_chipseq_reads: bool = False
    n_max_stacked_chipseq_reads: int = 5
    chipseq_target_signals: str = ""  # pooled tagAlign for signal models
    chipseq_bowtie_index: str = ""  # genome bowtie index (default: ref name)
    chipseq_bowtie_path: str = ""
    # misc
    append_names: bool = False
    tag: str = "XM"
    keep_intermediate_files: bool = False
    quiet: bool = False
    # IO / observability (rsem-calculate-expression:102-103,139,147)
    fai: Optional[str] = None  # .fai for header-less SAM inputs
    record_time: bool = False  # --time -> sample_name.time
    temporary_folder: Optional[str] = None
    profile_dir: Optional[str] = None  # jax.profiler trace output
    aligning_seconds: float = 0.0  # filled by main() when it ran an aligner

    @property
    def read_type(self) -> int:
        return (2 if self.paired_end else 0) + (0 if self.no_qualities else 1)

    @property
    def probF(self) -> float:
        return {"none": 0.5, "forward": 1.0, "reverse": 0.0}[self.strandedness]


@dataclass
class ExpressionResult:
    em: object
    gibbs: Optional[object] = None
    ci: Optional[object] = None
    cnt: Optional[object] = None


def _pct(num: np.ndarray, denom: np.ndarray) -> np.ndarray:
    """num/denom*100 where denom >= EPSILON, else 0 (WriteResults.h:383+)."""
    out = np.zeros_like(np.asarray(num, dtype=np.float64))
    ok = denom >= 1e-300
    out[ok] = num[ok] / denom[ok] * 100.0
    return out


def _stage_seeds(seed: Optional[int]):
    if seed is None:
        return [None, None, None]
    rng = np.random.RandomState(seed)
    return [int(x) for x in rng.randint(0, 2**31, size=3)]


def calculate_expression(
    alignments: str,
    reference_name: str,
    sample_name: str,
    cfg: Optional[ExpressionConfig] = None,
) -> ExpressionResult:
    """alignments: SAM/BAM of transcript alignments (the --alignments path;
    external aligner execution is up to the caller / `main`)."""
    cfg = cfg or ExpressionConfig()
    _maybe_init_distributed()  # multi-host entry (env-triggered; no-op else)
    t_start = time.time()
    from ..utils.timing import StageTimer, maybe_profile

    timer = StageTimer()

    sample_token = os.path.basename(sample_name)
    temp_dir = cfg.temporary_folder or f"{sample_name}.temp"
    stat_dir = f"{sample_name}.stat"
    os.makedirs(temp_dir, exist_ok=True)
    os.makedirs(stat_dir, exist_ok=True)
    imd = os.path.join(temp_dir, sample_token)
    stat = os.path.join(stat_dir, sample_token)

    # ---- reference ----
    ref = Reference.load_seq(f"{reference_name}.seq")
    ts = Transcripts.read_ti(f"{reference_name}.ti")
    gi = GroupInfo.load(f"{reference_name}.grp")
    allele = os.path.exists(f"{reference_name}.gt") and os.path.exists(
        f"{reference_name}.ta"
    )
    ta = GroupInfo.load(f"{reference_name}.ta") if allele else None
    gt = GroupInfo.load(f"{reference_name}.gt") if allele else None

    names = [""] + [
        (t.seqname if ts.is_allele_specific else t.transcript_id)
        for t in ts.transcripts
    ]

    spec = ModelSpec(
        model_type=cfg.read_type,
        est_rspd=cfg.estimate_rspd,
        B=cfg.num_rspd_bins,
        minL=cfg.fragment_length_min,
        maxL=cfg.fragment_length_max,
        mate_minL=1,
        mate_maxL=cfg.fragment_length_max,
        mean=cfg.fragment_length_mean,
        sd=cfg.fragment_length_sd,
        probF=cfg.probF,
        seed_len=cfg.seed_length,
        has_polya=ref.has_polya,
    )
    spec.write_mparams(f"{imd}.mparams")

    # ---- optional input name-sort (rsem-calculate-expression:567-575) ----
    if cfg.sort_bam_by_read_name:
        sorted_inp = f"{imd}.sorted.bam"
        sort_bam(alignments, sorted_inp, by="name")
        alignments = sorted_inp

    # ---- parse alignments (rsem-parse-alignments) ----
    with timer.stage("parse-alignments"):
        bundle = parse_alignments(
            alignments, names, cfg.read_type, ref.has_polya, cfg.seed_length,
            filter_tag=cfg.tag, fai=cfg.fai,
        )
    sid2gid = np.concatenate([[0], gi.gids_of(np.arange(1, ts.M + 1))])
    finalize_cnt(bundle, sid2gid)
    bundle.cnt.write(f"{stat}.cnt")
    with open(f"{imd}.omit", "w") as f:
        for sid in bundle.omit:
            f.write(f"{sid}\n")

    if bundle.cnt.N1 == 0:
        raise RuntimeError("No alignable reads; nothing to estimate.")

    # ---- EM ----
    with timer.stage("em"), maybe_profile(cfg.profile_dir):
        model = GenerativeModel(spec, ref)
        model.estimate_from_stats(bundle.stats)
        em = run_em(model, ref, bundle, EMConfig(verbose=not cfg.quiet))

    model.write(f"{stat}.model")
    write_theta_file(f"{stat}.theta", em.theta_raw, em.theta)
    if cfg.keep_intermediate_files and em.log_conprb is not None:
        # stage-restart/interop surface (EM.cpp:435-457): final-model
        # conditional probabilities, consumable by rsem-run-gibbs
        from ..io.ofg import write_ofg

        write_ofg(f"{imd}.ofg", ref.M, bundle.cnt.N0, bundle.hits,
                  em.log_conprb, em.log_ncp)

    tlens = ts.lengths()
    gl = gene_level_values(gi, tlens, em.eel, em.counts, em.tpm, em.fpkm)
    tl = None
    if allele:
        tl = transcript_level_values(ta, tlens, em.eel, em.counts, em.tpm,
                                     em.fpkm)

    iso_extra = []
    gene_extra = []
    allele_extra = []

    # ---- Gibbs (--calc-pme / --calc-ci) ----
    seeds = _stage_seeds(cfg.seed)
    gres = None
    cires = None
    if cfg.calc_pme or cfg.calc_ci:
        gcfg = GibbsConfig(
            burnin=cfg.gibbs_burnin,
            nsamples=cfg.gibbs_number_of_samples,
            gap=cfg.gibbs_sampling_gap,
            n_chains=cfg.gibbs_chains,
            pseudo_count=0.1 if cfg.single_cell_prior else 1.0,
            seed=seeds[1] if seeds[1] is not None else 0,
            keep_countvectors=cfg.calc_ci or cfg.keep_intermediate_files,
        )
        mesh = _production_mesh(gcfg.n_chains)
        with timer.stage("gibbs"):
            gres = run_gibbs(
                bundle.hits, em.log_conprb, em.log_ncp, ref.M, bundle.cnt.N0,
                em.eel, model.mw, gi, gcfg, omit=bundle.omit, ta=ta,
                mesh=mesh,
            )
        if cfg.keep_intermediate_files and gres.countvectors is not None:
            from ..io.ofg import write_countvectors

            # Gibbs.cpp:255-262 (single file; the reference writes one per
            # thread and calcCI globs them — chains are merged here)
            write_countvectors(f"{imd}.countvectors", gres.countvectors)
        gene_pme_tpm = np.bincount(
            sid2gid[1:], weights=gres.pme_tpm[1:], minlength=gi.m
        )
        gene_pme_c = np.bincount(sid2gid[1:], weights=gres.pme_c[1:],
                                 minlength=gi.m)
        gene_pme_fpkm = np.bincount(
            sid2gid[1:], weights=gres.pme_fpkm[1:], minlength=gi.m
        )
        gene_extra.append(
            (
                GENE_TITLE_PME,
                np.stack(
                    [gene_pme_c, np.sqrt(gres.pve_c_genes), gene_pme_tpm,
                     gene_pme_fpkm]
                ),
            )
        )
        if not allele:
            isopct_pme = _pct(gres.pme_tpm[1:], gene_pme_tpm[sid2gid[1:]])
            iso_extra.append(
                (
                    ISO_TITLE_PME,
                    np.stack(
                        [gres.pme_c, np.sqrt(gres.pve_c), gres.pme_tpm,
                         gres.pme_fpkm,
                         np.concatenate([[0.0], isopct_pme])]
                    ),
                )
            )
        else:
            sid2tid = ta.gids_of(np.arange(1, ref.M + 1))
            trans_pme_tpm = np.bincount(
                sid2tid, weights=gres.pme_tpm[1:], minlength=ta.m
            )
            trans_pme_c = np.bincount(sid2tid, weights=gres.pme_c[1:],
                                      minlength=ta.m)
            trans_pme_fpkm = np.bincount(
                sid2tid, weights=gres.pme_fpkm[1:], minlength=ta.m
            )
            tid2gid = gt.gids_of(np.arange(ta.m))
            allele_iso_pme = _pct(gres.pme_tpm[1:], trans_pme_tpm[sid2tid])
            allele_gene_pme = _pct(gres.pme_tpm[1:], gene_pme_tpm[sid2gid[1:]])
            allele_extra.append(
                (
                    ALLELE_TITLE_PME,
                    np.stack(
                        [gres.pme_c, np.sqrt(gres.pve_c), gres.pme_tpm,
                         gres.pme_fpkm,
                         np.concatenate([[0.0], allele_iso_pme]),
                         np.concatenate([[0.0], allele_gene_pme])]
                    ),
                )
            )
            iso_extra.append(
                (
                    ISO_TITLE_PME,
                    np.stack(
                        [trans_pme_c, np.sqrt(gres.pve_c_trans),
                         trans_pme_tpm, trans_pme_fpkm,
                         _pct(trans_pme_tpm, gene_pme_tpm[tid2gid])]
                    ),
                )
            )

    # ---- credibility intervals (--calc-ci) ----
    if cfg.calc_ci:
        cicfg = CIConfig(
            confidence=cfg.ci_credibility_level,
            nspc=cfg.ci_number_of_samples_per_count_vector,
            pseudo_count=0.1 if cfg.single_cell_prior else 1.0,
            seed=seeds[2] if seeds[2] is not None else 0,
        )
        with timer.stage("ci"):
            cires = run_ci(gres.countvectors, em.eel, model.mw, gi, cicfg,
                           ta=ta, mesh=_production_mesh(len(gres.countvectors)))
        sid_ci = (
            ISO_TITLE_CI,
            np.stack(
                [cires.tpm.lb, cires.tpm.ub, cires.tpm.cqv,
                 cires.fpkm.lb, cires.fpkm.ub, cires.fpkm.cqv]
            ),
        )
        if allele:
            allele_extra.append(sid_ci)
            iso_extra.append(
                (
                    ISO_TITLE_CI,
                    np.stack(
                        [cires.iso_tpm.lb, cires.iso_tpm.ub, cires.iso_tpm.cqv,
                         cires.iso_fpkm.lb, cires.iso_fpkm.ub,
                         cires.iso_fpkm.cqv]
                    ),
                )
            )
        else:
            iso_extra.append(sid_ci)
        gene_extra.append(
            (
                GENE_TITLE_CI,
                np.stack(
                    [cires.gene_tpm.lb, cires.gene_tpm.ub, cires.gene_tpm.cqv,
                     cires.gene_fpkm.lb, cires.gene_fpkm.ub,
                     cires.gene_fpkm.cqv]
                ),
            )
        )

    # ---- final tables ----
    if allele:
        write_allele_results(
            f"{sample_name}.alleles.results", ts, tlens, em.eel, em.counts,
            em.tpm, em.fpkm, tl.isopct, gl.isopct, cfg.append_names,
            allele_extra,
        )
        iso_pct = within_gene_pct(gt, tl.tpm, gl.tpm)
        write_transcript_results_allele(
            f"{sample_name}.isoforms.results", ts, ta, gt, tl, iso_pct,
            cfg.append_names, iso_extra,
        )
    else:
        write_isoform_results(
            f"{sample_name}.isoforms.results", ts, tlens, em.eel, em.counts,
            em.tpm, em.fpkm, gl.isopct, cfg.append_names, iso_extra,
        )
    write_gene_results(
        f"{sample_name}.genes.results", ts, gi, gl, cfg.append_names, gene_extra
    )

    # ---- pRSEM: ChIP-seq-informed prior + Gibbs rerun ----
    # (rsem-calculate-expression:743-811; pRSEM/prsem-calculate-expression)
    if cfg.run_prsem:
        if allele:
            raise ValueError("pRSEM is not supported in allele mode")
        if gres is None:
            raise ValueError(
                "--run-pRSEM requires --calc-pme (pRSEM learns its prior "
                "from posterior mean counts)"
            )
        if not (cfg.chipseq_peak_file or cfg.chipseq_target_read_files
                or cfg.chipseq_read_files_multi_targets
                or cfg.chipseq_bed_files_multi_targets):
            raise ValueError(
                "--run-pRSEM requires --chipseq-peak-file, "
                "--chipseq-target-read-files (+ --chipseq-control-read-"
                "files), or --chipseq-{read,bed}-files-multi-targets"
            )
        from ..prsem import PrsemConfig, learn_prior

        def _split(s):
            return [x for x in s.split(":") if x] if s else []

        pres = learn_prior(
            ts,
            gres.pme_c[1:],
            PrsemConfig(
                chipseq_peak_file=cfg.chipseq_peak_file,
                partition_model=cfg.partition_model,
                mappability_file=cfg.mappability_bedgraph_file,
                chipseq_target_read_files=_split(
                    cfg.chipseq_target_read_files),
                chipseq_control_read_files=_split(
                    cfg.chipseq_control_read_files),
                chipseq_read_files_multi_targets=_split(
                    cfg.chipseq_read_files_multi_targets),
                chipseq_bed_files_multi_targets=_split(
                    cfg.chipseq_bed_files_multi_targets),
                cap_stacked_chipseq_reads=cfg.cap_stacked_chipseq_reads,
                n_max_stacked_chipseq_reads=cfg.n_max_stacked_chipseq_reads,
                chipseq_target_signals=cfg.chipseq_target_signals,
                bowtie_index=cfg.chipseq_bowtie_index or reference_name,
                bowtie_path=cfg.chipseq_bowtie_path,
                temp_dir=os.path.dirname(imd) or ".",
            ),
            imd_name=imd,
            stat_name=stat,
            ref=ref,
            efflen=em.eel[1:],
            pme_tpm=gres.pme_tpm[1:],
            log=(lambda *a: None) if cfg.quiet else print,
        )
        if pres.informative:
            # uniform-prior tables become the *_uniform_prior_1 artifacts
            os.replace(f"{sample_name}.isoforms.results",
                       f"{stat}_uniform_prior_1.isoforms.results")
            os.replace(f"{sample_name}.genes.results",
                       f"{stat}_uniform_prior_1.genes.results")
            pgres = run_gibbs(
                bundle.hits, em.log_conprb, em.log_ncp, ref.M,
                bundle.cnt.N0, em.eel, model.mw, gi, gcfg,
                omit=bundle.omit, ta=None, prior=pres.prior,
                mesh=_production_mesh(gcfg.n_chains),
            )
            g_pme_tpm = np.bincount(sid2gid[1:], weights=pgres.pme_tpm[1:],
                                    minlength=gi.m)
            g_pme_c = np.bincount(sid2gid[1:], weights=pgres.pme_c[1:],
                                  minlength=gi.m)
            g_pme_fpkm = np.bincount(sid2gid[1:], weights=pgres.pme_fpkm[1:],
                                     minlength=gi.m)
            isopct_p = _pct(pgres.pme_tpm[1:], g_pme_tpm[sid2gid[1:]])
            # pRSEM results: EM columns + prior-informed PME columns only
            # (collectResults over head-8/tail-5 of iso_res,
            #  rsem-calculate-expression:789-796)
            write_isoform_results(
                f"{sample_name}.isoforms.results", ts, tlens, em.eel,
                em.counts, em.tpm, em.fpkm, gl.isopct, cfg.append_names,
                [(ISO_TITLE_PME,
                  np.stack([pgres.pme_c, np.sqrt(pgres.pve_c),
                            pgres.pme_tpm, pgres.pme_fpkm,
                            np.concatenate([[0.0], isopct_p])]))],
            )
            write_gene_results(
                f"{sample_name}.genes.results", ts, gi, gl,
                cfg.append_names,
                [(GENE_TITLE_PME,
                  np.stack([g_pme_c, np.sqrt(pgres.pve_c_genes),
                            g_pme_tpm, g_pme_fpkm]))],
            )
            gres = pgres

    # ---- posterior-weighted BAM output ----
    if not cfg.no_bam_output:
        timer._open["bam-output"] = time.perf_counter()
        bam_path = f"{sample_name}.transcript.bam"
        write_transcript_bam(
            alignments, bam_path, bundle.hits, em.frac_hit, em.frac_noise,
            paired=cfg.paired_end, sampling=cfg.sampling_for_bam,
            seed=seeds[0], command=None,
        )
        genome_bam = None
        if cfg.output_genome_bam:
            genome_bam = f"{sample_name}.genome.bam"
            tbam2gbam(reference_name, bam_path, genome_bam)
        if cfg.sort_bam_by_coordinate:
            sort_bam(bam_path, f"{sample_name}.transcript.sorted.bam",
                     by="coordinate", build_index=True)
            if genome_bam:
                sort_bam(genome_bam, f"{sample_name}.genome.sorted.bam",
                         by="coordinate", build_index=True)
        timer.add("bam-output",
                  time.perf_counter() - timer._open.pop("bam-output"))

    if not cfg.keep_intermediate_files and cfg.temporary_folder is None:
        shutil.rmtree(temp_dir, ignore_errors=True)

    if cfg.record_time:
        timer.write_time_file(f"{sample_name}.time",
                              aligning=cfg.aligning_seconds)
    if not cfg.quiet:
        try:
            import jax

            n_chips = len(jax.devices())
        except Exception:
            n_chips = 1
        print(
            f"calculate_expression finished in {time.time() - t_start:.1f}s "
            f"({em.rounds} EM rounds). Stage breakdown:"
        )
        timer.report(log=print, n_reads=bundle.cnt.n_tot, n_chips=n_chips)
    return ExpressionResult(em=em, gibbs=gres, ci=cires, cnt=bundle.cnt)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rsem-tpu-calculate-expression",
        description="Estimate expression from RNA-Seq reads (running an "
        "external aligner) or from transcript alignments (SAM/BAM).",
    )
    p.add_argument(
        "inputs", nargs="+",
        help="upstream_read_file(s) [downstream_read_file(s)] "
        "reference_name sample_name; with --alignments: input "
        "reference_name sample_name (read-file lists are comma-separated)",
    )
    # deprecated aliases kept for reference-CLI parity
    # (rsem-calculate-expression:139-141: --sam / --bam imply --alignments)
    p.add_argument("--sam", action="store_true",
                   help="deprecated alias: input is SAM (implies "
                   "--alignments)")
    p.add_argument("--bam", action="store_true",
                   help="deprecated alias: input is BAM (implies "
                   "--alignments)")
    p.add_argument("--alignments", nargs="?", const=True, default=None,
                   metavar="SAM/BAM",
                   help="input is SAM/BAM aligned to the transcript "
                   "reference (skip the aligner step)")
    # aligner selection + knobs (rsem-calculate-expression:33-67,391-565)
    p.add_argument("--bowtie", dest="use_bowtie", action="store_true")
    p.add_argument("--bowtie2", action="store_true")
    p.add_argument("--star", action="store_true")
    p.add_argument("--hisat2-hca", action="store_true")
    p.add_argument("--bowtie-path", default="")
    p.add_argument("--bowtie2-path", default="")
    p.add_argument("--star-path", default="")
    p.add_argument("--hisat2-path", default="")
    p.add_argument("--bowtie-n", type=int, default=2)
    p.add_argument("--bowtie-e", type=int, default=99999999)
    p.add_argument("--bowtie-m", type=int, default=200)
    p.add_argument("--bowtie-chunkmbs", type=int, default=0)
    p.add_argument("--bowtie2-mismatch-rate", type=float, default=0.1)
    p.add_argument("--bowtie2-k", type=int, default=200)
    p.add_argument("--bowtie2-sensitivity-level", default="sensitive",
                   choices=["very_fast", "fast", "sensitive",
                            "very_sensitive"])
    p.add_argument("--star-gzipped-read-file", action="store_true")
    p.add_argument("--star-bzipped-read-file", action="store_true")
    p.add_argument("--phred33-quals", action="store_true", default=True)
    p.add_argument("--phred64-quals", action="store_true", default=False)
    p.add_argument("--solexa-quals", action="store_true", default=False)
    p.add_argument("-p", "--num-threads", type=int, default=1)
    p.add_argument("--paired-end", action="store_true")
    p.add_argument("--no-qualities", action="store_true")
    p.add_argument("--strandedness", choices=["none", "forward", "reverse"],
                   default="none")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--seed-length", type=int, default=DEFAULT_SEED_LEN)
    p.add_argument("--fragment-length-min", type=int, default=1)
    p.add_argument("--fragment-length-max", type=int, default=1000)
    p.add_argument("--fragment-length-mean", type=float, default=-1.0)
    p.add_argument("--fragment-length-sd", type=float, default=0.0)
    p.add_argument("--estimate-rspd", action="store_true")
    p.add_argument("--num-rspd-bins", type=int, default=20)
    p.add_argument("--calc-pme", action="store_true")
    p.add_argument("--calc-ci", action="store_true")
    p.add_argument("--gibbs-burnin", type=int, default=200)
    p.add_argument("--gibbs-number-of-samples", type=int, default=1000)
    p.add_argument("--gibbs-sampling-gap", type=int, default=1)
    # TPU-native knob (no reference equivalent): vmapped/sharded chain count
    p.add_argument("--gibbs-chains", type=int, default=8)
    p.add_argument("--ci-credibility-level", type=float, default=0.95)
    p.add_argument("--ci-number-of-samples-per-count-vector", type=int,
                   default=50)
    p.add_argument("--single-cell-prior", action="store_true")
    p.add_argument("--no-bam-output", action="store_true")
    p.add_argument("--sampling-for-bam", action="store_true")
    p.add_argument("--output-genome-bam", action="store_true")
    p.add_argument("--sort-bam-by-coordinate", action="store_true")
    p.add_argument("--sort-bam-by-read-name", action="store_true")
    p.add_argument("--run-pRSEM", dest="run_prsem", action="store_true")
    p.add_argument("--chipseq-peak-file", default="")
    p.add_argument("--partition-model", default="pk")
    p.add_argument("--mappability-bedgraph-file", default=None)
    # ChIP-seq leg: colon-separated replicates, commas within a replicate
    # (rsem-calculate-expression:116-126,183-192)
    p.add_argument("--chipseq-target-read-files", default="")
    p.add_argument("--chipseq-control-read-files", default="")
    p.add_argument("--chipseq-read-files-multi-targets", default="")
    p.add_argument("--chipseq-bed-files-multi-targets", default="")
    p.add_argument("--cap-stacked-chipseq-reads", action="store_true")
    p.add_argument("--n-max-stacked-chipseq-reads", type=int, default=5)
    p.add_argument("--chipseq-target-signals", default="",
                   help="pooled target tagAlign(.gz) for signal-based "
                   "partition models when supplying --chipseq-peak-file")
    p.add_argument("--chipseq-bowtie-index", default="")
    p.add_argument("--chipseq-bowtie-path", default="")
    p.add_argument("--append-names", action="store_true")
    p.add_argument("--tag", default="XM")
    p.add_argument("--keep-intermediate-files", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true")
    # IO / observability (rsem-calculate-expression:102-103,139,147)
    p.add_argument("--fai", default=None,
                   help=".fai giving target names/lengths for SAM inputs "
                   "without @SQ header lines")
    p.add_argument("--time", dest="record_time", action="store_true",
                   help="write per-stage wall-clock to sample_name.time")
    p.add_argument("--temporary-folder", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the EM stage here")
    return p


def _resolve_inputs(args):
    """Split the positional inputs into (alignment_file_or_None, read_lists,
    reference_name, sample_name) following the reference's 3/4-positional
    convention (rsem-calculate-expression:337-348)."""
    pos = list(args.inputs)
    if args.alignments is None and (args.sam or args.bam):
        args.alignments = True  # deprecated aliases imply --alignments
    if args.alignments is not None:
        if isinstance(args.alignments, str):
            if len(pos) != 2:
                raise SystemExit(
                    "with --alignments <file>: reference_name sample_name")
            return args.alignments, None, pos[0], pos[1]
        if len(pos) != 3:
            raise SystemExit(
                "with --alignments: input reference_name sample_name")
        return pos[0], None, pos[1], pos[2]
    if args.paired_end:
        if len(pos) != 4:
            raise SystemExit(
                "paired-end: upstream_read_file(s) downstream_read_file(s) "
                "reference_name sample_name")
        return None, (pos[0], pos[1]), pos[2], pos[3]
    if len(pos) != 3:
        raise SystemExit(
            "single-end: upstream_read_file(s) reference_name sample_name")
    return None, (pos[0], None), pos[1], pos[2]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    input_file, read_lists, reference_name, sample_name = _resolve_inputs(args)
    cfg = ExpressionConfig(
        paired_end=args.paired_end,
        no_qualities=args.no_qualities,
        strandedness=args.strandedness,
        seed=args.seed,
        seed_length=args.seed_length,
        fragment_length_min=args.fragment_length_min,
        fragment_length_max=args.fragment_length_max,
        fragment_length_mean=args.fragment_length_mean,
        fragment_length_sd=args.fragment_length_sd,
        estimate_rspd=args.estimate_rspd,
        num_rspd_bins=args.num_rspd_bins,
        calc_pme=args.calc_pme,
        calc_ci=args.calc_ci,
        gibbs_burnin=args.gibbs_burnin,
        gibbs_number_of_samples=args.gibbs_number_of_samples,
        gibbs_chains=args.gibbs_chains,
        gibbs_sampling_gap=args.gibbs_sampling_gap,
        ci_credibility_level=args.ci_credibility_level,
        ci_number_of_samples_per_count_vector=(
            args.ci_number_of_samples_per_count_vector
        ),
        single_cell_prior=args.single_cell_prior,
        no_bam_output=args.no_bam_output,
        sampling_for_bam=args.sampling_for_bam,
        output_genome_bam=args.output_genome_bam,
        sort_bam_by_coordinate=args.sort_bam_by_coordinate,
        sort_bam_by_read_name=args.sort_bam_by_read_name,
        run_prsem=args.run_prsem,
        chipseq_peak_file=args.chipseq_peak_file,
        partition_model=args.partition_model,
        mappability_bedgraph_file=args.mappability_bedgraph_file,
        chipseq_target_read_files=args.chipseq_target_read_files,
        chipseq_control_read_files=args.chipseq_control_read_files,
        chipseq_read_files_multi_targets=args.chipseq_read_files_multi_targets,
        chipseq_bed_files_multi_targets=args.chipseq_bed_files_multi_targets,
        cap_stacked_chipseq_reads=args.cap_stacked_chipseq_reads,
        n_max_stacked_chipseq_reads=args.n_max_stacked_chipseq_reads,
        chipseq_target_signals=args.chipseq_target_signals,
        chipseq_bowtie_index=args.chipseq_bowtie_index,
        chipseq_bowtie_path=args.chipseq_bowtie_path,
        append_names=args.append_names,
        tag=args.tag,
        keep_intermediate_files=args.keep_intermediate_files,
        fai=args.fai,
        record_time=args.record_time,
        temporary_folder=args.temporary_folder,
        profile_dir=args.profile_dir,
        quiet=args.quiet,
    )

    if input_file is None:
        # run the external aligner (rsem-calculate-expression:391-565)
        from .aligners import AlignerConfig, run_alignment

        aligner = "bowtie"
        if args.bowtie2:
            aligner = "bowtie2"
        elif args.star:
            aligner = "star"
        elif args.hisat2_hca:
            aligner = "hisat2-hca"
        acfg = AlignerConfig(
            aligner=aligner,
            n_threads=args.num_threads,
            no_qualities=args.no_qualities,
            phred33=not (args.phred64_quals or args.solexa_quals),
            phred64=args.phred64_quals,
            solexa=args.solexa_quals,
            probF=cfg.probF,
            quiet=args.quiet,
            bowtie_path=args.bowtie_path,
            bowtie_n=args.bowtie_n,
            bowtie_e=args.bowtie_e,
            bowtie_m=args.bowtie_m,
            bowtie_chunkmbs=args.bowtie_chunkmbs,
            seed_length=args.seed_length,
            bowtie2_path=args.bowtie2_path,
            bowtie2_mismatch_rate=args.bowtie2_mismatch_rate,
            bowtie2_k=args.bowtie2_k,
            bowtie2_sensitivity_level=args.bowtie2_sensitivity_level,
            fragment_length_min=args.fragment_length_min,
            fragment_length_max=args.fragment_length_max,
            star_path=args.star_path,
            star_gzipped_read_file=args.star_gzipped_read_file,
            star_bzipped_read_file=args.star_bzipped_read_file,
            hisat2_path=args.hisat2_path,
        )
        temp_dir = args.temporary_folder or f"{sample_name}.temp"
        os.makedirs(temp_dir, exist_ok=True)
        imd = os.path.join(temp_dir, os.path.basename(sample_name))
        t_align = time.time()
        input_file = run_alignment(
            acfg, reference_name, sample_name, imd,
            read_lists[0], read_lists[1],
            log=(lambda *a: None) if args.quiet else print,
        )
        cfg.aligning_seconds = time.time() - t_align

    calculate_expression(input_file, reference_name, sample_name, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
