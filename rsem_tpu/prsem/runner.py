"""pRSEM orchestration: learn a TSS-peak prior from a quantified sample
(pRSEM/prsem-calculate-expression flow for --partition-model pk with
--chipseq-peak-file; Prsem.py buildTrainingSet + genPriorByTSSPeak).

`learn_prior` produces the [M+1] pseudo-count vector and writes the
reference's artifact set (`*_prsem.all_tr_features`, `*_prsem.all_tr_prior`,
`*_prsem.pval_LL`, `*_prsem.training_tr_crd`); the calculate-expression
driver then reruns Gibbs with it. `run_testing_procedure` is the
rsem-run-prsem-testing-procedure equivalent: everything up to the
informativeness test, no Gibbs."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from .coords import Mappability, build_coords
from .features import read_peaks, tss_peak_flags
from .prior import (
    INFORMATIVE_DATA_MAX_P_VALUE,
    fit_partitioned_dm,
    informative_pvalue,
    write_prior_file,
)
from .training import (
    FLANKING_WIDTH,
    TRAINING_GENE_MIN_LEN,
    TRAINING_MIN_MAPPABILITY,
    select_training_set,
)


@dataclass
class PrsemConfig:
    chipseq_peak_file: str = ""
    partition_model: str = "pk"
    mappability_file: Optional[str] = None  # bedGraph(.gz)
    flanking_width: int = FLANKING_WIDTH
    min_mappability: float = TRAINING_MIN_MAPPABILITY
    min_gene_len: int = TRAINING_GENE_MIN_LEN
    max_pvalue: float = INFORMATIVE_DATA_MAX_P_VALUE


@dataclass
class PrsemResult:
    prior: np.ndarray  # [M+1] pseudo-counts, index 0 (noise) = 0
    alpha: np.ndarray  # per-partition concentrations [no-peak, peak]
    pvalue: float
    loglikelihood: float
    informative: bool
    tss_pk: np.ndarray  # [M]
    is_training: np.ndarray  # [M]


class UninformativeDataError(RuntimeError):
    pass


def _write_features(path: str, coords, pme_count, tss_pk, is_training):
    with open(path, "w") as f:
        f.write("geneid\ttrid\tchrom\tstrand\tstart\tend\ttss\t"
                "tss_mpp\tbody_mpp\ttes_mpp\tpme_count\ttss_pk\t"
                "is_training\n")
        for i, c in enumerate(coords):
            def _m(x):
                return "NA" if np.isnan(x) else f"{x:5.3f}"
            f.write(
                f"{c.gene_id}\t{c.trid}\t{c.chrom}\t{c.strand}\t"
                f"{c.start}\t{c.end}\t{c.tss}\t{_m(c.tss_mpp)}\t"
                f"{_m(c.body_mpp)}\t{_m(c.tes_mpp)}\t{pme_count[i]:.2f}\t"
                f"{tss_pk[i]}\t{is_training[i]}\n"
            )


def _write_training(path: str, coords, idxs):
    with open(path, "w") as f:
        f.write("geneid\ttrid\tchrom\tstrand\tstart\tend\t"
                "tss_mpp\tbody_mpp\ttes_mpp\n")
        for i in idxs:
            c = coords[i]
            f.write(
                f"{c.gene_id}\t{c.trid}\t{c.chrom}\t{c.strand}\t"
                f"{c.start}\t{c.end}\t{c.tss_mpp:5.3f}\t{c.body_mpp:5.3f}\t"
                f"{c.tes_mpp:5.3f}\n"
            )


def learn_prior(
    ts,
    pme_count: np.ndarray,
    cfg: PrsemConfig,
    imd_name: Optional[str] = None,
    stat_name: Optional[str] = None,
    log=print,
) -> PrsemResult:
    """ts: refprep.Transcripts (genome mode); pme_count: [M] posterior mean
    counts in .ti order (isoforms.results posterior_mean_count column)."""
    if cfg.partition_model != "pk":
        raise ValueError(
            f"partition model {cfg.partition_model!r} is not supported; "
            "only 'pk' (TSS peak) is implemented"
        )
    coords = build_coords(ts)
    M = len(coords)
    pme_count = np.asarray(pme_count, dtype=np.float64)
    assert len(pme_count) == M

    mpp = Mappability(cfg.mappability_file)
    train_idx = select_training_set(
        coords, mpp, min_gene_len=cfg.min_gene_len,
        min_mpp=cfg.min_mappability, flanking_width=cfg.flanking_width,
    )
    if not train_idx:
        raise RuntimeError("pRSEM training set is empty")

    peaks = read_peaks(cfg.chipseq_peak_file)
    tss_pk = tss_peak_flags(coords, peaks, cfg.flanking_width)
    is_training = np.zeros(M, dtype=np.int64)
    is_training[train_idx] = 1

    trn = np.asarray(train_idx, dtype=np.int64)
    trn_part = tss_pk[trn]  # 0 = no peak, 1 = peak
    n_parts = 2
    alpha, logl = fit_partitioned_dm(pme_count[trn], trn_part, n_parts)

    pval = informative_pvalue(
        pme_count[trn][trn_part == 1], pme_count[trn][trn_part == 0]
    )

    priors = alpha[tss_pk]  # per-isoform pseudo-count from its partition
    prior_full = np.concatenate([[0.0], priors])

    if imd_name:
        _write_training(f"{imd_name}_prsem.training_tr_crd", coords,
                        train_idx)
        _write_features(f"{imd_name}_prsem.all_tr_features", coords,
                        pme_count, tss_pk, is_training)
        write_prior_file(f"{imd_name}_prsem.all_tr_prior", priors,
                         [c.trid for c in coords])
    if stat_name:
        with open(f"{stat_name}_prsem.pval_LL", "w") as f:
            f.write("pvalue\tloglikelihood\n")
            f.write(f"{pval:.10g}\t{logl:.10g}\n")

    informative = pval <= cfg.max_pvalue
    if not informative:
        log(
            "Warning: external data is NOT informative for RNA-seq "
            f"quantification (p-value {pval:.10e} > {cfg.max_pvalue:.3f})"
        )
    return PrsemResult(
        prior=prior_full, alpha=alpha, pvalue=pval, loglikelihood=logl,
        informative=informative, tss_pk=tss_pk, is_training=is_training,
    )


def run_testing_procedure(
    ts,
    pme_count: np.ndarray,
    cfg: PrsemConfig,
    imd_name: Optional[str] = None,
    stat_name: Optional[str] = None,
    log=print,
) -> PrsemResult:
    """rsem-run-prsem-testing-procedure: report the informativeness p-value
    and the DM log-likelihood without rerunning Gibbs."""
    res = learn_prior(ts, pme_count, cfg, imd_name=imd_name,
                      stat_name=stat_name, log=log)
    log(f"p-value\t{res.pvalue:.10g}")
    log(f"log-likelihood\t{res.loglikelihood:.10g}")
    return res
