"""pRSEM: ChIP-seq-informed priors for the Gibbs sampler.

Native reimplementation of the reference's pRSEM add-on (pRSEM/Prsem.py,
pRSEM/process-rnaseq.R, pRSEM/prsem-calculate-expression) for the default
`pk` partition model with a user-supplied peak file: partition isoforms by
TSS-peak status, fit a partitioned Dirichlet-multinomial to training-set
posterior mean counts, test informativeness (one-sided Wilcoxon), derive a
per-isoform prior, and rerun Gibbs with those pseudo-counts.
"""

from .coords import Mappability, TrCoord, build_coords
from .features import read_peaks, tss_peak_flags
from .prior import (
    dm_log_likelihood,
    fit_partitioned_dm,
    informative_pvalue,
    write_prior_file,
)
from .runner import PrsemConfig, learn_prior, run_testing_procedure
from .training import select_training_set

__all__ = [
    "Mappability",
    "TrCoord",
    "build_coords",
    "read_peaks",
    "tss_peak_flags",
    "dm_log_likelihood",
    "fit_partitioned_dm",
    "informative_pvalue",
    "write_prior_file",
    "PrsemConfig",
    "learn_prior",
    "run_testing_procedure",
    "select_training_set",
]
