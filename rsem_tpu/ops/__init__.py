from .layout import RefDevice, ReadsDevice, HitsDevice, KernelConfig, pad_to
from .conprb import compute_log_conprb, compute_log_noise_conprb
from .estep import em_step, estep_fracs, suffstats

__all__ = [
    "RefDevice",
    "ReadsDevice",
    "HitsDevice",
    "KernelConfig",
    "pad_to",
    "compute_log_conprb",
    "compute_log_noise_conprb",
    "em_step",
    "estep_fracs",
    "suffstats",
]
