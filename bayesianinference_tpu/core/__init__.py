from .containers import WeightedSamples, take_posterior_fraction
from .numerics import (
    guard_log_density,
    is_log_zero,
    log1mexp,
    log_zero,
    logaddexp,
    logmeanexp,
    logsubexp,
    logsumexp,
    safe_log,
    safe_sqrt,
    xlogx,
    xlogy,
)
from .standardize import NormalizedData, Standardizer, normalize_data, standardize

__all__ = [
    "WeightedSamples",
    "take_posterior_fraction",
    "guard_log_density",
    "is_log_zero",
    "log1mexp",
    "log_zero",
    "logaddexp",
    "logmeanexp",
    "logsubexp",
    "logsumexp",
    "safe_log",
    "safe_sqrt",
    "xlogx",
    "xlogy",
    "NormalizedData",
    "Standardizer",
    "normalize_data",
    "standardize",
]
