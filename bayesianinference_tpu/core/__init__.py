from .linalg import inverse_matrix_block_inverse, matrix_block_inverse
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
from .transforms import BoxBijection, box_bijection

__all__ = [
    "inverse_matrix_block_inverse",
    "matrix_block_inverse",
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
    "BoxBijection",
    "box_bijection",
]
