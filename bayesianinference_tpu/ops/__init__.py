from .metropolis import AMState, am_init, am_step, run_chain, run_chain_adaptive
from .ns_math import (
    crude_log_x_deleted,
    entropy_from_weights,
    log_trapezoid_weights,
    log_x_live_tail,
    pool_schedule,
)

__all__ = [
    "AMState",
    "am_init",
    "am_step",
    "run_chain",
    "run_chain_adaptive",
    "crude_log_x_deleted",
    "entropy_from_weights",
    "log_trapezoid_weights",
    "log_x_live_tail",
    "pool_schedule",
]
