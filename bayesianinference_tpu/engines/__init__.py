from .evidence import MeanAndError, NestedSamplingResult, combine_runs, evidence_sampling
from .mcmc import MCMCChain, create_mcmc_chain, iterate_mcmc
from .nested_sampling import (
    NSState,
    generate_starting_points,
    nested_sampling,
    nested_sampling_loop,
)

__all__ = [
    "MeanAndError",
    "NestedSamplingResult",
    "combine_runs",
    "evidence_sampling",
    "MCMCChain",
    "create_mcmc_chain",
    "iterate_mcmc",
    "NSState",
    "generate_starting_points",
    "nested_sampling",
    "nested_sampling_loop",
]
