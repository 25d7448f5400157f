"""Typed option bundles with the reference's defaults.

The reference threads WL ``Options``/``OptionValue`` with inheritance
(BayesianStatistics.wl:833-855, LaplaceApproximation.wl:161-173,
``passOptionsDown``, BayesianUtilities.wl:158-176).  Here the same defaults
live in frozen dataclasses that can be passed down engines explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

__all__ = ["NestedSamplingOptions", "EvidenceOptions", "MCMCOptions"]


@dataclasses.dataclass(frozen=True)
class EvidenceOptions:
    """``Options[evidenceSampling]`` (BS:833-836)."""

    post_process_sampling_runs: Optional[int] = 100
    empirical_posterior_distribution_type: str = "Simple"


@dataclasses.dataclass(frozen=True)
class NestedSamplingOptions(EvidenceOptions):
    """``Options[nestedSampling]`` (BS:837-851) + the TPU batching knob."""

    sample_pool_size: int = 100
    max_iterations: int = 10000
    min_iterations: int = 100
    monte_carlo_steps: Union[int, Tuple[int, int, int]] = 200
    termination_fraction: float = 0.01
    min_max_acceptance_rate: Tuple[float, float] = (0.0, 1.0)
    log_likelihood_maximum: Optional[float] = None
    num_delete: int = 1  # TPU extension: chains per iteration

    def loop_kwargs(self) -> dict:
        return dict(
            max_iterations=self.max_iterations,
            min_iterations=self.min_iterations,
            monte_carlo_steps=self.monte_carlo_steps,
            termination_fraction=self.termination_fraction,
            num_delete=self.num_delete,
            min_max_acceptance_rate=self.min_max_acceptance_rate,
            log_likelihood_maximum=self.log_likelihood_maximum,
        )


@dataclasses.dataclass(frozen=True)
class MCMCOptions:
    """``Options[createMCMCChain]`` (BS:699-702) and
    ``Options[generateStartingPoints]`` (BS:1042-1045)."""

    initial_covariance: float = 1.0
    covariance_learn_delay: int = 20
    burn_in_period: int = 1000
    thinning: int = 1000
