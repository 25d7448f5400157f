from .checkpoint import (
    load_ns_run,
    load_result,
    resume_nested_sampling_loop,
    save_ns_run,
    save_result,
)
from .conjugate import (
    BLRParameters,
    BLRResult,
    ConjugateModelResult,
    bayesian_linear_regression,
    design_matrix,
    categorical_conjugate_model,
    categorical_conjugate_model_from_counts,
    multinormal_conjugate_model,
    normal_conjugate_model,
    polynomial_basis,
    update_conjugate_model,
)
from .direct import DirectPosterior, direct_posterior_distribution, gauss_legendre_grid
from .gp import (
    GPModel,
    coordinate_bounds_grid,
    define_gaussian_process,
    predict_from_gaussian_process,
)
from .sparse_gp import (
    SGPRModel,
    define_sparse_gaussian_process,
    select_inducing_points,
)
from .evidence import (
    MeanAndError,
    NestedSamplingResult,
    combine_runs,
    evidence_sampling,
    log_bayes_factor,
)
from .laplace import (
    LaplaceFit,
    fit_precision_at_max,
    approximate_evidence,
    approximate_evidence_hyper,
    find_mode,
    laplace_log_evidence,
    laplace_posterior_fit,
    mackay_update_1,
    mackay_update_2,
)
from .mcmc import MCMCChain, create_mcmc_chain, iterate_mcmc
from .smc import SMCConfig, SMCResult, smc_log_evidence, smc_sampler
from .hmc import HMCResult, hmc_sample
from .bridge import BridgeResult, bridge_sampling_evidence
from .dynamic_ns import (
    NSSegment,
    dynamic_nested_sampling,
    merge_segments,
    merged_evidence_sampling,
    segment_from_run,
)
from .pathfinder import PathfinderResult, pathfinder_fit
from .vi import VIResult, advi_fit
from .nested_sampling import (
    NSState,
    generate_starting_points,
    nested_sampling,
    nested_sampling_loop,
)

__all__ = [
    "BLRParameters",
    "BLRResult",
    "ConjugateModelResult",
    "bayesian_linear_regression",
    "design_matrix",
    "categorical_conjugate_model",
    "categorical_conjugate_model_from_counts",
    "multinormal_conjugate_model",
    "normal_conjugate_model",
    "polynomial_basis",
    "update_conjugate_model",
    "LaplaceFit",
    "approximate_evidence",
    "approximate_evidence_hyper",
    "find_mode",
    "laplace_log_evidence",
    "laplace_posterior_fit",
    "mackay_update_1",
    "mackay_update_2",

    "fit_precision_at_max",
    "load_ns_run",
    "load_result",
    "save_result",
    "resume_nested_sampling_loop",
    "save_ns_run",
    "DirectPosterior",
    "direct_posterior_distribution",
    "gauss_legendre_grid",
    "GPModel",
    "SGPRModel",
    "define_sparse_gaussian_process",
    "select_inducing_points",
    "coordinate_bounds_grid",
    "define_gaussian_process",
    "predict_from_gaussian_process",
    "MeanAndError",
    "NestedSamplingResult",
    "combine_runs",
    "evidence_sampling",
    "log_bayes_factor",
    "MCMCChain",
    "create_mcmc_chain",
    "iterate_mcmc",
    "SMCConfig",
    "SMCResult",
    "smc_log_evidence",
    "smc_sampler",
    "HMCResult",
    "hmc_sample",
    "BridgeResult",
    "NSSegment",
    "dynamic_nested_sampling",
    "merge_segments",
    "merged_evidence_sampling",
    "segment_from_run",
    "bridge_sampling_evidence",
    "PathfinderResult",
    "pathfinder_fit",
    "VIResult",
    "advi_fit",
    "NSState",
    "generate_starting_points",
    "nested_sampling",
    "nested_sampling_loop",
]
