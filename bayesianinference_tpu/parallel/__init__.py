from .multi_axis_ns import make_multi_axis_mesh, multi_axis_nested_sampling
from .parallel_dynamic_ns import parallel_dynamic_nested_sampling
from .parallel_ensemble import parallel_ensemble
from .parallel_hmc import parallel_hmc
from .parallel_ibis import parallel_ibis
from .parallel_ns import merge_runs, parallel_nested_sampling
from .parallel_smc import parallel_smc
from .sharded_chol import (
    sharded_cholesky,
    sharded_gp_logml_blocked,
    sharded_gp_predict,
)
from .sharded_conjugate import (
    sharded_bayesian_linear_regression,
    sharded_categorical_conjugate_model,
    sharded_multinormal_conjugate_model,
    sharded_normal_conjugate_model,
)
from .sharded_pool_ns import sharded_pool_nested_sampling
from .sharded_gp import sharded_covariance_matrix, sharded_gp_log_marginal_likelihood
from .sharding import Mesh, NamedSharding, P, make_mesh, replicated, shard_data

__all__ = [
    "sharded_bayesian_linear_regression",
    "sharded_categorical_conjugate_model",
    "sharded_cholesky",
    "sharded_covariance_matrix",
    "sharded_gp_logml_blocked",
    "sharded_gp_log_marginal_likelihood",
    "sharded_gp_predict",
    "sharded_multinormal_conjugate_model",
    "sharded_normal_conjugate_model",
    "parallel_dynamic_nested_sampling",
    "parallel_ensemble",
    "parallel_hmc",
    "parallel_ibis",
    "parallel_nested_sampling",
    "parallel_smc",
    "sharded_pool_nested_sampling",
    "multi_axis_nested_sampling",
    "make_multi_axis_mesh",
    "merge_runs",
    "Mesh",
    "NamedSharding",
    "P",
    "make_mesh",
    "replicated",
    "shard_data",
]
