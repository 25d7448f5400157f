from .config import EvidenceOptions, MCMCOptions, NestedSamplingOptions
from .graph import ModelGraph, dependency_data, model_graph
from .validation import check_traceable, distribution_dimension

__all__ = [
    "EvidenceOptions",
    "MCMCOptions",
    "NestedSamplingOptions",
    "ModelGraph",
    "dependency_data",
    "model_graph",
    "check_traceable",
    "distribution_dimension",
]
