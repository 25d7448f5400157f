from .parallel_ns import parallel_nested_sampling
from .sharding import Mesh, NamedSharding, P, make_mesh, replicated, shard_data

__all__ = [
    "parallel_nested_sampling",
    "Mesh",
    "NamedSharding",
    "P",
    "make_mesh",
    "replicated",
    "shard_data",
]
