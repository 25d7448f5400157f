"""Function-quality checks.

Equivalent of ``checkCompiledFunction`` (BayesianUtilities.wl:358-364):
the reference warns when a compiled function silently falls back to the
slow ``MainEvaluate`` interpreter.  The JAX analogue is a function that
fails to trace (python side effects / host callbacks / dynamic shapes) —
``check_traceable`` verifies a density jits cleanly and reports what broke.
"""

from __future__ import annotations

import warnings
from typing import Callable

import jax

__all__ = ["check_traceable", "distribution_dimension"]


def check_traceable(fn: Callable, example_args, warn_only: bool = True) -> bool:
    """True if ``fn`` traces and lowers under jit on the example arguments.

    With ``warn_only`` a failure emits a warning (the reference's behaviour,
    BU:358-364 + BayesianStatistics.wl:300-303); otherwise it raises.
    """
    try:
        jax.jit(fn).lower(*example_args)
        return True
    except Exception as e:  # noqa: BLE001 — report any tracing failure
        msg = (
            f"function {getattr(fn, '__name__', fn)!r} is not jit-traceable "
            f"and will run on the slow host path: {type(e).__name__}: {e}"
        )
        if warn_only:
            warnings.warn(msg, stacklevel=2)
            return False
        raise TypeError(msg) from e


def distribution_dimension(dist) -> int:
    """Scalar-vs-vector domain size (``distributionDimension``,
    BU:374-383): 1 for scalar distributions, the event length otherwise."""
    es = getattr(dist, "event_shape", ())
    if es == ():
        return 1
    n = 1
    for s in es:
        n *= s
    return n
