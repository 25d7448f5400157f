"""Profiling helpers.

The reference has no profiling (SURVEY §5); the TPU-native story is XLA
traces via ``jax.profiler``.  These are thin wrappers so engine runs can
be traced with one line.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bayesianinference_tpu_trace"):
    """Capture an XLA/device trace viewable in TensorBoard / Perfetto:

        with profiling.trace("/tmp/tr"):
            nested_sampling(problem, key, ...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sync=None):
    """Wall-clock a block, forcing device completion on exit via a host
    fetch of ``sync`` (see PERFORMANCE.md on why block_until_ready is not
    sufficient through remote-device tunnels)."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        target = box.get("sync", sync)
        if target is not None:
            jax.tree_util.tree_map(
                lambda a: float(jax.numpy.ravel(a)[0]), target
            )
        box["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[timed] {label}: {box['seconds']:.4f}s")
