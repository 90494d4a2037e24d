"""Profiling helpers: jax.profiler traces + phase timers.

The reference only has a wall-clock Timer (toolbox/timer.py:45-75); here we
expose XLA-level traces viewable in TensorBoard / Perfetto, the standard
TPU profiling workflow.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/prof'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


def block(tree):
    """Block until every leaf is ready (for timing)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
