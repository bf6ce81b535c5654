"""Profiling / tracing helpers (SURVEY.md §5).

The reference's only observability is wall-clock prints per iteration
(`gpsig/training.py:36-42`).  Here: jax.profiler trace capture around any
callable (viewable in XProf/TensorBoard), named annotation scopes for the
hot ops, and a simple on-device timing helper that respects this
environment's async-dispatch semantics.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    View with: ``tensorboard --logdir <log_dir>`` (Profile tab) or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace scope for the enclosed device computation, so the hot
    kernels show up with readable names in Xprof."""
    return jax.profiler.TraceAnnotation(name)


def device_time(fn, *args, reps: int = 1, **kwargs) -> float:
    """Wall time per call of a jitted function, with a scalar-reduction sync
    point (``block_until_ready`` alone does not synchronize through remote
    relays; see .claude/skills/verify/SKILL.md)."""
    out = fn(*args, **kwargs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0]))
