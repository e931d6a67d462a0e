"""Profiling utilities (replaces `lab4d/utils/profile_utils.py`).

The reference wraps a training round in torch.profiler and writes per-round
Chrome traces gated by `--profile` (`profile_utils.py:113-161`,
`trainer.py:304-306`). The TPU equivalent: `jax.profiler.trace` writing
TensorBoard-compatible traces per round, plus named annotation scopes.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def round_trace(logdir: str, round_idx: int, enabled: bool = True):
    """Trace one training round to `<logdir>/traces/round_NNN/`."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(logdir, "traces", f"round_{round_idx:03d}")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named scope visible in profiler traces (replaces `record_function`)."""
    return jax.profiler.TraceAnnotation(name)
