"""Host-side parallel map over devices/processes.

Replaces `lab4d/utils/gpu_utils.py` gpu_map (the Stage-1 process farm) and
`scripts/run_rendering_parallel.py`. On TPU the preprocessing math itself is
batched XLA (see vidu4d_tpu.preprocess), so the farm degenerates to a
work-splitting helper: in multi-host runs each host takes its
`jax.process_index()` slice; single-host runs can use thread/process pools
for IO-bound work (video decode, npy writing).
"""

from __future__ import annotations

import concurrent.futures
import multiprocessing as mp
from typing import Callable, List, Sequence


def host_slice(items: Sequence, process_index: int = None,
               process_count: int = None) -> List:
    """The current host's shard of a work list (SURVEY §2.2: DistributedSampler
    becomes per-host slicing of the index space)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def host_map(func: Callable, args_list: Sequence, method: str = "thread",
             max_workers: int = 8) -> List:
    """Parallel map for IO-bound per-video work (`gpu_utils.py:6-128`).

    method: "thread" (default; JAX-safe), "process" (spawn; for pure-python
    CPU work), or "sequential".
    """
    if method == "sequential" or len(args_list) <= 1:
        return [func(*a) if isinstance(a, tuple) else func(a) for a in args_list]
    if method == "process":
        ctx = mp.get_context("spawn")
        with concurrent.futures.ProcessPoolExecutor(
            max_workers=max_workers, mp_context=ctx
        ) as pool:
            futs = [
                pool.submit(func, *a) if isinstance(a, tuple) else pool.submit(func, a)
                for a in args_list
            ]
            return [f.result() for f in futs]
    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [
            pool.submit(func, *a) if isinstance(a, tuple) else pool.submit(func, a)
            for a in args_list
        ]
        return [f.result() for f in futs]
