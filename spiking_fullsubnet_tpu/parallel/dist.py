"""Multi-host coordination (replaces Accelerate's process utilities).

Feature-for-feature mapping from SURVEY.md §5h:
    accelerator.gather_for_metrics -> process_allgather of metric arrays
    accelerator.reduce(early_stop) -> scalar allreduce across processes
    wait_for_everyone              -> sync_global_devices barrier
    set_seed(device_specific=True) -> seed + process_index fold-in
    LR * sqrt(num_processes)       -> scale_lr
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None) -> None:
    """jax.distributed.initialize when running under a multi-process launcher.

    No-op in single-process mode (the common single-host case). Triggers on
    either JAX's own auto-init variables (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID — see the pod runbook in
    docs/concepts/parallelism.md) or an explicit coordinator argument;
    inside jax.distributed.initialize the TPU-pod topology is detected
    automatically when present."""
    if (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_NUM_PROCESSES")
        or os.environ.get("JAX_PROCESS_COUNT")  # legacy spelling
    ):
        jax.distributed.initialize(coordinator_address=coordinator_address)


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def device_specific_seed(seed: int) -> int:
    """Per-process seed (reference: set_seed(seed, device_specific=True))."""
    return int(seed) + jax.process_index()


def scale_lr(lr: float, world: Optional[int] = None) -> float:
    """LR x sqrt(world) rule (reference recipe run.py:31).

    The reference scales by the DDP worker count, which equals the DEVICE
    count (one process per GPU). Here one process can drive many chips with
    the batch sharded over the data axis, so world defaults to the GLOBAL
    device count — the data-parallel degree of the trainer's default
    Mesh('data') over all devices — not jax.process_count() (which would
    never scale the single-process multi-chip case). The TOML batch_size is
    therefore the GLOBAL batch (docs/concepts/parallelism.md)."""
    if world is None:
        world = jax.device_count()
    return lr * math.sqrt(world)


def wait_for_everyone(tag: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def broadcast_from_main(value) -> float:
    """Rank 0's scalar to every process (e.g. the validation north-star
    score, which only rank 0 computes — trainer.validate returns None on
    other ranks). Lets the early-stop/best-checkpoint bookkeeping run with
    IDENTICAL state on all ranks, so the collective Orbax save and the
    resume counters agree everywhere."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.broadcast_one_to_all(
        np.asarray([0.0 if value is None else float(value)], np.float32))
    return float(arr[0])


def reduce_scalar_sum(value: float) -> float:
    """Sum a python scalar across processes (early-stop mark, trainer.py:460-468)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([value], np.float32))
    return float(np.sum(arr))


def gather_for_metrics(step_output: List[Dict[str, float]]) -> List[Dict[str, float]]:
    """Gather per-step metric dicts from all processes (trainer.py:511).

    Each process contributes a list of {metric: float}; the result (on every
    process) is the concatenated list ordered by process index.
    """
    if jax.process_count() == 1:
        return step_output
    from jax.experimental import multihost_utils

    keys = sorted(step_output[0].keys()) if step_output else []
    n = len(step_output)
    local = np.asarray(
        [[float(d[k]) for k in keys] for d in step_output], np.float64
    ).reshape(n, len(keys))
    gathered = multihost_utils.process_allgather(local)  # [P, n, K] (equal n per rank)
    out: List[Dict[str, float]] = []
    for p in range(gathered.shape[0]):
        for i in range(gathered.shape[1]):
            out.append({k: float(gathered[p, i, j]) for j, k in enumerate(keys)})
    return out
