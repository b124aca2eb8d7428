"""Honest device timing over remote-attached accelerators.

On a directly-attached TPU, ``jax.block_until_ready`` is a reliable sync
point. On tunneled backends (the dev "axon" transport) it can return before
the device has executed anything, which silently turns a wall-clock
benchmark into a dispatch-overhead benchmark. Two consequences measured on
this environment (2026-08, v5e via axon):

- ``block_until_ready`` on a 8192x8192 matmul "completes" in 64 us
  (17,000 TFLOP/s — 86x over the hardware peak, i.e. nothing ran);
- a device->host fetch of any output is a true sync point, but costs a
  ~35 ms round trip (and the *first* fetch in a process can take minutes
  while the transport warms up).

The only robust protocol is therefore: (1) chain N iterations of the
workload *on device* inside a single jitted program, with explicit data
dependencies (``lax.optimization_barrier``) so XLA cannot collapse the
chain, (2) force completion by fetching a scalar checksum that consumes
every output element, and (3) difference two chain lengths so the fixed
round-trip/launch cost cancels:

    per_iter = (t(n2) - t(n1)) / (n2 - n1)

``time_fn_per_iter`` implements that protocol and is what bench.py and the
kernel microbenchmarks build on.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def checksum(tree: Any) -> jax.Array:
    """Scalar that consumes every element of every leaf (prevents DCE)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    total = jnp.float32(0.0)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating) or jnp.issubdtype(
            leaf.dtype, jnp.complexfloating
        ):
            total = total + jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
        else:
            total = total + jnp.sum(leaf).astype(jnp.float32)
    return total


def fetch(x: jax.Array) -> float:
    """Device->host fetch: the only true sync point over tunneled backends."""
    return float(np.asarray(x))


def _chained(fn: Callable, n_iters: int) -> Callable:
    """Build run(args) = fn applied n_iters times with on-device chaining.

    Each iteration's inputs are threaded through lax.optimization_barrier
    together with the previous iteration's checksum, so iterations execute
    back-to-back on device and none can be folded away.
    """

    def run(*args):
        tok = jnp.float32(0.0)

        def body(_, carry):
            cur_args, _tok = carry
            out = fn(*cur_args)
            tok2 = checksum(out)
            # Rebuild args with a data dependency on tok2. The barrier ties
            # every output to every input, so XLA must order iteration k+1
            # after iteration k and cannot CSE the repeated calls.
            flat, treedef = jax.tree_util.tree_flatten(cur_args)
            barrier_out = lax.optimization_barrier(tuple(flat) + (tok2,))
            new_args = jax.tree_util.tree_unflatten(treedef, barrier_out[:-1])
            return (new_args, barrier_out[-1])

        (_, tok) = lax.fori_loop(0, n_iters, body, (args, tok))
        return tok

    return run


def time_fn_per_iter(
    fn: Callable,
    args: Tuple,
    iters: Tuple[int, int] = (2, 8),
    reps: int = 3,
) -> float:
    """Best-of-reps per-iteration wall time of ``fn(*args)`` on device.

    fn must be jit-compatible and take/return pytrees of arrays. Returns
    seconds per iteration with launch + host-round-trip overhead removed by
    differencing chain lengths ``iters[0]`` and ``iters[1]``.
    """
    n1, n2 = iters
    assert n2 > n1 >= 1
    run1 = jax.jit(_chained(fn, n1))
    run2 = jax.jit(_chained(fn, n2))

    # compile + transport warmup (first fetch can be pathologically slow)
    fetch(run1(*args))
    fetch(run2(*args))

    def best_of(run) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(run1)
    t2 = best_of(run2)
    return max((t2 - t1) / (n2 - n1), 1e-12)


def time_fn_total(fn: Callable, args: Tuple, reps: int = 3) -> float:
    """Best-of-reps single-shot wall time (includes one host round trip).

    Use for latency measurements where the round trip is part of the story;
    use time_fn_per_iter for throughput.
    """

    @jax.jit
    def run(*a):
        return checksum(fn(*a))

    fetch(run(*args))  # compile + warm transport
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def host_roundtrip_seconds(reps: int = 5) -> float:
    """Measured device->host round-trip floor (for reporting honesty)."""
    x = jnp.zeros((1,), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    fetch(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(f(x))
        best = min(best, time.perf_counter() - t0)
    return best
