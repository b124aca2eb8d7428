"""Per-module activation tracer: abs-min/max frames + non-finite abort.

Functional-JAX equivalent of the reference's forward-hook tracer
(audiozen/debug_utils.py:7-268, DebugUnderflowOverflow): model code calls
``trace_activation(name, x)`` at module boundaries (GSU layers, pre-LN,
projections, deep filter); when an ActivationTracer context is active,
each call records a frame (module path, abs-min, abs-max) and aborts with
the recorded module trail as soon as a non-finite activation appears — so
the report names *which* layer overflowed, not just that something did.

Zero-cost when no tracer is active: the hook returns before building any
jax operation, so traced/jitted production code is unchanged.

Usage (eager forensics, the torch-hook workflow):
    with ActivationTracer() as tracer:
        apply_fn(cfg, params, state, noisy)   # un-jitted forward
    print(tracer.report())

Inside jit the frames are recorded through jax.debug.callback; the abort
then raises asynchronously at the next host sync instead of at the exact
call site (use the eager form to localize precisely).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

_ACTIVE: Optional["ActivationTracer"] = None
_SCOPES: List[str] = []


@contextmanager
def module_scope(name: str):
    """Prefix trace_activation names with a module path component."""
    _SCOPES.append(name)
    try:
        yield
    finally:
        _SCOPES.pop()


def tracing_active() -> bool:
    """True when an ActivationTracer context is open (a Python-time check —
    model code may add extra debug outputs, e.g. membranes, only then)."""
    return _ACTIVE is not None


def trace_activation(name: str, x: jax.Array) -> jax.Array:
    """Record an activation frame under the active tracer (identity op)."""
    tracer = _ACTIVE
    if tracer is None:
        return x
    full = "/".join(_SCOPES + [name])
    tracer._record(full, x)
    return x


class FloatingPointAbort(FloatingPointError):
    pass


class ActivationTracer:
    """Records (module, abs_min, abs_max, finite) frames; aborts on inf/nan."""

    def __init__(self, abort_on_nonfinite: bool = True, trail_frames: int = 24):
        self.abort_on_nonfinite = abort_on_nonfinite
        self.trail_frames = trail_frames
        self.frames: List[Tuple[str, float, float, bool]] = []

    # ------------------------------------------------------------- context
    def __enter__(self):
        global _ACTIVE
        if _ACTIVE is not None:
            raise RuntimeError("ActivationTracer contexts do not nest")
        _ACTIVE = self
        return self

    def __exit__(self, *exc):
        global _ACTIVE
        _ACTIVE = None
        return False

    # ------------------------------------------------------------- recording
    def _record(self, name: str, x: jax.Array):
        amin = jnp.min(jnp.abs(x))
        amax = jnp.max(jnp.abs(x))
        finite = jnp.all(jnp.isfinite(x))

        def cb(amin, amax, finite):
            ok = bool(finite)
            self.frames.append((name, float(amin), float(amax), ok))
            if self.abort_on_nonfinite and not ok:
                raise FloatingPointAbort(
                    f"non-finite activation in module '{name}' "
                    f"(abs range [{float(amin):.3e}, {float(amax):.3e}])\n"
                    f"module trail (most recent last):\n{self.report(self.trail_frames)}"
                )

        # Eager forward: run the host check inline so the abort surfaces at
        # the exact call site. Traced forward: defer through debug.callback.
        if isinstance(amin, jax.core.Tracer):
            jax.debug.callback(cb, amin, amax, finite)
        else:
            cb(amin, amax, finite)

    def report(self, last: Optional[int] = None) -> str:
        frames = self.frames[-last:] if last else self.frames
        lines = [
            f"  {'!! ' if not ok else '   '}{name:<48s} abs[{amin:.3e}, {amax:.3e}]"
            for name, amin, amax, ok in frames
        ]
        return "\n".join(lines)
