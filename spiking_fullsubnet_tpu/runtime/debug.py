"""Numerical sanitation (maps reference audiozen/debug_utils.py + utils.py:167).

The reference installs forward hooks that trace per-module abs-min/max and
abort on inf/nan (DebugUnderflowOverflow). In a jitted JAX program the
equivalents are (a) jax.debug_nans for hard abort, (b) this light watchdog
that checks the update pytrees between steps on the host, reporting which
leaf went non-finite.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def enable_debug_nans(enable: bool = True) -> None:
    """Hard-abort on NaN production inside jitted code (debug mode)."""
    jax.config.update("jax_debug_nans", enable)


def detect_overflow(pytree: Any, tag: str = "") -> bool:
    """Host-side finite check; logs the offending leaf paths. Returns True if
    any leaf is non-finite (detect_overflow, debug_utils.py:282-324)."""
    bad = False
    flat, _ = jax.tree_util.tree_flatten_with_path(pytree)
    for keypath, leaf in flat:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
            logger.error(
                f"{tag} non-finite values in {path}: "
                f"nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()}"
            )
            bad = True
    return bad


def clamp_inf_value(x, dtype=jnp.float32):
    """Clamp ±inf to finfo max/min (reference utils.py:167-172)."""
    finfo = jnp.finfo(dtype)
    return jnp.clip(jnp.nan_to_num(x, posinf=finfo.max, neginf=finfo.min), finfo.min, finfo.max)


# Per-module activation tracer (reference DebugUnderflowOverflow semantics):
# re-exported here so the debug subsystem has one import surface.
from ..nn.module_tracer import (  # noqa: E402,F401
    ActivationTracer,
    FloatingPointAbort,
    module_scope,
    trace_activation,
)
