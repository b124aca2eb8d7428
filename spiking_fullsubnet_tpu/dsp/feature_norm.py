"""Causal / offline feature normalizations (the FullSubNet norm family).

JAX re-design of reference audiozen/models/base_model.py:159-384.  The
reference computes the cumulative means with Python loops + torch.cumsum;
here everything is a vectorized cumsum, so the whole norm fuses into the
surrounding jitted graph (no scan needed: cumulative mean is a prefix sum).

All inputs are [B, C, F, T] unless stated otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mask import EPSILON


def _linear_recurrence(a, b):
    """mu_t = a_t * mu_{t-1} + b_t with mu_{-1} = 0, via parallel associative scan.

    a, b: [..., T] (scan over the last axis). Runs in O(log T) depth on the VPU
    instead of a sequential T-step loop.
    """

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, b1 * a2 + b2

    _, mu = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return mu


def offline_laplace_norm(x, return_mu: bool = False):
    """Divide by utterance-level mean (base_model.py:252-274)."""
    mu = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    normed = x / (mu + EPSILON)
    return (normed, mu) if return_mu else normed


def cumulative_laplace_norm(x):
    """Divide by causal running mean over (F, t<=T) (base_model.py:277-307).

    Accepts [..., F, T]: all leading dims are flattened into batch. (The
    reference only handles 4-D and crashes on the frozen recipe's 5-D
    sub-band input — model_low_freq.py:475 with cumulative_laplace_norm —
    so this build generalizes to the intended semantics.)
    """
    *lead, f, t = x.shape
    b = 1
    for d in lead:
        b *= d
    xr = x.reshape(b, f, t)
    step_sum = jnp.sum(xr, axis=1)  # [B*C, T]
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cum_sum / entry_count
    normed = xr / (cum_mean[:, None, :] + EPSILON)
    return normed.reshape(*lead, f, t)


def offline_gaussian_norm(x):
    """Zero-norm by utterance-level mean/std (base_model.py:310-323).

    Note: torch.std uses the unbiased (ddof=1) estimator; replicated here.
    """
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    n = 1
    for a in axes:
        n *= x.shape[a]
    var = jnp.sum((x - mu) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
    return (x - mu) / (jnp.sqrt(var) + EPSILON)


def cumulative_layer_norm(x):
    """Online zero-norm: causal running mean/std (base_model.py:326-366)."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    step_sum = jnp.sum(xr, axis=1)
    step_pow_sum = jnp.sum(jnp.square(xr), axis=1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    cum_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cum_sum / entry_count
    cum_var = (cum_pow_sum - 2 * cum_mean * cum_sum) / entry_count + cum_mean**2
    cum_std = jnp.sqrt(cum_var + EPSILON)
    normed = (xr - cum_mean[:, None, :]) / cum_std[:, None, :]
    return normed.reshape(b, c, f, t)


def forgetting_norm(x, sample_length: int = 192):
    """Exponential-forgetting running-mean norm (base_model.py:159-203).

    The reference warms up with a frame-indexed smoothing factor
    alp = min((i-1)/(i+1), alpha) for i < sample_length, then uses alpha.
    Expressed here as a log-space prefix-sum-free recursion via vectorized
    weights (numerically identical to the reference loop).
    """
    b, c, f, t = x.shape
    xr = x.reshape(b, c * f, t)
    alpha = (sample_length - 1) / (sample_length + 1)
    frame_mean = jnp.mean(xr, axis=1)  # [B, T]

    idx = jnp.arange(t, dtype=x.dtype)
    alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)
    alp = jnp.where(idx < sample_length, alp, alpha)  # [T]

    # mu_t = alp_t * mu_{t-1} + (1 - alp_t) * m_t — first-order linear
    # recurrence; alp_0 = -1 (reference quirk), so use the exact parallel scan.
    mu = _linear_recurrence(
        jnp.broadcast_to(alp[None, :], frame_mean.shape),
        (1.0 - alp)[None, :] * frame_mean,
    )
    normed = xr / (mu[:, None, :] + EPSILON)
    return normed.reshape(b, c, f, t)


def hybrid_norm(x, sample_length: int = 192):
    """Forgetting norm warm-up followed by cumulative mean (base_model.py:206-249).

    Input is [B, F, T] in the reference; accepts [B, F, T] here.
    """
    b, f, t = x.shape
    step_sum = jnp.sum(x, axis=1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum_mean = cum_sum / entry_count  # [B, T]

    frame_mean = jnp.mean(x, axis=1)
    alpha = (sample_length - 1) / (sample_length + 1)
    idx = jnp.arange(t, dtype=x.dtype)
    alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)
    init_mu = _linear_recurrence(
        jnp.broadcast_to(alp[None, :], frame_mean.shape),
        (1.0 - alp)[None, :] * frame_mean,
    )

    mu = jnp.where(idx[None, :] < sample_length, init_mu, cum_mean)
    return x / (mu[:, None, :] + EPSILON)


_NORMS = {
    "offline_laplace_norm": offline_laplace_norm,
    "cumulative_laplace_norm": cumulative_laplace_norm,
    "offline_gaussian_norm": offline_gaussian_norm,
    "cumulative_layer_norm": cumulative_layer_norm,
    "forgetting_norm": forgetting_norm,
}


def norm_wrapper(norm_type: str):
    """Lookup by name (base_model.py:368-384)."""
    if norm_type not in _NORMS:
        raise NotImplementedError(
            f"Unknown norm {norm_type!r}; choose from {sorted(_NORMS)}"
        )
    return _NORMS[norm_type]
