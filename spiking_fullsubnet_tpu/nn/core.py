"""Minimal functional NN primitives (params = plain pytrees).

This framework deliberately avoids a module system: every layer is an
(init, apply) pair over an explicit parameter pytree, which keeps jit/pjit/
scan/vmap transforms transparent and makes torch-checkpoint import a direct
dict mapping. Initializers replicate torch defaults so randomly-initialized
training matches the reference's distributional behavior.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def uniform(rng, shape, bound: float, dtype=jnp.float32) -> Array:
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def cast_floating(tree, dtype):
    """Cast every real floating leaf of a pytree to `dtype`.

    The mixed-precision policy: parameters live in float32 (master copy held
    by the optimizer); compute casts them to bfloat16 at the model boundary.
    Because the cast happens inside the autodiff region, cotangents flow back
    through `astype` and gradients land in float32 automatically. Integer and
    complex leaves pass through untouched.
    """
    dt = jnp.dtype(dtype)

    def _cast(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dt)
        return x

    return jax.tree.map(_cast, tree)


# ---------------------------------------------------------------- Linear


def linear_init(rng, in_features: int, out_features: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: U(±1/sqrt(fan_in)) for weight and bias."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
    params = {"weight": uniform(kw, (out_features, in_features), bound, dtype)}
    if bias:
        params["bias"] = uniform(kb, (out_features,), bound, dtype)
    return params


def linear_apply(params, x: Array) -> Array:
    y = x @ params["weight"].T
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------- LayerNorm


def layer_norm_init(normalized_shape: int, dtype=jnp.float32):
    return {
        "weight": jnp.ones((normalized_shape,), dtype),
        "bias": jnp.zeros((normalized_shape,), dtype),
    }


def layer_norm_apply(params, x: Array, eps: float = 1e-5) -> Array:
    """torch.nn.LayerNorm over the last dim (biased variance)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    return xhat * params["weight"] + params["bias"]


# ---------------------------------------------------------------- BatchNorm (1d)


def batch_norm_init(num_features: int, dtype=jnp.float32):
    params = {
        "weight": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), dtype),
        "running_var": jnp.ones((num_features,), dtype),
    }
    return params, state


def batch_norm_stats(x: Array):
    """Biased batch statistics over all axes but the last."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x - mean), axis=axes)
    return mean, var


def batch_norm_apply(params, x: Array, mean: Array, var: Array, eps: float = 1e-5) -> Array:
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * params["weight"] + params["bias"]


# ---------------------------------------------------------------- activations

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
}


def output_activation(name: Optional[str]):
    """Reference convention: None/False/missing -> identity
    (modeling_spiking_fullsubnet.py:54-61; TOML uses `false` for None).
    Accepts both generations' capitalizations ("tanh" / "Tanh")."""
    if not name:
        return lambda x: x
    key = str(name).lower()
    if key in _ACTIVATIONS:
        return _ACTIVATIONS[key]
    raise NotImplementedError(f"Activation {name!r} not supported")
