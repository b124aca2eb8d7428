"""LSTM / GRU recurrences with torch-compatible semantics.

TPU-first: the input projection for all timesteps is hoisted into one MXU
matmul; only the [B,H]x[H,4H] recurrent matmul lives inside lax.scan. Gate
orders and bias conventions follow torch.nn.LSTM / torch.nn.GRU so that
reference checkpoints (e.g. cirm_lstm) import directly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import uniform

Array = jax.Array


def _cell_init(rng, input_size, hidden_size, gates: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    stdv = 1.0 / math.sqrt(hidden_size) if hidden_size > 0 else 0.0
    return {
        "weight_ih": uniform(k1, (gates * hidden_size, input_size), stdv, dtype),
        "weight_hh": uniform(k2, (gates * hidden_size, hidden_size), stdv, dtype),
        "bias_ih": uniform(k3, (gates * hidden_size,), stdv, dtype),
        "bias_hh": uniform(k4, (gates * hidden_size,), stdv, dtype),
    }


def lstm_init(rng, input_size, hidden_size, num_layers, bidirectional=False, dtype=jnp.float32):
    """torch.nn.LSTM-compatible parameters."""
    dirs = 2 if bidirectional else 1
    keys = jax.random.split(rng, num_layers * dirs)
    layers = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size * dirs
        entry = {"fwd": _cell_init(keys[layer * dirs], in_size, hidden_size, 4, dtype)}
        if bidirectional:
            entry["bwd"] = _cell_init(keys[layer * dirs + 1], in_size, hidden_size, 4, dtype)
        layers.append(entry)
    return {"layers": layers}


def gru_init(rng, input_size, hidden_size, num_layers, bidirectional=False, dtype=jnp.float32):
    """torch.nn.GRU-compatible parameters."""
    dirs = 2 if bidirectional else 1
    keys = jax.random.split(rng, num_layers * dirs)
    layers = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size * dirs
        entry = {"fwd": _cell_init(keys[layer * dirs], in_size, hidden_size, 3, dtype)}
        if bidirectional:
            entry["bwd"] = _cell_init(keys[layer * dirs + 1], in_size, hidden_size, 3, dtype)
        layers.append(entry)
    return {"layers": layers}


def _lstm_direction(p, x, hidden_size, reverse=False):
    """x: [T, B, F] -> [T, B, H]. torch gate order: i, f, g, o."""
    T, B, F = x.shape
    H = hidden_size
    xg = (x.reshape(T * B, F) @ p["weight_ih"].T + p["bias_ih"] + p["bias_hh"]).reshape(T, B, 4 * H)

    def step(carry, xg_t):
        h, c = carry
        g = xg_t + h @ p["weight_hh"].T
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H : 2 * H])
        gg = jnp.tanh(g[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H :])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    _, out = jax.lax.scan(step, (h0, c0), xg, reverse=reverse)
    return out


def _gru_direction(p, x, hidden_size, reverse=False):
    """x: [T, B, F] -> [T, B, H]. torch gate order: r, z, n."""
    T, B, F = x.shape
    H = hidden_size
    xg = (x.reshape(T * B, F) @ p["weight_ih"].T + p["bias_ih"]).reshape(T, B, 3 * H)

    def step(h, xg_t):
        hg = h @ p["weight_hh"].T + p["bias_hh"]
        r = jax.nn.sigmoid(xg_t[:, :H] + hg[:, :H])
        z = jax.nn.sigmoid(xg_t[:, H : 2 * H] + hg[:, H : 2 * H])
        n = jnp.tanh(xg_t[:, 2 * H :] + r * hg[:, 2 * H :])
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((B, H), x.dtype)
    _, out = jax.lax.scan(step, h0, xg, reverse=reverse)
    return out


def _stack_apply(params, x, hidden_size, direction_fn, bidirectional):
    out = x
    for layer in params["layers"]:
        fwd = direction_fn(layer["fwd"], out, hidden_size)
        if bidirectional:
            bwd = direction_fn(layer["bwd"], out, hidden_size, reverse=True)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


def lstm_apply(params, x, hidden_size, bidirectional=False):
    """x: [T, B, F] time-major -> [T, B, H*dirs]."""
    return _stack_apply(params, x, hidden_size, _lstm_direction, bidirectional)


def gru_apply(params, x, hidden_size, bidirectional=False):
    """x: [T, B, F] time-major -> [T, B, H*dirs]."""
    return _stack_apply(params, x, hidden_size, _gru_direction, bidirectional)
