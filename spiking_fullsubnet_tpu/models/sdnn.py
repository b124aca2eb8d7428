"""Sigma-delta spiking network with axonal delays (Intel N-DNS baseline).

Functional JAX re-design of the lava-dl model in
recipes/intel_ndns/sdnn_delays/model.py:8-105 (the reference depends on the
external lava-dl package; this is a self-contained equivalent):

- input quantization at step 1/64 (straight-through estimator),
- sigma-delta ReLU dense blocks 257 -> 512 -> 512 -> 257: the delta stage
  threshold-quantizes the *change* of each activation (temporal sparsity,
  STE surrogate), the sigma stage re-accumulates over time,
- learnable per-neuron axonal delays (continuous parameter, STE-rounded,
  gathered along time, clipped to max_delay),
- output mask = relu(x + 1) applied to the (optionally delayed) noisy mag.

The delta/sigma recurrences are O(1)-state `lax.scan`s over time, mirroring
the GSU design (input projections hoisted to MXU matmuls).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..nn.core import uniform

Array = jax.Array


@jax.custom_vjp
def ste_round(x: Array) -> Array:
    return jnp.round(x)


ste_round.defvjp(lambda x: (jnp.round(x), None), lambda _, g: (g,))


def quantize(x: Array, step: float) -> Array:
    """slayer.utils.quantize with straight-through gradient."""
    return ste_round(x / step) * step


def _delta_encode(x_tbf: Array, threshold: float) -> Array:
    """Delta stage: emit threshold-quantized changes; sigma-decodable.

    Carries the last *reconstructed* value so quantization errors do not
    accumulate (standard sigma-delta loop).
    """

    def step(recon, x_t):
        delta = quantize(x_t - recon, threshold)
        return recon + delta, delta

    zeros = jnp.zeros_like(x_tbf[0])
    _, deltas = jax.lax.scan(step, zeros, x_tbf)
    return deltas


def _sigma_decode(d_tbf: Array) -> Array:
    return jnp.cumsum(d_tbf, axis=0)


def _apply_delay(x_tbf: Array, delay: Array, max_delay: int) -> Array:
    """Per-feature learnable axonal delay along time (slayer delay equivalent).

    delay: [F] continuous in [0, max_delay]; applied with linear
    interpolation between the two neighboring integer delays so gradients
    flow to the delay parameter (an integer gather would have zero grad).
    """
    t, b, f = x_tbf.shape
    d = jnp.clip(delay, 0.0, float(max_delay))  # [F]
    d0 = jnp.floor(d)
    frac = d - d0  # differentiable part
    d0 = d0.astype(jnp.int32)

    def gather(shift):
        idx = jnp.arange(t)[:, None] - shift[None, :]  # [T, F]
        idx_c = jnp.clip(idx, 0, t - 1)
        g = jnp.take_along_axis(x_tbf, jnp.broadcast_to(idx_c[:, None, :], (t, b, f)), axis=0)
        return jnp.where((idx >= 0)[:, None, :], g, 0.0)

    return (1.0 - frac)[None, None, :] * gather(d0) + frac[None, None, :] * gather(d0 + 1)


def delay_signal(x: Array, shift: int, axis: int = -1) -> Array:
    """Integer whole-signal delay (slayer.axon.delay with scalar shift)."""
    if shift == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (shift, 0)
    return jnp.pad(x, pad)[tuple(slice(0, s) for s in x.shape)]


@dataclass(frozen=True)
class SDNNConfig:
    threshold: float = 0.1
    max_delay: int = 64
    out_delay: int = 0
    input_size: int = 257
    hidden_size: int = 512
    stft_mean: float = 0.2
    input_quant_step: float = 1.0 / 64


def sdnn_init(rng, cfg: SDNNConfig, dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    i, h = cfg.input_size, cfg.hidden_size

    def dense(k, fin, fout):
        return {"weight": uniform(k, (fout, fin), 1.0 / math.sqrt(fin), dtype)}

    return {
        "dense1": dense(k1, i, h),
        "delay1": jax.random.uniform(k4, (h,), dtype, 0.0, 1.0),
        "dense2": dense(k2, h, h),
        "delay2": jax.random.uniform(k5, (h,), dtype, 0.0, 1.0),
        "dense_out": dense(k3, h, i),
    }


def sdnn_apply(cfg: SDNNConfig, params, noisy_mag: Array) -> Array:
    """noisy_mag: [B, F, T] -> enhanced magnitude [B, F, T] (model.py:66-73)."""
    x = noisy_mag - cfg.stft_mean
    x = jnp.transpose(x, (2, 0, 1))  # [T, B, F]
    x = quantize(x, cfg.input_quant_step)

    # block 1: delta -> dense -> sigma -> relu -> delay
    d = _delta_encode(x, cfg.threshold)
    s = _sigma_decode(d @ params["dense1"]["weight"].T)
    a = jax.nn.relu(s)
    a = _apply_delay(a, params["delay1"], cfg.max_delay)

    d = _delta_encode(a, cfg.threshold)
    s = _sigma_decode(d @ params["dense2"]["weight"].T)
    a = jax.nn.relu(s)
    a = _apply_delay(a, params["delay2"], cfg.max_delay)

    d = _delta_encode(a, cfg.threshold)
    out = _sigma_decode(d @ params["dense_out"]["weight"].T)  # output block: no spike

    out = jnp.transpose(out, (1, 2, 0))  # [B, F, T]
    mask = jax.nn.relu(out + 1.0)
    return delay_signal(noisy_mag, cfg.out_delay, axis=-1) * mask


def build(seed: int = 0, **model_args):
    cfg = SDNNConfig(**model_args)
    params = sdnn_init(jax.random.PRNGKey(seed), cfg)
    return {
        "config": cfg,
        "apply": lambda c, p, s, mag, train=False: {"enhanced_mag": sdnn_apply(c, p, mag), "state": s},
        "params": params,
        "state": {},
    }
