"""LIF / ALIF spiking neurons (SpikingJelly-style).

Re-design of the freeze-phase neuron module
(recipes/intel_ndns/spiking_fullsubnet_freeze_phase/neuron.py:222-297):
leaky integrate-and-fire with triangle surrogate firing, soft or hard reset,
optionally detached reset; ALIF adds an adaptive threshold driven by a spike
trace. The per-timestep membrane recurrence is a `lax.scan` (the reference's
"ALIF" leaderboard row uses these neurons as the sequence backbone in place
of the GSU).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import uniform
from .gsu import spike  # Heaviside + triangle surrogate (identical math)

Array = jax.Array


def lif_sequence(
    x: Array,  # [T, B, F] input currents
    tau: float = 2.0,
    v_threshold: float = 1.0,
    hard_reset: bool = False,
    detach_reset: bool = False,
    v0: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Run LIF dynamics over a sequence (neuron.py:278-297 + BaseNode):

        v_t   = v_{t-1} * exp(-1/tau) + x_t
        s_t   = Heaviside(v_t - theta)        (triangle surrogate backward)
        v_t  <- v_t * (1 - s_t)               (hard reset)
                v_t - s_t * theta             (soft reset, default)

    Returns (spikes [T, B, F], final membrane [B, F]).
    """
    decay = math.exp(-1.0 / tau)

    def step(v, x_t):
        v = v * decay + x_t
        s = spike(v - v_threshold)
        s_reset = jax.lax.stop_gradient(s) if detach_reset else s
        if hard_reset:
            v = v * (1.0 - s_reset)
        else:
            v = v - s_reset * v_threshold
        return v, s

    if v0 is None:
        v0 = jnp.zeros_like(x[0])
    v_final, spikes = jax.lax.scan(step, v0, x)
    return spikes, v_final


def alif_sequence(
    x: Array,  # [T, B, F]
    tau: float = 2.0,
    tau_adp: float = 20.0,
    v_threshold: float = 1.0,
    beta: float = 1.8,
    hard_reset: bool = False,
) -> Tuple[Array, Array]:
    """Adaptive-threshold LIF: theta_t = theta_0 + beta * a_t, with the
    adaptation trace a_t a leaky accumulation of past spikes (standard ALIF;
    the freeze-phase leaderboard's "ALIF" entry uses this neuron family).

    Returns (spikes [T, B, F], final membrane [B, F]).
    """
    decay = math.exp(-1.0 / tau)
    rho = math.exp(-1.0 / tau_adp)

    def step(carry, x_t):
        v, a = carry
        v = v * decay + x_t
        theta = v_threshold + beta * a
        s = spike(v - theta)
        a = rho * a + (1.0 - rho) * s
        if hard_reset:
            v = v * (1.0 - s)
        else:
            v = v - s * theta
        return (v, a), s

    init = (jnp.zeros_like(x[0]), jnp.zeros_like(x[0]))
    (v_final, _), spikes = jax.lax.scan(step, init, x)
    return spikes, v_final


# ------------------------------------------------------------------ dense SNN


def lif_dense_init(rng, sizes, dtype=jnp.float32):
    """Dense feed-forward SNN weights: sizes = [in, h1, ..., out]."""
    keys = jax.random.split(rng, len(sizes) - 1)
    return {
        "layers": [
            {"weight": uniform(k, (sizes[i + 1], sizes[i]), 1.0 / math.sqrt(sizes[i]), dtype)}
            for i, k in enumerate(keys)
        ]
    }


def lif_dense_apply(
    params,
    x: Array,  # [T, B, F]
    tau: float = 2.0,
    v_threshold: float = 1.0,
    adaptive: bool = False,
    last_layer_spikes: bool = False,
):
    """Feed-forward spiking network: dense -> (A)LIF per layer.

    Returns (output [T, B, F_out], all_layer_outputs) where the final layer
    is a non-spiking integrator readout unless last_layer_spikes.
    """
    seq = alif_sequence if adaptive else lif_sequence
    out = x
    all_layer_outputs = [x]
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        cur = out @ layer["weight"].T
        if i < n - 1 or last_layer_spikes:
            out, _ = seq(cur, tau=tau, v_threshold=v_threshold)
        else:
            # readout: leaky integration of currents, no firing
            decay = math.exp(-1.0 / tau)

            def step(v, c):
                v = v * decay + c
                return v, v

            _, out = jax.lax.scan(step, jnp.zeros_like(cur[0]), cur)
        all_layer_outputs.append(out)
    return out, all_layer_outputs
