"""Neuromorphic cost proxies: synaptic / neuron operations.

Replicates reference audiozen/metric.py:303-340 (the Intel N-DNS
"power_proxy_Ops/s" and "PDP_proxy_Ops" leaderboard columns), computed from
the spike tensors (`all_layer_outputs`) every forward emits.
"""

from __future__ import annotations

import numpy as np


def _rate(x) -> float:
    x = np.asarray(x)
    return float((x > 0).mean())


def compute_synops(fb_all_layer_outputs, sb_all_layer_outputs, shared_weights: bool = True) -> float:
    """Spike-rate-weighted synaptic operations (metric.py:303-327).

    For each hidden spiking layer i (input and final projection excluded):
        rate(out_i) * fan_in_i * (fan_out_i + recurrent fan_in_i)
    """
    synops = 0.0
    for i in range(1, len(fb_all_layer_outputs) - 1):
        cur = np.asarray(fb_all_layer_outputs[i])
        nxt = np.asarray(fb_all_layer_outputs[i + 1])
        synops += _rate(cur) * cur.shape[-1] * (nxt.shape[-1] + cur.shape[-1])
    for section in sb_all_layer_outputs:
        for j in range(1, len(section) - 1):
            cur = np.asarray(section[j])
            nxt = np.asarray(section[j + 1])
            synops += _rate(cur) * cur.shape[-1] * (nxt.shape[-1] + cur.shape[-1])
    return synops if shared_weights else 2 * synops


def compute_neuronops(fb_all_layer_outputs, sb_all_layer_outputs) -> float:
    """Neuron count proxy (metric.py:330-340). Pure shape arithmetic — works
    on numpy and jax arrays without a device->host copy."""
    neuronops = 0.0
    for x in fb_all_layer_outputs:
        neuronops += np.shape(x)[-1]
    for section in sb_all_layer_outputs:
        for x in section:
            neuronops += np.shape(x)[-1]
    return neuronops


def synops_device(fb_all_layer_outputs, sb_all_layer_outputs, shared_weights: bool = True):
    """jnp scalar version of `compute_synops` for use INSIDE a jitted eval
    forward: spike rates reduce on device (one scalar crosses to host instead
    of every layer's spike tensor — the reference pulls the full tensors to
    CPU per validation utterance, metric.py:303-327)."""
    import jax.numpy as jnp

    def rate(x):
        return jnp.mean((x > 0).astype(jnp.float32))

    synops = jnp.float32(0.0)
    for i in range(1, len(fb_all_layer_outputs) - 1):
        cur, nxt = fb_all_layer_outputs[i], fb_all_layer_outputs[i + 1]
        synops = synops + rate(cur) * cur.shape[-1] * (nxt.shape[-1] + cur.shape[-1])
    for section in sb_all_layer_outputs:
        for j in range(1, len(section) - 1):
            cur, nxt = section[j], section[j + 1]
            synops = synops + rate(cur) * cur.shape[-1] * (nxt.shape[-1] + cur.shape[-1])
    return synops if shared_weights else 2 * synops
