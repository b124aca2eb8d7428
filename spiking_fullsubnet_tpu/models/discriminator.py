"""MetricGAN-style quality discriminator.

Re-design of reference audiozen/models/spiking_fullsubnet/discriminator.py:
4x [spectral-norm Conv2d (4x4, stride 2, pad 1, no bias) + InstanceNorm2d
(affine) + PReLU] -> AdaptiveMaxPool2d(1) -> spectral-norm MLP with Dropout
-> LearnableSigmoid. Operates on (clean_mag, est_mag) pairs and regresses
normalized DNSMOS (trainer_GAN.py:93,130-143).

Spectral normalization keeps torch semantics: one power-iteration update of
the stored u vector per training forward; eval uses the stored u.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import uniform

Array = jax.Array


def _l2n(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


def _spectral_norm(w2d: Array, u: Array, v: Array, train: bool):
    """torch.nn.utils.spectral_norm semantics: in training, one power
    iteration updates the stored (u, v) buffers; in eval the stored buffers
    are used as-is. sigma = u^T W v."""
    if train:
        v = jax.lax.stop_gradient(_l2n(w2d.T @ u))
        u = jax.lax.stop_gradient(_l2n(w2d @ v))
    sigma = u @ (w2d @ v)
    return sigma, u, v


def _conv_init(rng, out_ch, in_ch, kh, kw, dtype=jnp.float32):
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_, ku, kv = jax.random.split(rng, 3)
    w = uniform(kw_, (out_ch, in_ch, kh, kw), bound, dtype)
    return {
        "weight": w,
        "u": _l2n(jax.random.normal(ku, (out_ch,), dtype)),
        "v": _l2n(jax.random.normal(kv, (in_ch * kh * kw,), dtype)),
    }


def _linear_sn_init(rng, in_f, out_f, dtype=jnp.float32):
    kw_, kb, ku, kv = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(in_f)
    return {
        "weight": uniform(kw_, (out_f, in_f), bound, dtype),
        "bias": uniform(kb, (out_f,), bound, dtype),
        "u": _l2n(jax.random.normal(ku, (out_f,), dtype)),
        "v": _l2n(jax.random.normal(kv, (in_f,), dtype)),
    }


def discriminator_init(rng, ndf: int = 16, in_channel: int = 2, dtype=jnp.float32):
    ks = jax.random.split(rng, 6)
    chans = [in_channel, ndf, ndf * 2, ndf * 4, ndf * 8]
    params: Dict[str, Any] = {"convs": [], "inorm": [], "prelu": []}
    for i in range(4):
        params["convs"].append(_conv_init(ks[i], chans[i + 1], chans[i], 4, 4, dtype))
        params["inorm"].append(
            {"weight": jnp.ones((chans[i + 1],), dtype), "bias": jnp.zeros((chans[i + 1],), dtype)}
        )
        params["prelu"].append(jnp.full((chans[i + 1],), 0.25, dtype))
    params["fc1"] = _linear_sn_init(ks[4], ndf * 8, ndf * 4, dtype)
    params["prelu_fc"] = jnp.full((ndf * 4,), 0.25, dtype)
    params["fc2"] = _linear_sn_init(ks[5], ndf * 4, 1, dtype)
    params["sigmoid_slope"] = jnp.ones((1,), dtype)
    return params


def _prelu(x, a, channel_axis=1):
    shape = [1] * x.ndim
    shape[channel_axis] = a.shape[0]
    a = a.reshape(shape)
    return jnp.where(x >= 0, x, a * x)


def _instance_norm(x, p, eps=1e-5):
    """InstanceNorm2d affine (per sample, per channel over H, W)."""
    mu = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(2, 3), keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def discriminator_apply(
    params,
    x: Array,
    y: Array,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
):
    """(x=clean_mag, y=est_mag) [B, F, T] or [B, 1, F, T] -> score [B, 1].

    Returns (score, new_params) — new_params carries updated spectral-norm
    u vectors when train=True (a buffer update, like torch's).
    """
    if x.ndim == 3:
        x = x[:, None]
    if y.ndim == 3:
        y = y[:, None]
    h = jnp.concatenate([x, y], axis=1)  # [B, 2, F, T]

    new_params = jax.tree.map(lambda v: v, params)  # shallow copy structure
    for i in range(4):
        conv = params["convs"][i]
        w = conv["weight"]
        sigma, u, v = _spectral_norm(w.reshape(w.shape[0], -1), conv["u"], conv["v"], train)
        new_params["convs"][i]["u"] = u
        new_params["convs"][i]["v"] = v
        h = jax.lax.conv_general_dilated(
            h,
            w / sigma,
            window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        h = _instance_norm(h, params["inorm"][i])
        h = _prelu(h, params["prelu"][i])

    h = jnp.max(h, axis=(2, 3))  # AdaptiveMaxPool2d(1) + flatten -> [B, C]

    fc1 = params["fc1"]
    sigma, u, v = _spectral_norm(fc1["weight"], fc1["u"], fc1["v"], train)
    new_params["fc1"]["u"] = u
    new_params["fc1"]["v"] = v
    h = h @ (fc1["weight"] / sigma).T + fc1["bias"]
    if train and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.7, h.shape)
        h = jnp.where(keep, h / 0.7, 0.0)
    h = _prelu(h, params["prelu_fc"], channel_axis=1)

    fc2 = params["fc2"]
    sigma, u, v = _spectral_norm(fc2["weight"], fc2["u"], fc2["v"], train)
    new_params["fc2"]["u"] = u
    new_params["fc2"]["v"] = v
    h = h @ (fc2["weight"] / sigma).T + fc2["bias"]

    score = jax.nn.sigmoid(params["sigmoid_slope"] * h)  # LearnableSigmoid beta=1
    return score, new_params


def build(seed: int = 0, ndf: int = 16, in_channel: int = 2):
    params = discriminator_init(jax.random.PRNGKey(seed), ndf, in_channel)
    return {
        "config": {"ndf": ndf, "in_channel": in_channel},
        "apply": discriminator_apply,
        "params": params,
        "state": {},
    }
