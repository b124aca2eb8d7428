"""Conv-TasNet: time-domain source separation baseline.

Re-design of reference audiozen/models/conv_tasnet/modeling_conv_tasnet.py
(itself torchaudio's architecture): conv encoder -> TCN mask generator
(dilated depthwise conv blocks, gLN, PReLU, residual+skip) -> transposed-conv
decoder. All convs are MXU-friendly NCW convolutions; the dilation stack is a
static Python loop of lax convolutions that XLA fuses.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..nn.core import uniform

Array = jax.Array


def _conv1d_init(rng, out_ch, in_ch_per_group, k, bias=True, dtype=jnp.float32):
    fan_in = in_ch_per_group * k
    bound = 1.0 / math.sqrt(fan_in)
    ks = jax.random.split(rng)
    p = {"weight": uniform(ks[0], (out_ch, in_ch_per_group, k), bound, dtype)}
    if bias:
        p["bias"] = uniform(ks[1], (out_ch,), bound, dtype)
    return p


def _conv1d(x, p, stride=1, padding=0, dilation=1, groups=1):
    """x: [B, C, T], weight: [O, I/g, K] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def _conv_transpose1d(x, p, stride=1, padding=0):
    """torch ConvTranspose1d (weight layout [in, out, k]) via input dilation:
    out_len = (L-1)*stride + k - 2*padding, matching torch exactly."""
    w = p["weight_t"]  # [I, O, K]
    k = w.shape[-1]
    w2 = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=2)  # [O, I, K], spatially flipped
    out = jax.lax.conv_general_dilated(
        x,
        w2,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def _glob_ln(x, p, eps=1e-8):
    """GroupNorm(num_groups=1) == global layer norm over (C, T)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["weight"][None, :, None] + p["bias"][None, :, None]


def _prelu1(x, a):
    return jnp.where(x >= 0, x, a * x)


@dataclass(frozen=True)
class ConvTasNetConfig:
    num_sources: int = 2
    enc_kernel_size: int = 16
    enc_num_feats: int = 512
    msk_kernel_size: int = 3
    msk_num_feats: int = 128
    msk_num_hidden_feats: int = 512
    msk_num_layers: int = 8
    msk_num_stacks: int = 3
    msk_activate: str = "sigmoid"

    @property
    def enc_stride(self):
        return self.enc_kernel_size // 2


def conv_tasnet_init(rng, cfg: ConvTasNetConfig, dtype=jnp.float32):
    n_blocks = cfg.msk_num_stacks * cfg.msk_num_layers
    keys = jax.random.split(rng, 5 + n_blocks * 5)
    ki = iter(range(len(keys)))
    params: Dict[str, Any] = {}
    params["encoder"] = _conv1d_init(keys[next(ki)], cfg.enc_num_feats, 1, cfg.enc_kernel_size, bias=False, dtype=dtype)
    params["input_norm"] = {
        "weight": jnp.ones((cfg.enc_num_feats,), dtype),
        "bias": jnp.zeros((cfg.enc_num_feats,), dtype),
    }
    params["input_conv"] = _conv1d_init(keys[next(ki)], cfg.msk_num_feats, cfg.enc_num_feats, 1, dtype=dtype)

    blocks: List[Dict[str, Any]] = []
    for s in range(cfg.msk_num_stacks):
        for l in range(cfg.msk_num_layers):
            no_residual = l == cfg.msk_num_layers - 1 and s == cfg.msk_num_stacks - 1
            blk = {
                "conv1": _conv1d_init(keys[next(ki)], cfg.msk_num_hidden_feats, cfg.msk_num_feats, 1, dtype=dtype),
                "prelu1": jnp.full((1,), 0.25, dtype),
                "norm1": {
                    "weight": jnp.ones((cfg.msk_num_hidden_feats,), dtype),
                    "bias": jnp.zeros((cfg.msk_num_hidden_feats,), dtype),
                },
                "dconv": _conv1d_init(keys[next(ki)], cfg.msk_num_hidden_feats, 1, cfg.msk_kernel_size, dtype=dtype),
                "prelu2": jnp.full((1,), 0.25, dtype),
                "norm2": {
                    "weight": jnp.ones((cfg.msk_num_hidden_feats,), dtype),
                    "bias": jnp.zeros((cfg.msk_num_hidden_feats,), dtype),
                },
                "skip_out": _conv1d_init(keys[next(ki)], cfg.msk_num_feats, cfg.msk_num_hidden_feats, 1, dtype=dtype),
            }
            if not no_residual:
                blk["res_out"] = _conv1d_init(keys[next(ki)], cfg.msk_num_feats, cfg.msk_num_hidden_feats, 1, dtype=dtype)
            blocks.append(blk)
    params["blocks"] = blocks
    params["output_prelu"] = jnp.full((1,), 0.25, dtype)
    params["output_conv"] = _conv1d_init(
        keys[next(ki)], cfg.enc_num_feats * cfg.num_sources, cfg.msk_num_feats, 1, dtype=dtype
    )
    # decoder: torch ConvTranspose1d weight layout [in, out, k]
    fan_in = cfg.enc_num_feats * cfg.enc_kernel_size
    bound = 1.0 / math.sqrt(cfg.enc_kernel_size)  # torch: in_channels/groups * k -> here groups=1
    params["decoder"] = {
        "weight_t": uniform(keys[next(ki)], (cfg.enc_num_feats, 1, cfg.enc_kernel_size), bound, dtype)
    }
    return params


def conv_tasnet_apply(cfg: ConvTasNetConfig, params, x: Array):
    """x: [B, T] waveform -> [B, num_sources, T] (modeling_conv_tasnet.py:278-303)."""
    assert x.ndim == 2
    b, t = x.shape
    x = x[:, None, :]  # [B, 1, T]

    # pad to stride alignment (modeling_conv_tasnet.py:233-275)
    is_odd = cfg.enc_kernel_size % 2
    num_strides = (t - is_odd) // cfg.enc_stride
    num_rem = t - (is_odd + num_strides * cfg.enc_stride)
    num_pads = 0 if num_rem == 0 else cfg.enc_stride - num_rem
    if num_pads:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, num_pads)))
    t_pad = x.shape[-1]

    feats = _conv1d(x, params["encoder"], stride=cfg.enc_stride, padding=cfg.enc_stride)

    h = _glob_ln(feats, params["input_norm"])
    h = _conv1d(h, params["input_conv"])
    skip_sum = 0.0
    i = 0
    for s in range(cfg.msk_num_stacks):
        for l in range(cfg.msk_num_layers):
            blk = params["blocks"][i]
            i += 1
            dilation = 2**l
            f = _conv1d(h, blk["conv1"])
            f = _prelu1(f, blk["prelu1"])
            f = _glob_ln(f, blk["norm1"])
            f = _conv1d(f, blk["dconv"], padding=dilation, dilation=dilation, groups=cfg.msk_num_hidden_feats)
            f = _prelu1(f, blk["prelu2"])
            f = _glob_ln(f, blk["norm2"])
            if "res_out" in blk:
                h = h + _conv1d(f, blk["res_out"])
            skip_sum = skip_sum + _conv1d(f, blk["skip_out"])

    out = _prelu1(skip_sum, params["output_prelu"])
    out = _conv1d(out, params["output_conv"])
    out = jax.nn.sigmoid(out) if cfg.msk_activate == "sigmoid" else jax.nn.relu(out)
    mask = out.reshape(b, cfg.num_sources, cfg.enc_num_feats, -1)

    masked = mask * feats[:, None]  # [B, S, F, M]
    masked = masked.reshape(b * cfg.num_sources, cfg.enc_num_feats, -1)
    decoded = _conv_transpose1d(masked, params["decoder"], stride=cfg.enc_stride, padding=cfg.enc_stride)
    out = decoded.reshape(b, cfg.num_sources, t_pad)
    if num_pads > 0:
        out = out[..., :-num_pads]
    return out


def conv_tasnet_base(num_sources: int = 2) -> ConvTasNetConfig:
    """Highest-SI-SNR configuration (modeling_conv_tasnet.py:307-330)."""
    return ConvTasNetConfig(
        num_sources=num_sources,
        enc_kernel_size=16,
        enc_num_feats=512,
        msk_kernel_size=3,
        msk_num_feats=128,
        msk_num_hidden_feats=512,
        msk_num_layers=8,
        msk_num_stacks=3,
        msk_activate="relu",
    )


def build(seed: int = 0, base: bool = False, **model_args):
    cfg = conv_tasnet_base(**model_args) if base else ConvTasNetConfig(**model_args)
    params = conv_tasnet_init(jax.random.PRNGKey(seed), cfg)
    return {
        "config": cfg,
        "apply": lambda c, p, s, x, train=False: {
            "enhanced_y": conv_tasnet_apply(c, p, x),
            "all_layer_outputs": [],
            "state": s,
        },
        "params": params,
        "state": {},
    }
