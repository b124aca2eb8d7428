"""Generic sequence/conv building blocks (reference audiozen/models/module/).

These are the reference's research spares — only module/sequence_model.py is
on any recipe's main path (SURVEY.md §2a). Implemented here as functional
JAX equivalents with the same vocabulary:

- cLN (cumulative layer norm), DepthConv1d, TCNEstimator   (tcn_block.py)
- causal conv/deconv blocks                                 (causal_conv.py)
- TransformAverageConcatenate (TAC)                         (tac.py)
- ResidualLSTM                                              (res_lstm.py)
- CumulativeMagSpectralNorm / cumulative_norm               (feature_norm.py)
- GroupedLinear, SharedGroupGRU                             (groupGRU.py)
- LayerNormLSTM                                             (custom_lstm.py)
- MogrifierLSTM                                             (mogrifier_lstm.py)
- causal conformer convolution block                        (causal_conformer_conv.py)
- complex MVDR helpers                                      (module/utils.py)

Note: the reference's `cruse.py` (grouped-GRU UNet) and `narrow_band_rnn.py`
are non-functional prototypes in the snapshot (undefined attrs / discarded
matmuls); their intent (grouped recurrences over sub-bands) is covered by
SharedGroupGRU here and the sub-band fold in the flagship model.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..dsp.mask import EPSILON
from ..nn.core import layer_norm_apply, layer_norm_init, linear_apply, linear_init, uniform
from ..ops.rnn import gru_init, gru_apply, lstm_init, lstm_apply

Array = jax.Array


# ------------------------------------------------------------------ norms


def cumulative_layer_norm_affine(x: Array, gain: Array, bias: Array, eps: float = EPSILON) -> Array:
    """cLN (tcn_block.py:13-54): causal layer norm over (C, t<=T) with affine.

    x: [B, C, T]; gain/bias: [C].
    """
    b, c, t = x.shape
    step_sum = jnp.sum(x, axis=1)
    step_pow = jnp.sum(jnp.square(x), axis=1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    cum_pow = jnp.cumsum(step_pow, axis=-1)
    cnt = jnp.arange(c, c * (t + 1), c, dtype=x.dtype)[None, :]
    mean = cum_sum / cnt
    var = (cum_pow - 2 * mean * cum_sum) / cnt + mean**2
    std = jnp.sqrt(var + eps)
    xn = (x - mean[:, None, :]) / std[:, None, :]
    return xn * gain[None, :, None] + bias[None, :, None]


def cumulative_mag_spectral_norm(
    x: Array, cumulative: bool = False, use_mid_freq_mu: bool = False, eps: float = EPSILON
) -> Array:
    """CumulativeMagSpectralNorm (feature_norm.py:52-111). x: [B, C, F, T]."""
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    if use_mid_freq_mu:
        step = xr[:, int(f // 2 - 1), :]
    else:
        step = jnp.mean(xr, axis=1)
    if cumulative:
        cnt = jnp.arange(1, t + 1, dtype=x.dtype)[None, :]
        mu = (jnp.cumsum(step, axis=-1) / cnt)[:, None, :]
    else:
        mu = jnp.mean(step, axis=-1)[:, None, None]
    return (xr / (mu + eps)).reshape(b, c, f, t)


def cumulative_norm(x: Array) -> Array:
    """cumulative_norm (feature_norm.py:7-49): causal zero-norm of [B, C, F, T]."""
    from ..dsp.feature_norm import cumulative_layer_norm

    return cumulative_layer_norm(x)


# ------------------------------------------------------------------ TCN


def depth_conv1d_init(rng, input_channel, hidden_channel, kernel, causal=False, skip=True, dtype=jnp.float32):
    """DepthConv1d params (tcn_block.py:57-115)."""
    ks = jax.random.split(rng, 4)

    def conv_init(k, out_ch, in_ch_g, width):
        bound = 1.0 / math.sqrt(in_ch_g * width)
        kk = jax.random.split(k)
        return {
            "weight": uniform(kk[0], (out_ch, in_ch_g, width), bound, dtype),
            "bias": uniform(kk[1], (out_ch,), bound, dtype),
        }

    p = {
        "conv1d": conv_init(ks[0], hidden_channel, input_channel, 1),
        "dconv1d": conv_init(ks[1], hidden_channel, 1, kernel),
        "res_out": conv_init(ks[2], input_channel, hidden_channel, 1),
        "prelu1": jnp.full((1,), 0.25, dtype),
        "prelu2": jnp.full((1,), 0.25, dtype),
        "reg1": {"gain": jnp.ones((hidden_channel,), dtype), "bias": jnp.zeros((hidden_channel,), dtype)},
        "reg2": {"gain": jnp.ones((hidden_channel,), dtype), "bias": jnp.zeros((hidden_channel,), dtype)},
    }
    if skip:
        p["skip_out"] = conv_init(ks[3], input_channel, hidden_channel, 1)
    return p


def _conv1d(x, p, padding=0, dilation=1, groups=1):
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + p["bias"][None, :, None]


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def _gln(x, p, eps=EPSILON):
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gain"][None, :, None] + p["bias"][None, :, None]


def depth_conv1d_apply(p, x, kernel, dilation=1, padding=0, causal=False, skip=True):
    """(residual, skip) or residual (tcn_block.py:100-115). x: [B, C, T]."""
    h = _conv1d(x, p["conv1d"])
    h = _prelu(h, p["prelu1"])
    h = cumulative_layer_norm_affine(h, p["reg1"]["gain"], p["reg1"]["bias"]) if causal else _gln(h, p["reg1"])
    pad = (kernel - 1) * dilation if causal else padding
    hidden = h.shape[1]
    h = _conv1d(h, p["dconv1d"], padding=pad, dilation=dilation, groups=hidden)
    if causal and pad > 0:
        h = h[:, :, :-pad]
    h = _prelu(h, p["prelu2"])
    h = cumulative_layer_norm_affine(h, p["reg2"]["gain"], p["reg2"]["bias"]) if causal else _gln(h, p["reg2"])
    residual = _conv1d(h, p["res_out"])
    if skip:
        return residual, _conv1d(h, p["skip_out"])
    return residual


def tcn_estimator_init(rng, input_dim, output_dim, bn_dim, hidden_dim, layer=8, stack=3, kernel=3, causal=True, dtype=jnp.float32):
    """TCNEstimator (tcn_block.py:117-216)."""
    n = stack * layer
    ks = jax.random.split(rng, n + 2)
    params = {
        "LN": {"gain": jnp.ones((input_dim,), dtype), "bias": jnp.zeros((input_dim,), dtype)},
        "BN": {
            "weight": uniform(ks[0], (bn_dim, input_dim, 1), 1.0 / math.sqrt(input_dim), dtype),
            "bias": jnp.zeros((bn_dim,), dtype),
        },
        "TCN": [
            depth_conv1d_init(ks[1 + i], bn_dim, hidden_dim, kernel, causal=causal, dtype=dtype)
            for i in range(n)
        ],
        "output": {
            "weight": uniform(ks[-1], (output_dim, bn_dim, 1), 1.0 / math.sqrt(bn_dim), dtype),
            "bias": jnp.zeros((output_dim,), dtype),
        },
    }
    return params


def tcn_estimator_apply(params, x, layer=8, stack=3, kernel=3, causal=True, dilated=True):
    """x: [B, N, T] -> [B, output_dim, T]."""
    if causal:
        h = cumulative_layer_norm_affine(x, params["LN"]["gain"], params["LN"]["bias"])
    else:
        h = _gln(x, params["LN"])
    h = _conv1d(h, params["BN"])
    skip_sum = 0.0
    idx = 0
    for s in range(stack):
        for i in range(layer):
            d = 2**i if dilated else 1
            residual, skip = depth_conv1d_apply(
                params["TCN"][idx], h, kernel, dilation=d, padding=d, causal=causal, skip=True
            )
            h = h + residual
            skip_sum = skip_sum + skip
            idx += 1
    return _conv1d(skip_sum, params["output"])


# ------------------------------------------------------------------ TAC


def tac_init(rng, input_size, hidden_size, dtype=jnp.float32):
    """TransformAverageConcatenate (tac.py:9-54)."""
    ks = jax.random.split(rng, 3)
    return {
        "transform": linear_init(ks[0], input_size, hidden_size, dtype=dtype),
        "average": linear_init(ks[1], hidden_size, hidden_size, dtype=dtype),
        "output": linear_init(ks[2], hidden_size * 2, input_size, dtype=dtype),
        "norm": {"gain": jnp.ones((input_size,), dtype), "bias": jnp.zeros((input_size,), dtype)},
    }


def tac_apply(params, x: Array) -> Array:
    """x: [B, G, F, T] -> [B, G, F, T] with cross-group information exchange."""
    b, g, f, t = x.shape
    h = x.reshape(b * g, f, t)
    h = _gln(h, params["norm"]).reshape(b, g, f, t)

    h = jnp.transpose(h, (0, 3, 1, 2))  # [B, T, G, F]
    group = jax.nn.gelu(linear_apply(params["transform"], h))  # [B, T, G, H]
    mean = jax.nn.gelu(linear_apply(params["average"], jnp.mean(group, axis=2)))  # [B, T, H]
    mean = jnp.broadcast_to(mean[:, :, None, :], group.shape)
    out = jax.nn.gelu(linear_apply(params["output"], jnp.concatenate([group, mean], axis=-1)))
    return x + jnp.transpose(out, (0, 2, 3, 1))


# ------------------------------------------------------------------ ResidualLSTM


def residual_lstm_init(rng, input_size, output_size, hidden_size, dtype=jnp.float32):
    """ResidualLSTM (res_lstm.py:9-33)."""
    ks = jax.random.split(rng, 4)
    return {
        "in_conv": {"weight": uniform(ks[0], (hidden_size, input_size, 1), 1.0 / math.sqrt(input_size), dtype)},
        "lstm_1": lstm_init(ks[1], hidden_size, hidden_size, 1, dtype=dtype),
        "lstm_2": lstm_init(ks[2], hidden_size, hidden_size, 1, dtype=dtype),
        "linear": linear_init(ks[3], hidden_size, output_size, dtype=dtype),
        "norm_1": layer_norm_init(hidden_size, dtype),
        "norm_2": layer_norm_init(output_size, dtype),
    }


def residual_lstm_apply(params, x, hidden_size, use_activation=True):
    """x: [B, F, T] -> [B, output_size, T]."""
    h = jax.lax.conv_general_dilated(
        x, params["in_conv"]["weight"], (1,), [(0, 0)], dimension_numbers=("NCH", "OIH", "NCH")
    )
    h = jnp.transpose(h, (2, 0, 1))  # [T, B, H]
    h = h + layer_norm_apply(params["norm_1"], lstm_apply(params["lstm_1"], h, hidden_size))
    h = h + layer_norm_apply(params["norm_1"], lstm_apply(params["lstm_2"], h, hidden_size))
    h = layer_norm_apply(params["norm_2"], linear_apply(params["linear"], h))
    if use_activation:
        h = jax.nn.relu(h)
    return jnp.transpose(h, (1, 2, 0))


# ------------------------------------------------------------------ grouped layers


def grouped_linear_init(rng, input_size, hidden_size, groups=1, dtype=jnp.float32):
    """GroupedLinear (groupGRU.py:405-440): per-group weight [G, I/G, H/G]."""
    assert input_size % groups == 0 and hidden_size % groups == 0
    ws = input_size // groups
    return {
        "weight": jax.random.normal(rng, (groups, ws, hidden_size // groups), dtype)
        * math.sqrt(2.0 / ws)
    }


def grouped_linear_apply(params, x: Array, groups: int) -> Array:
    """x: [..., I] -> [..., H] with block-diagonal weight."""
    *lead, i = x.shape
    xg = x.reshape(-1, groups, i // groups)
    out = jnp.einsum("bgi,gih->bgh", xg, params["weight"])
    return out.reshape(*lead, -1)


def shared_group_gru_init(rng, input_size, hidden_size, num_layers=1, num_groups=4, dtype=jnp.float32):
    """SharedGroupGRU (groupGRU.py:99-206): one GRU shared across G groups per
    layer, with channel shuffle between layers."""
    keys = jax.random.split(rng, num_layers)
    assert input_size % num_groups == 0 and hidden_size % num_groups == 0
    layers = []
    for li, k in enumerate(keys):
        in_size = (input_size if li == 0 else hidden_size) // num_groups
        layers.append(gru_init(k, in_size, hidden_size // num_groups, 1, dtype=dtype))
    return {"layers": layers}


def shared_group_gru_apply(params, x: Array, hidden_size: int, num_groups: int) -> Array:
    """x: [T, B, I] -> [T, B, H]; groups share weights via batch fold."""
    t, b, _ = x.shape
    h = x
    for li, layer in enumerate(params["layers"]):
        i = h.shape[-1]
        hg = h.reshape(t, b, num_groups, i // num_groups)
        hg = jnp.transpose(hg, (0, 2, 1, 3)).reshape(t, num_groups * b, i // num_groups)
        out = gru_apply(layer, hg, hidden_size // num_groups)
        out = out.reshape(t, num_groups, b, -1)
        # channel shuffle (groupGRU.py interleaves groups between layers)
        out = jnp.transpose(out, (0, 2, 3, 1)).reshape(t, b, -1)
        h = out
    return h


# ------------------------------------------------------------------ LayerNormLSTM


def layer_norm_lstm_init(rng, input_size, hidden_size, num_layers=1, dtype=jnp.float32):
    """LayerNormLSTM (custom_lstm.py:71-220): LN on gate pre-activations and cell."""
    keys = jax.random.split(rng, num_layers)
    layers = []
    for li, k in enumerate(keys):
        in_size = input_size if li == 0 else hidden_size
        k1, k2 = jax.random.split(k)
        stdv = 1.0 / math.sqrt(hidden_size)
        layers.append(
            {
                "weight_ih": uniform(k1, (4 * hidden_size, in_size), stdv, dtype),
                "weight_hh": uniform(k2, (4 * hidden_size, hidden_size), stdv, dtype),
                "ln_ih": layer_norm_init(4 * hidden_size, dtype),
                "ln_hh": layer_norm_init(4 * hidden_size, dtype),
                "ln_cell": layer_norm_init(hidden_size, dtype),
            }
        )
    return {"layers": layers}


def layer_norm_lstm_apply(params, x: Array, hidden_size: int) -> Array:
    """x: [T, B, F] -> [T, B, H]."""
    H = hidden_size
    out = x
    for layer in params["layers"]:
        T, B, F = out.shape
        xg = layer_norm_apply(layer["ln_ih"], out.reshape(T * B, F) @ layer["weight_ih"].T).reshape(T, B, 4 * H)

        def step(carry, xt):
            h, c = carry
            hg = layer_norm_apply(layer["ln_hh"], h @ layer["weight_hh"].T)
            g = xt + hg
            i = jax.nn.sigmoid(g[:, :H])
            f = jax.nn.sigmoid(g[:, H : 2 * H])
            gg = jnp.tanh(g[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(g[:, 3 * H :])
            c = layer_norm_apply(layer["ln_cell"], f * c + i * gg)
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, H), x.dtype)
        _, out = jax.lax.scan(step, (h0, h0), xg)
    return out


# ------------------------------------------------------------------ MogrifierLSTM


def mogrifier_lstm_init(rng, input_size, hidden_size, mogrify_steps=5, dtype=jnp.float32):
    """MogrifierLSTM (mogrifier_lstm.py): x/h mutual gating before an LSTM cell."""
    ks = jax.random.split(rng, mogrify_steps + 1)
    mog = []
    for i in range(mogrify_steps):
        if i % 2 == 0:  # update x from h
            mog.append(linear_init(ks[i], hidden_size, input_size, dtype=dtype))
        else:  # update h from x
            mog.append(linear_init(ks[i], input_size, hidden_size, dtype=dtype))
    return {"mogrify": mog, "lstm": lstm_init(ks[-1], input_size, hidden_size, 1, dtype=dtype)}


def mogrifier_lstm_apply(params, x: Array, hidden_size: int, mogrify_steps: int = 5) -> Array:
    """x: [T, B, F] -> [T, B, H] (single layer)."""
    H = hidden_size
    layer = params["lstm"]["layers"][0]["fwd"]
    T, B, F = x.shape

    def step(carry, xt):
        h, c = carry
        for i, lin in enumerate(params["mogrify"]):
            if i % 2 == 0:
                xt = 2 * jax.nn.sigmoid(linear_apply(lin, h)) * xt
            else:
                h = 2 * jax.nn.sigmoid(linear_apply(lin, xt)) * h
        g = xt @ layer["weight_ih"].T + layer["bias_ih"] + h @ layer["weight_hh"].T + layer["bias_hh"]
        i_g = jax.nn.sigmoid(g[:, :H])
        f_g = jax.nn.sigmoid(g[:, H : 2 * H])
        g_g = jnp.tanh(g[:, 2 * H : 3 * H])
        o_g = jax.nn.sigmoid(g[:, 3 * H :])
        c = f_g * c + i_g * g_g
        h = o_g * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    _, out = jax.lax.scan(step, (h0, h0), x)
    return out


# ------------------------------------------------------------------ conformer conv


def causal_conformer_conv_init(rng, channels, kernel_size=15, dtype=jnp.float32):
    """Causal conformer convolution module (causal_conformer_conv.py):
    LN -> pointwise(2C) -> GLU -> causal depthwise -> BN(->here LN) -> swish -> pointwise."""
    ks = jax.random.split(rng, 3)
    return {
        "ln": layer_norm_init(channels, dtype),
        "pw1": {"weight": uniform(ks[0], (2 * channels, channels, 1), 1.0 / math.sqrt(channels), dtype), "bias": jnp.zeros((2 * channels,), dtype)},
        "dw": {"weight": uniform(ks[1], (channels, 1, kernel_size), 1.0 / math.sqrt(kernel_size), dtype), "bias": jnp.zeros((channels,), dtype)},
        "norm": {"gain": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)},
        "pw2": {"weight": uniform(ks[2], (channels, channels, 1), 1.0 / math.sqrt(channels), dtype), "bias": jnp.zeros((channels,), dtype)},
    }


def causal_conformer_conv_apply(params, x: Array, kernel_size: int = 15) -> Array:
    """x: [B, C, T] -> [B, C, T], causal."""
    b, c, t = x.shape
    h = layer_norm_apply(params["ln"], jnp.transpose(x, (0, 2, 1)))
    h = jnp.transpose(h, (0, 2, 1))
    h = _conv1d(h, params["pw1"])
    a, g = jnp.split(h, 2, axis=1)
    h = a * jax.nn.sigmoid(g)  # GLU
    pad = kernel_size - 1
    h = _conv1d(h, params["dw"], padding=pad, groups=c)[:, :, :t]
    h = cumulative_layer_norm_affine(h, params["norm"]["gain"], params["norm"]["bias"])
    h = h * jax.nn.sigmoid(h)  # swish
    h = _conv1d(h, params["pw2"])
    return x + h


# ------------------------------------------------------------------ MVDR / complex helpers


def complex_outer(spec: Array) -> Array:
    """Per-(f, t) outer product for spatial covariance. spec: [B, C, F, T]."""
    return jnp.einsum("bcft,bdft->bcdft", spec, jnp.conj(spec))


def spatial_covariance(spec: Array, mask: Optional[Array] = None, eps: float = 1e-8) -> Array:
    """Mask-weighted spatial covariance matrix (module/utils.py MVDR helpers).

    spec: [B, C, F, T] complex; mask: [B, F, T] real. Returns [B, F, C, C].
    """
    if mask is None:
        mask = jnp.ones(spec.shape[0:1] + spec.shape[2:], spec.real.dtype)
    num = jnp.einsum("bft,bcft,bdft->bfcd", mask.astype(spec.dtype), spec, jnp.conj(spec))
    den = jnp.sum(mask, axis=-1)[..., None, None] + eps
    return num / den


def mvdr_weights(phi_speech: Array, phi_noise: Array, ref_channel: int = 0, eps: float = 1e-8) -> Array:
    """MVDR beamformer w = (Phi_n^-1 Phi_s / tr(Phi_n^-1 Phi_s)) e_ref.

    phi_*: [B, F, C, C] complex. Returns [B, F, C].
    """
    c = phi_noise.shape[-1]
    phi_noise = phi_noise + eps * jnp.eye(c, dtype=phi_noise.dtype)
    num = jnp.linalg.solve(phi_noise, phi_speech)  # [B, F, C, C]
    trace = jnp.trace(num, axis1=-2, axis2=-1)[..., None, None] + eps
    w = num / trace
    return w[..., ref_channel]


def apply_beamforming(spec: Array, weights: Array) -> Array:
    """spec: [B, C, F, T], weights: [B, F, C] -> [B, F, T]."""
    return jnp.einsum("bfc,bcft->bft", jnp.conj(weights), spec)
