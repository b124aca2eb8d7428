"""Deep filtering: complex FIR filter along time, per frequency bin.

TPU-native re-design of the reference deepfiltering ops
(modeling_spiking_fullsubnet.py:315-346 and freeze-phase
model_low_freq.py:15-39). The reference pads + unfolds the complex
spectrogram then einsums; here the causal taps are built by static shifted
slices (order <= 5), and the complex contraction is one einsum that XLA maps
onto the MXU/VPU directly. Complex dtype is used end-to-end; XLA decomposes
it into fused real arithmetic on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange


def _time_unfold(spec, order: int):
    """[..., T] complex -> [..., T, order] causal taps (t-order+1 .. t)."""
    if order == 1:
        return spec[..., None]
    padded = jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(order - 1, 0)])
    T = spec.shape[-1]
    taps = [padded[..., d : d + T] for d in range(order)]
    return jnp.stack(taps, axis=-1)  # [..., T, order]


def deep_filter(complex_spec, coef, order: int, num_spks: int):
    """Multi-speaker deep filtering (modeling_spiking_fullsubnet.py:315-346).

    Args:
        complex_spec: [B, C, F, T] complex.
        coef: [B, C*order, S, F, T, 2] real/imag coefficient tensor.

    Returns:
        [B, C, S, F, T] complex.
    """
    spec_taps = _time_unfold(complex_spec, order)  # [B, C, F, T, df]
    complex_coef = coef[..., 0] + 1j * coef[..., 1]
    complex_coef = rearrange(complex_coef, "b (c df) s f t -> b c df s f t", df=order)
    # out[b,c,s,f,t] = sum_d spec[b,c,f,t,d] * coef[b,c,d,s,f,t]
    return jnp.einsum("bcftd,bcdsft->bcsft", spec_taps, complex_coef)


def deep_filter_single(complex_spec, coefs, frame_size: int):
    """Single-speaker deep filtering (freeze-phase model_low_freq.py:15-39).

    Args:
        complex_spec: [B, C, F, T] complex.
        coefs: [B, C*frame_size, F, T, 2].

    Returns:
        [B, C, F, T] complex.
    """
    spec_taps = _time_unfold(complex_spec, frame_size)  # [B, C, F, T, df]
    complex_coefs = coefs[..., 0] + 1j * coefs[..., 1]
    complex_coefs = rearrange(complex_coefs, "b (c df) f t -> b c df f t", df=frame_size)
    return jnp.einsum("bcftd,bcdft->bcft", spec_taps, complex_coefs)
