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
        coef: [B, C*order, S, F, T, 2] real/imag coefficient tensor (any real
            float dtype; bf16 coefficients upcast inside the multiply, so the
            HBM read stays half-width under the mixed-precision policy).

    Returns:
        [B, C, S, F, T] complex.

    out[b,c,s,f,t] = sum_d taps[b,c,f,t,d] * coef[b,c,d,s,f,t] with causal
    taps taps[..., d] = spec[..., t - order + 1 + d]. Implemented as `order`
    shifted multiply-adds instead of materializing the [.., T, order] tap
    tensor + einsum: at serving shapes (B=256, T=3750) the tap tensor is
    multi-GB and the einsum becomes pure HBM traffic; the shifted form is a
    single fused elementwise pass per tap.
    """
    complex_coef = rearrange(coef, "b (c df) s f t ri -> b c df s f t ri", df=order)
    T = complex_spec.shape[-1]
    padded = jnp.pad(complex_spec, [(0, 0)] * (complex_spec.ndim - 1) + [(order - 1, 0)])
    out = None
    for d in range(order):
        tap = padded[..., d : d + T][:, :, None]  # [B, C, 1, F, T]
        cd = complex_coef[:, :, d]
        term = tap * (cd[..., 0] + 1j * cd[..., 1])
        out = term if out is None else out + term
    return out


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
