"""Complex ideal ratio mask (cIRM) utilities.

JAX re-design of reference audiozen/acoustics/audio_feature.py:432-489.
All functions are pure jnp and differentiable, usable inside jitted steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = float(jnp.finfo(jnp.float64).eps)  # matches np.finfo(float).eps in the reference


def build_complex_ideal_ratio_mask(noisy_real, noisy_imag, clean_real, clean_imag):
    """Compressed cIRM from noisy/clean STFTs -> [..., 2] (audio_feature.py:432-452)."""
    denominator = jnp.square(noisy_real) + jnp.square(noisy_imag) + EPSILON
    mask_real = (noisy_real * clean_real + noisy_imag * clean_imag) / denominator
    mask_imag = (noisy_real * clean_imag - noisy_imag * clean_real) / denominator
    mask = jnp.stack((mask_real, mask_imag), axis=-1)
    return compress_cirm(mask, k=10.0, c=0.1)


def compress_cirm(mask, k=10.0, c=0.1):
    """Compress cIRM from (-inf, inf) to (-k, k) (audio_feature.py:455-467)."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return k * (1.0 - jnp.exp(-c * mask)) / (1.0 + jnp.exp(-c * mask))


def decompress_cirm(mask, k=10.0, limit=9.9):
    """Inverse of :func:`compress_cirm` (audio_feature.py:470-483)."""
    mask = jnp.clip(mask, -limit, limit)
    return -k * jnp.log((k - mask) / (k + mask))


def complex_mul(noisy_r, noisy_i, mask_r, mask_i):
    """(a+bi)(c+di) expressed on real/imag planes (audio_feature.py:486-489)."""
    r = noisy_r * mask_r - noisy_i * mask_i
    i = noisy_r * mask_i + noisy_i * mask_r
    return r, i


def drop_band(x, num_groups: int = 2):
    """FullSubNet frequency-subsampling complexity trick (audio_feature.py:534-567).

    x: [B, C, F, T]. Keeps every num_groups-th frequency per sample group.
    """
    batch_size, _, num_freqs, _ = x.shape
    if num_groups <= 1:
        return x
    if batch_size <= num_groups:
        raise ValueError(f"Batch size ({batch_size}) must exceed num_groups ({num_groups}).")
    if num_freqs % num_groups != 0:
        x = x[..., : num_freqs - (num_freqs % num_groups), :]
    out = []
    for g in range(num_groups):
        sel = x[g::num_groups]
        out.append(sel[:, :, g::num_groups, :])
    return jnp.concatenate(out, axis=0)
