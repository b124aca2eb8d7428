"""Loss functions, numerically matching reference audiozen/loss.py."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..dsp.spectral import stft_complex

Array = jax.Array

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def si_snr(input: Array, target: Array, eps: Optional[float] = None) -> Array:
    """Scale-invariant SNR in dB, mean over batch (SISNRLoss, loss.py:11-40)."""
    if input.shape != target.shape:
        raise ValueError(f"Shape mismatch: {input.shape} vs {target.shape}")
    if eps is None:
        eps = float(jnp.finfo(input.dtype).eps) if input.dtype in (jnp.float32, jnp.float64) else _F32_EPS

    s_input = input - jnp.mean(input, axis=-1, keepdims=True)
    s_target = target - jnp.mean(target, axis=-1, keepdims=True)

    dot = jnp.sum(s_target * s_input, axis=-1, keepdims=True)
    norm = jnp.sum(s_target**2, axis=-1, keepdims=True)
    proj = dot * s_target / norm
    e_noise = s_input - proj
    ratio = jnp.sum(proj**2, axis=-1) / (jnp.sum(e_noise**2, axis=-1) + eps)
    return jnp.mean(10.0 * jnp.log10(ratio + eps))


def si_snr_loss(input: Array, target: Array) -> Array:
    """Negated SI-SNR (SISNRLoss(return_neg=True))."""
    return -si_snr(input, target)


def _loss_stft(y: Array, win: int, stride: int, normalized: bool = False) -> Array:
    """torch.stft defaults used by freq/mag MAE: center=True, REFLECT pad
    (loss.py:139-152 passes no pad_mode), win_length = n_fft."""
    return stft_complex(
        y.reshape(-1, y.shape[-1]),
        n_fft=win,
        hop_length=stride,
        win_length=win,
        pad_mode="reflect",
        normalized=normalized,
    )


def freq_mae(estimation: Array, target: Array, win: int = 2048, stride: int = 512) -> Array:
    """L1 on real+imag STFT coefficients (loss.py:138-155)."""
    est = _loss_stft(estimation, win, stride)
    ref = _loss_stft(target, win, stride)
    return jnp.abs(est.real - ref.real).mean() + jnp.abs(est.imag - ref.imag).mean()


def mag_mae(estimation: Array, target: Array, win: int = 2048, stride: int = 512) -> Array:
    """L1 on STFT magnitudes (loss.py:167-190)."""
    est = _loss_stft(estimation, win, stride)
    ref = _loss_stft(target, win, stride)
    return jnp.abs(jnp.abs(est) - jnp.abs(ref)).mean()


def multi_res_spec_loss(
    est: Array,
    target: Array,
    n_ffts: Sequence[int],
    gamma: float = 1.0,
    factor: float = 1.0,
    f_complex: Optional[float] = None,
) -> Array:
    """Multi-resolution spectrogram loss (MultiResSpecLoss, loss.py:59-112).

    Uses normalized STFTs (hop = n_fft//4), compressed magnitudes |Y|^gamma,
    MSE on magnitudes and optionally on phase-preserving complex values.
    """
    eps = float(jnp.finfo(est.dtype).eps) if est.dtype in (jnp.float32, jnp.float64) else _F32_EPS
    loss = jnp.zeros((), est.dtype)
    for n_fft in n_ffts:
        y = stft_complex(est, n_fft, n_fft // 4, n_fft, pad_mode="reflect", normalized=True)
        s = stft_complex(target, n_fft, n_fft // 4, n_fft, pad_mode="reflect", normalized=True)
        y_abs, s_abs = jnp.abs(y), jnp.abs(s)
        if gamma != 1.0:
            y_abs = jnp.clip(y_abs, eps, None) ** gamma
            s_abs = jnp.clip(s_abs, eps, None) ** gamma
        loss = loss + jnp.mean((y_abs - s_abs) ** 2) * factor
        if f_complex is not None:
            if gamma != 1.0:
                y = y_abs * jnp.exp(1j * jnp.angle(y))
                s = s_abs * jnp.exp(1j * jnp.angle(s))
            sq = (y.real - s.real) ** 2 + (y.imag - s.imag) ** 2
            # torch's view_as_real MSE averages over the trailing (re, im) axis
            loss = loss + jnp.mean(sq) / 2.0 * f_complex
    return loss


def l1_loss(input: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(input - target))


def mse_loss(input: Array, target: Array) -> Array:
    return jnp.mean((input - target) ** 2)


def combine_loss(
    input: Array,
    target: Array,
    n_ffts: Sequence[int],
    gamma: float = 1.0,
    factor: float = 1.0,
    f_complex: Optional[float] = None,
) -> Array:
    """MultiResSpec + L1 (CombineLoss, loss.py:115-135)."""
    return multi_res_spec_loss(input, target, n_ffts, gamma, factor, f_complex) + l1_loss(input, target)
