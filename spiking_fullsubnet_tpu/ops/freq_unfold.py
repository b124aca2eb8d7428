"""Frequency-axis unfolding into overlapping sub-band units.

Re-design of SubbandModel._freq_unfold (modeling_spiking_fullsubnet.py:265-312;
identical logic in freeze-phase model_low_freq.py:350-431). The reference uses
reflect-pad + F.unfold with a [kernel, T] window; since the time axis is never
actually folded, the op is purely a strided gather along frequency, which XLA
compiles to a single gather/reshape — no data duplication across time.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_unfold(
    x,
    lower_cutoff_freq: int,
    upper_cutoff_freq: int,
    ctr_freq: int,
    nbr_freq: int,
):
    """Unfold a frequency section into sub-band units.

    Args:
        x: [B, C, F, T] spectrogram features (C == 1).
        lower_cutoff_freq / upper_cutoff_freq: section boundaries (bins).
        ctr_freq: center width per sub-band unit (also the stride).
        nbr_freq: neighbor bins on each side.

    Returns:
        [B, N, C, ctr_freq + 2*nbr_freq, T] with N = section_width / ctr_freq.
    """
    b, c, num_freqs, t = x.shape
    if c != 1:
        raise ValueError("Only mono audio is supported.")
    section = upper_cutoff_freq - lower_cutoff_freq
    if section % ctr_freq != 0:
        raise ValueError(
            f"Section width must be divisible by ctr_freq: "
            f"{ctr_freq=}, {upper_cutoff_freq=}, {lower_cutoff_freq=}"
        )

    if lower_cutoff_freq == 0:
        valid = x[..., : upper_cutoff_freq + nbr_freq, :]
        if nbr_freq > 0:
            valid = jnp.pad(valid, ((0, 0), (0, 0), (nbr_freq, 0), (0, 0)), mode="reflect")
    elif upper_cutoff_freq == num_freqs:
        valid = x[..., lower_cutoff_freq - nbr_freq :, :]
        if nbr_freq > 0:
            valid = jnp.pad(valid, ((0, 0), (0, 0), (0, nbr_freq), (0, 0)), mode="reflect")
    else:
        valid = x[..., lower_cutoff_freq - nbr_freq : upper_cutoff_freq + nbr_freq, :]

    n = section // ctr_freq
    width = ctr_freq + 2 * nbr_freq
    idx = jnp.arange(n)[:, None] * ctr_freq + jnp.arange(width)[None, :]  # [N, width]
    out = valid[:, :, idx, :]  # [B, C, N, width, T]
    return jnp.transpose(out, (0, 2, 1, 3, 4))  # [B, N, C, width, T]


def freq_unfold_per_bin(x, num_neighbors: int):
    """Per-bin neighbor unfold (BaseModel.freq_unfold, base_model.py:14-46).

    x: [B, C, F, T] -> [B, N=F, C, 2*num_neighbors+1, T] with reflect padding
    at the spectrum edges; each frequency bin becomes one sub-band unit.
    """
    b, c, f, t = x.shape
    if num_neighbors <= 0:
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, f, c, 1, t)
    padded = jnp.pad(x, ((0, 0), (0, 0), (num_neighbors, num_neighbors), (0, 0)), mode="reflect")
    width = 2 * num_neighbors + 1
    idx = jnp.arange(f)[:, None] + jnp.arange(width)[None, :]  # [F, width]
    out = padded[:, :, idx, :]  # [B, C, F, width, T]
    return jnp.transpose(out, (0, 2, 1, 3, 4))  # [B, F, C, width, T]
