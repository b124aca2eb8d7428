"""Permutation-invariant training (reference audiozen/pit.py).

The permutation set is static (num_sources <= ~4 in practice), so the best
permutation search is a fixed einsum over one-hot permutation matrices —
fully jittable, no data-dependent control flow.
"""

from __future__ import annotations

from itertools import permutations
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pairwise_neg_sisdr(est: Array, ref: Array, zero_mean: bool = True, eps: float = 1e-8) -> Array:
    """Pairwise negative SI-SDR matrix [B, n_est, n_ref] (pit.py:6-56)."""
    if ref.shape != est.shape or ref.ndim != 3:
        raise TypeError(f"Inputs must be [batch, n_src, time], got {ref.shape} and {est.shape}")
    if zero_mean:
        ref = ref - jnp.mean(ref, axis=2, keepdims=True)
        est = est - jnp.mean(est, axis=2, keepdims=True)
    s_est = est[:, :, None, :]  # [B, n_src, 1, T]
    s_ref = ref[:, None, :, :]  # [B, 1, n_src, T]
    dot = jnp.sum(s_est * s_ref, axis=3, keepdims=True)
    energy = jnp.sum(s_ref**2, axis=3, keepdims=True) + eps
    proj = dot * s_ref / energy
    e_noise = s_est - proj
    sdr = jnp.sum(proj**2, axis=3) / (jnp.sum(e_noise**2, axis=3) + eps)
    return -10.0 * jnp.log10(sdr + eps)


def find_best_perm(pair_wise_losses: Array) -> Tuple[Array, Array]:
    """Min-mean permutation via one-hot einsum (pit.py:63-94)."""
    num_sources = pair_wise_losses.shape[1]
    pwl = jnp.swapaxes(pair_wise_losses, -1, -2)  # dim1 = sources, dim2 = estimates
    perms = np.array(list(permutations(range(num_sources))), dtype=np.int64)  # [P, S]
    one_hot = np.zeros((len(perms), num_sources, num_sources), dtype=np.float32)
    for p, perm in enumerate(perms):
        one_hot[p, np.arange(num_sources), perm] = 1.0
    loss_set = jnp.einsum("bij,pij->bp", pwl, jnp.asarray(one_hot, pwl.dtype)) / num_sources
    min_loss_idx = jnp.argmin(loss_set, axis=1)
    min_loss = jnp.min(loss_set, axis=1)
    batch_indices = jnp.asarray(perms)[min_loss_idx]  # [B, S]
    return min_loss, batch_indices


def reorder_source(source: Array, batch_indices: Array) -> Array:
    """Reorder est sources per-batch by best permutation (pit.py:97-106)."""
    return jnp.take_along_axis(source, batch_indices[..., None], axis=1)


def pit_wrapper(
    loss_func: Callable[..., Array], est: Array, ref: Array, **kwargs
) -> Tuple[Array, Array]:
    """PITWrapper.__call__ (pit.py:108-124): returns (mean min loss, reordered est)."""
    pw = loss_func(est, ref, **kwargs)
    min_loss, batch_indices = find_best_perm(pw)
    return jnp.mean(min_loss), reorder_source(est, batch_indices)
