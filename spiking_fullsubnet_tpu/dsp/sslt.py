"""Sound-source-localization coordinate transforms (reference audiozen/acoustics/sslt.py)."""

from __future__ import annotations

import jax.numpy as jnp


def cart2sph(cart, include_r: bool = False):
    """Cartesian [B, 2|3, T] -> spherical, matching reference sslt.py:5-46.

    3D: [x, y, z] -> (theta, phi[, r]); 2D: [x, y] -> phi (or (phi, r)).
    """
    _, num_coordinates, _ = cart.shape
    assert num_coordinates in (2, 3), "Only support 2D or 3D coordinates."

    radius = jnp.sqrt(jnp.sum(jnp.square(cart), axis=1))
    phi = jnp.arctan2(cart[:, 1, :], cart[:, 0, :])

    if num_coordinates == 2:
        return jnp.stack((phi, radius), axis=-1) if include_r else phi
    theta = jnp.arccos(cart[:, 2, :] / radius)
    if include_r:
        return jnp.stack((theta, phi, radius), axis=-1)
    return jnp.stack((theta, phi), axis=-1)


def sph2cart(sph):
    """Spherical [B, 1|2, T] -> unit cartesian, matching reference sslt.py:48-82."""
    _, num_coordinates, _ = sph.shape
    assert num_coordinates in (1, 2), "Only support 1D or 2D coordinates now."

    if num_coordinates == 1:
        return jnp.stack((jnp.cos(sph[:, 0, :]), jnp.sin(sph[:, 0, :])), axis=1)
    x = jnp.sin(sph[:, 0, :]) * jnp.cos(sph[:, 1, :])
    y = jnp.sin(sph[:, 0, :]) * jnp.sin(sph[:, 1, :])
    z = jnp.cos(sph[:, 0, :])
    return jnp.stack((x, y, z), axis=1)
