"""SDNN (sigma-delta network with delays) behavior tests."""

import numpy as np

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.models.sdnn import (
    SDNNConfig,
    _apply_delay,
    _delta_encode,
    _sigma_decode,
    quantize,
    sdnn_apply,
    sdnn_init,
)


def test_quantize_ste():
    x = jnp.asarray(np.linspace(-1, 1, 11).astype(np.float32))
    q = quantize(x, 1 / 64)
    np.testing.assert_allclose(np.asarray(q), np.round(np.asarray(x) * 64) / 64, atol=1e-6)
    g = jax.grad(lambda v: jnp.sum(quantize(v, 1 / 64)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # straight-through


def test_sigma_delta_roundtrip():
    x = jnp.asarray(np.random.randn(20, 2, 8).astype(np.float32))
    d = _delta_encode(x, threshold=0.05)
    recon = _sigma_decode(d)
    # sigma(delta(x)) reconstructs within one threshold step
    assert float(jnp.max(jnp.abs(recon - x))) <= 0.05 + 1e-5
    # deltas are sparse-ish for slowly varying signals
    slow = jnp.asarray(np.cumsum(np.random.randn(50, 1, 4) * 0.001, 0).astype(np.float32))
    ds = _delta_encode(slow, threshold=0.05)
    assert float((ds != 0).mean()) < 0.5


def test_delay_shifts():
    x = jnp.asarray(np.random.randn(10, 1, 3).astype(np.float32))
    out = _apply_delay(x, jnp.asarray([0.0, 1.0, 2.0]), max_delay=4)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(x[:, :, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1:, :, 1]), np.asarray(x[:-1, :, 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, :, 1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2:, :, 2]), np.asarray(x[:-2, :, 2]), atol=1e-6)


def test_sdnn_forward_grad_causality():
    cfg = SDNNConfig(hidden_size=32, max_delay=4)
    params = sdnn_init(jax.random.PRNGKey(0), cfg)
    mag = jnp.abs(jnp.asarray(np.random.randn(2, 257, 40).astype(np.float32)))
    out = sdnn_apply(cfg, params, mag)
    assert out.shape == mag.shape
    assert np.all(np.asarray(out) >= 0)  # relu mask * nonneg mag

    g = jax.grad(lambda p: jnp.mean((sdnn_apply(cfg, p, mag) - 0.5 * mag) ** 2))(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(norms)) and sum(norms) > 0

    mag2 = mag.at[:, :, 30:].add(5.0)
    out2 = sdnn_apply(cfg, params, mag2)
    np.testing.assert_allclose(np.asarray(out[:, :, :30]), np.asarray(out2[:, :, :30]), atol=1e-5)
