"""Parity tests for cIRM utilities and the feature-norm family vs reference math."""

import numpy as np
import torch

import jax.numpy as jnp

from spiking_fullsubnet_tpu.dsp import feature_norm, mask

EPS = np.finfo(float).eps


def test_cirm_roundtrip():
    nr, ni = np.random.randn(2, 257, 50), np.random.randn(2, 257, 50)
    cr, ci = np.random.randn(2, 257, 50), np.random.randn(2, 257, 50)
    m = mask.build_complex_ideal_ratio_mask(*(jnp.asarray(a) for a in (nr, ni, cr, ci)))
    assert m.shape == (2, 257, 50, 2)
    assert np.all(np.abs(np.asarray(m)) <= 10.0)

    # compress/decompress roundtrip inside the linear region
    x = jnp.asarray(np.random.uniform(-5, 5, size=(4, 8)))
    c = mask.compress_cirm(x)
    d = mask.decompress_cirm(c)
    np.testing.assert_allclose(np.asarray(d), np.asarray(x), atol=1e-6)


def test_cirm_matches_reference_formula():
    nr, ni = np.random.randn(2, 9, 7), np.random.randn(2, 9, 7)
    cr, ci = np.random.randn(2, 9, 7), np.random.randn(2, 9, 7)
    denom = nr**2 + ni**2 + EPS
    mr = (nr * cr + ni * ci) / denom
    mi = (nr * ci - ni * cr) / denom
    raw = np.stack([mr, mi], -1)
    raw = np.where(raw <= -100, -100.0, raw)
    ref = 10 * (1 - np.exp(-0.1 * raw)) / (1 + np.exp(-0.1 * raw))
    ours = np.asarray(mask.build_complex_ideal_ratio_mask(*(jnp.asarray(a) for a in (nr, ni, cr, ci))))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_drop_band():
    x = np.random.randn(6, 1, 32, 10).astype(np.float32)
    out = np.asarray(mask.drop_band(jnp.asarray(x), num_groups=2))
    assert out.shape == (6, 1, 16, 10)
    np.testing.assert_allclose(out[0], x[0][:, 0::2, :])
    np.testing.assert_allclose(out[3], x[1][:, 1::2, :])


def _ref_cumulative_laplace_norm(x):
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    cum = np.cumsum(xr.sum(1), -1)
    cnt = np.arange(f, f * t + 1, f, dtype=x.dtype).reshape(1, t)
    mean = cum / cnt
    return (xr / (mean[:, None, :] + EPS)).reshape(b, c, f, t)


def test_cumulative_laplace_norm():
    x = np.abs(np.random.randn(2, 1, 256, 40)).astype(np.float32)
    ours = np.asarray(feature_norm.cumulative_laplace_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, _ref_cumulative_laplace_norm(x), atol=1e-5, rtol=1e-5)


def test_offline_norms():
    x = np.abs(np.random.randn(2, 1, 64, 30)).astype(np.float64)
    ours = np.asarray(feature_norm.offline_laplace_norm(jnp.asarray(x)))
    ref = x / (x.mean(axis=(1, 2, 3), keepdims=True) + EPS)
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    oursg = np.asarray(feature_norm.offline_gaussian_norm(jnp.asarray(x)))
    tx = torch.from_numpy(x)
    mu = tx.mean(dim=[1, 2, 3], keepdim=True)
    std = tx.std(dim=[1, 2, 3], keepdim=True)
    refg = ((tx - mu) / (std + EPS)).numpy()
    np.testing.assert_allclose(oursg, refg, atol=1e-6)


def test_cumulative_layer_norm():
    x = np.abs(np.random.randn(2, 1, 64, 30)).astype(np.float64)
    b, c, f, t = x.shape
    xr = x.reshape(b * c, f, t)
    cum = np.cumsum(xr.sum(1), -1)
    cump = np.cumsum((xr**2).sum(1), -1)
    cnt = np.arange(f, f * t + 1, f, dtype=x.dtype).reshape(1, t)
    mean = cum / cnt
    var = (cump - 2 * mean * cum) / cnt + mean**2
    std = np.sqrt(var + EPS)
    ref = ((xr - mean[:, None, :]) / std[:, None, :]).reshape(b, c, f, t)
    ours = np.asarray(feature_norm.cumulative_layer_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _ref_forgetting_norm(x, sample_length=192):
    """Literal transcription of the reference Python loop (base_model.py:159-203)."""
    b, c, f, t = x.shape
    xr = x.reshape(b, c * f, t)
    alpha = (sample_length - 1) / (sample_length + 1)
    mu = np.zeros((b, 1))
    mus = []
    for i in range(t):
        m = xr[:, :, i].mean(axis=1).reshape(b, 1)
        alp = min((i - 1) / (i + 1), alpha) if i < sample_length else alpha
        mu = alp * mu + (1 - alp) * m
        mus.append(mu)
    mu = np.stack(mus, axis=-1)
    return (xr / (mu + EPS)).reshape(b, c, f, t)


def test_forgetting_norm():
    x = np.abs(np.random.randn(2, 1, 16, 50)).astype(np.float64)
    ours = np.asarray(feature_norm.forgetting_norm(jnp.asarray(x), sample_length=20))
    np.testing.assert_allclose(ours, _ref_forgetting_norm(x, 20), atol=1e-6, rtol=1e-6)


def test_hybrid_norm():
    x = np.abs(np.random.randn(2, 48, 60)).astype(np.float64)
    sample_length = 30
    # reference: forgetting warm-up for t < sample_length, cumulative mean after
    fg = _ref_forgetting_norm(x[:, None], sample_length)[:, 0]
    b, f, t = x.shape
    cum = np.cumsum(x.sum(1), -1)
    cnt = np.arange(f, f * t + 1, f, dtype=x.dtype).reshape(1, t)
    mean = cum / cnt
    mu_fg = x / fg - EPS  # recover mu from normalized output
    mu = np.where(np.arange(t)[None, :] < sample_length, (x[:, 0] / fg[:, 0]) - EPS, mean)
    ref = x / (mu[:, None, :] + EPS)
    ours = np.asarray(feature_norm.hybrid_norm(jnp.asarray(x), sample_length))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
