"""Shape/behavior tests for the generic building-block library (modules.py)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.models import modules as M


def test_cln_matches_reference():
    """cLN parity vs the reference implementation (tcn_block.py:13-54)."""
    from reference_oracle import add_reference_to_path

    add_reference_to_path()
    from audiozen.models.module.tcn_block import cLN

    x = np.abs(np.random.randn(2, 16, 30)).astype(np.float32)
    ref_m = cLN(16)
    with torch.no_grad():
        ref = ref_m(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        M.cumulative_layer_norm_affine(jnp.asarray(x), jnp.ones(16), jnp.zeros(16))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cumulative_mag_spectral_norm():
    x = np.abs(np.random.randn(2, 1, 16, 20)).astype(np.float64)
    for cumulative in (False, True):
        for mid in (False, True):
            out = np.asarray(M.cumulative_mag_spectral_norm(jnp.asarray(x), cumulative, mid))
            assert out.shape == x.shape
            assert np.isfinite(out).all()


def test_tcn_estimator():
    rng = jax.random.PRNGKey(0)
    params = M.tcn_estimator_init(rng, input_dim=32, output_dim=8, bn_dim=16, hidden_dim=24, layer=2, stack=2)
    x = jnp.asarray(np.random.randn(2, 32, 40).astype(np.float32))
    out = M.tcn_estimator_apply(params, x, layer=2, stack=2)
    assert out.shape == (2, 8, 40)
    # causality: changing the future must not change the past
    x2 = x.at[:, :, 30:].add(1.0)
    out2 = M.tcn_estimator_apply(params, x2, layer=2, stack=2)
    np.testing.assert_allclose(np.asarray(out[:, :, :30]), np.asarray(out2[:, :, :30]), atol=1e-5)


def test_tac():
    params = M.tac_init(jax.random.PRNGKey(0), input_size=16, hidden_size=32)
    x = jnp.asarray(np.random.randn(2, 4, 16, 10).astype(np.float32))
    out = M.tac_apply(params, x)
    assert out.shape == x.shape


def test_residual_lstm():
    params = M.residual_lstm_init(jax.random.PRNGKey(0), 16, 16, 32)
    x = jnp.asarray(np.random.randn(2, 16, 20).astype(np.float32))
    out = M.residual_lstm_apply(params, x, 32)
    assert out.shape == (2, 16, 20)
    assert np.all(np.asarray(out) >= 0)  # relu output


def test_grouped_linear_and_shared_group_gru():
    p = M.grouped_linear_init(jax.random.PRNGKey(0), 16, 24, groups=4)
    x = jnp.asarray(np.random.randn(5, 16).astype(np.float32))
    out = M.grouped_linear_apply(p, x, groups=4)
    assert out.shape == (5, 24)

    p2 = M.shared_group_gru_init(jax.random.PRNGKey(1), 16, 32, num_layers=2, num_groups=4)
    seq = jnp.asarray(np.random.randn(9, 3, 16).astype(np.float32))
    out2 = M.shared_group_gru_apply(p2, seq, 32, 4)
    assert out2.shape == (9, 3, 32)


def test_layer_norm_lstm_and_mogrifier():
    p = M.layer_norm_lstm_init(jax.random.PRNGKey(0), 12, 20, num_layers=2)
    x = jnp.asarray(np.random.randn(7, 3, 12).astype(np.float32))
    out = M.layer_norm_lstm_apply(p, x, 20)
    assert out.shape == (7, 3, 20)

    p2 = M.mogrifier_lstm_init(jax.random.PRNGKey(1), 12, 20, mogrify_steps=3)
    out2 = M.mogrifier_lstm_apply(p2, x, 20, mogrify_steps=3)
    assert out2.shape == (7, 3, 20)


def test_conformer_conv_causal():
    p = M.causal_conformer_conv_init(jax.random.PRNGKey(0), 16, kernel_size=7)
    x = jnp.asarray(np.random.randn(2, 16, 30).astype(np.float32))
    out = M.causal_conformer_conv_apply(p, x, kernel_size=7)
    assert out.shape == x.shape
    x2 = x.at[:, :, 20:].add(3.0)
    out2 = M.causal_conformer_conv_apply(p, x2, kernel_size=7)
    np.testing.assert_allclose(np.asarray(out[:, :, :20]), np.asarray(out2[:, :, :20]), atol=2e-5)


def test_mvdr_pipeline():
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((2, 4, 16, 30)) + 1j * rng.standard_normal((2, 4, 16, 30))).astype(np.complex64)
    mask = rng.uniform(0, 1, (2, 16, 30)).astype(np.float32)
    phi_s = M.spatial_covariance(jnp.asarray(spec), jnp.asarray(mask))
    phi_n = M.spatial_covariance(jnp.asarray(spec), jnp.asarray(1 - mask))
    assert phi_s.shape == (2, 16, 4, 4)
    w = M.mvdr_weights(phi_s, phi_n)
    assert w.shape == (2, 16, 4)
    out = M.apply_beamforming(jnp.asarray(spec), w)
    assert out.shape == (2, 16, 30)
    assert np.isfinite(np.asarray(out).view(np.float32)).all()
