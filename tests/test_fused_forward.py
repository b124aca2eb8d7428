"""Fused single-scan forward vs the layered reference implementation.

models/fused_forward.py executes the whole causal fb->sb pipeline as one
lax.scan. In f64 the two paths are exact to machine precision (verifying the
math is op-for-op identical); in f32 spike flips from summation reordering
are possible by design, so no f32 waveform-allclose here (mirrors
test_mixed_precision's reasoning).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
    SpikingFullSubNetConfig,
    spiking_fullsubnet_apply,
    spiking_fullsubnet_init,
)


def _to64(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


@pytest.fixture()
def small_model():
    cfg = SpikingFullSubNetConfig(
        fb_hidden_size=32,
        sb_hidden_size=24,
        df_orders=(2, 1, 1),
        bn=True,
        shared_weights=True,
    )
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)) * 0.1)  # f64
    return cfg, _to64(params), _to64(state), x


@pytest.mark.parametrize("train", [False, True])
def test_fused_matches_layered_exactly_f64(small_model, train):
    cfg, params, state, x = small_model
    cfg_f = dataclasses.replace(cfg, scan_mode="fused")

    out_l = spiking_fullsubnet_apply(cfg, params, state, x, train=train)
    out_f = spiking_fullsubnet_apply(cfg_f, params, state, x, train=train)

    np.testing.assert_allclose(
        np.asarray(out_l["enhanced_y"]), np.asarray(out_f["enhanced_y"]), atol=1e-12
    )
    # BN running stats (train) / passthrough state (eval)
    for a, b in zip(jax.tree.leaves(out_l["state"]), jax.tree.leaves(out_f["state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    # synops tensors: same shapes, same values (spikes bitwise, proj ~eps)
    for a, b in zip(
        jax.tree.leaves(out_l["fb_all_layer_outputs"] + out_l["sb_all_layer_outputs"]),
        jax.tree.leaves(out_f["fb_all_layer_outputs"] + out_f["sb_all_layer_outputs"]),
    ):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_fused_grad_matches_layered_f64(small_model):
    cfg, params, state, x = small_model
    cfg_f = dataclasses.replace(cfg, scan_mode="fused")
    target = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8000)) * 0.05)

    def loss(c):
        def f(p):
            out = spiking_fullsubnet_apply(c, p, state, x, train=True)
            return jnp.mean(jnp.abs(out["enhanced_y"] - target))
        return f

    g_l = jax.grad(loss(cfg))(params)
    g_f = jax.grad(loss(cfg_f))(params)
    for a, b in zip(jax.tree.leaves(g_l), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    assert float(optax.global_norm(g_f)) > 0.0


def test_fused_bf16_and_jit(small_model):
    """fused + bf16 policy under jit: finite output, f32 signal path."""
    cfg, params, state, x = small_model
    cfg16 = dataclasses.replace(cfg, scan_mode="fused", compute_dtype="bfloat16")
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    s32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
    x32 = x.astype(jnp.float32)

    out = jax.jit(
        lambda p, s, y: spiking_fullsubnet_apply(cfg16, p, s, y, train=False)["enhanced_y"]
    )(p32, s32, x32)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_fused_rejects_offline_norms(small_model):
    cfg, params, state, x = small_model
    cfg_bad = dataclasses.replace(cfg, scan_mode="fused", norm_type="offline_laplace_norm")
    with pytest.raises(ValueError, match="norm_type"):
        spiking_fullsubnet_apply(cfg_bad, params, state, x, train=False)
