"""Pallas GSU kernel parity vs the lax.scan oracle (interpret mode on CPU).

The scan implementation (ops/gsu.py) is the numerics reference — itself
torch-parity-tested against audiozen's efficient_spiking_neuron
(tests/test_gsu.py). These tests pin the Pallas kernels (ops/gsu_pallas.py)
to the scan bit-for-bit on the forward and to ~1e-5 relative on gradients,
across shared/non-shared weights, BatchNorm on/off, train/eval, padding
shapes, and the fused whole-stack eval kernel. On real TPU hardware the
same comparisons run compiled (tools/bench_gsu_kernel.py, COVERAGE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import spiking_fullsubnet_tpu.ops.gsu_pallas as gp
from spiking_fullsubnet_tpu.ops.gsu import gsu_stack_apply, gsu_stack_init


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = gp._INTERPRET
    gp._INTERPRET = True
    yield
    gp._INTERPRET = old


def _init(T, B, H, F, shared, bn, num_layers=2, seed=1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, F), dtype=np.float32))
    params, state = gsu_stack_init(
        jax.random.PRNGKey(seed), input_size=F, hidden_size=H,
        num_layers=num_layers, shared_weights=shared, bn=bn)
    if bn:
        # randomize affine + running stats so BN folding is non-trivial
        k = jax.random.PRNGKey(2)
        for i, lp in enumerate(params["layers"]):
            k, *ks = jax.random.split(k, 5)
            lp["bn"]["weight"] = 1.0 + 0.1 * jax.random.normal(ks[0], (H,))
            lp["bn"]["bias"] = 0.1 * jax.random.normal(ks[1], (H,))
            state["layers"][i]["bn"]["running_mean"] = 0.1 * jax.random.normal(ks[2], (H,))
            state["layers"][i]["bn"]["running_var"] = jnp.exp(0.1 * jax.random.normal(ks[3], (H,)))
    return x, params, state


@pytest.mark.parametrize("shared", [True, False])
@pytest.mark.parametrize("bn", [True, False])
def test_eval_forward_exact(shared, bn):
    T, B, H, F = 23, 5, 32, 24
    x, params, state = _init(T, B, H, F, shared, bn)
    o_ref, alo_ref, _ = gsu_stack_apply(params, state, x, H, shared, train=False)
    o_pal, alo_pal, _ = gp.gsu_stack_apply_pallas(params, state, x, H, shared, train=False)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_pal))
    assert len(alo_ref) == len(alo_pal)
    for a, b in zip(alo_ref, alo_pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("shared,bn", [(True, True), (False, False), (False, True)])
def test_train_forward_and_running_stats(shared, bn):
    T, B, H, F = 19, 8, 32, 24
    x, params, state = _init(T, B, H, F, shared, bn)
    o_ref, _, ns_ref = gsu_stack_apply(params, state, x, H, shared, train=True)
    o_pal, _, ns_pal = gp.gsu_stack_apply_pallas(params, state, x, H, shared, train=True)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_pal), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ns_ref), jax.tree_util.tree_leaves(ns_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shared,bn,B", [(True, True, 5), (False, True, 8), (True, False, 5)])
def test_train_gradients(shared, bn, B):
    T, H, F = 17, 32, 24
    x, params, state = _init(T, B, H, F, shared, bn)

    def mkloss(apply):
        def loss(p):
            o, _, _ = apply(p, state, x, H, shared, True)
            w = jnp.cos(jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape) * 0.01)
            return jnp.sum(jnp.sin(o * 1.7) * w)
        return loss

    g_ref = jax.grad(mkloss(gsu_stack_apply))(params)
    g_pal = jax.grad(mkloss(gp.gsu_stack_apply_pallas))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pal),
    ):
        scale = 1e-6 + float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_grad_through_input_projection():
    """dx flows through the hoisted xg einsum's autodiff."""
    T, B, H, F = 13, 5, 32, 24
    x, params, state = _init(T, B, H, F, True, True)

    def mkloss(apply):
        return lambda xx: jnp.sum(jnp.tanh(apply(params, state, xx, H, True, True)[0]))

    gx_ref = jax.grad(mkloss(gsu_stack_apply))(x)
    gx_pal = jax.grad(mkloss(gp.gsu_stack_apply_pallas))(x)
    np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_pal), atol=1e-4)


def test_stack_eval_kernel_layers_and_padding():
    """Fused whole-stack kernel: 3 layers, odd T/B, non-multiple shapes."""
    T, B, H, F = 17, 3, 40, 24
    x, params, state = _init(T, B, H, F, False, True, num_layers=3)
    o_ref, alo_ref, _ = gsu_stack_apply(params, state, x, H, False, train=False)
    o_pal, alo_pal, _ = gp.gsu_stack_eval_pallas(params, state, x, H, False)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_pal))
    for a, b in zip(alo_ref, alo_pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stack_eval_kernel_bf16_io():
    """bf16 mixed mode matches the scan's mixed-precision policy exactly."""
    T, B, H, F = 23, 5, 32, 24
    x, params, state = _init(T, B, H, F, True, True)
    xb = x.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    o_ref, _, _ = gsu_stack_apply(pb, state, xb, H, True, train=False)
    o_pal, _, _ = gp.gsu_stack_eval_pallas(pb, state, xb, H, True)
    assert o_pal.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(o_ref, dtype=np.float32), np.asarray(o_pal, dtype=np.float32))


def test_sequence_model_backend_pallas_matches_scan():
    """SequenceModelConfig(backend=...) routes through the kernels."""
    from spiking_fullsubnet_tpu.models.sequence_model import (
        SequenceModelConfig, sequence_model_apply, sequence_model_init)

    cfg_scan = SequenceModelConfig(
        input_size=24, hidden_size=32, num_layers=2, proj_size=10,
        shared_weights=True, bn=True, backend="scan")
    cfg_pal = SequenceModelConfig(
        input_size=24, hidden_size=32, num_layers=2, proj_size=10,
        shared_weights=True, bn=True, backend="pallas")
    params, state = sequence_model_init(jax.random.PRNGKey(0), cfg_scan)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 24, 31), np.float32))
    o_ref, _, _ = sequence_model_apply(cfg_scan, params, state, x, train=False)
    o_pal, _, _ = sequence_model_apply(cfg_pal, params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_pal), atol=1e-6)
