"""Numerical parity of the JAX GSU scan with the reference torch implementation.

Covers: forward (shared/non-shared weights, with/without BN, train/eval BN
semantics including running-stat updates) and the triangle surrogate gradient
(full BPTT gradient parity on all parameters).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.ops import gsu

from reference_oracle import import_reference_gsu

ref_gsu = import_reference_gsu()


def build_pair(input_size, hidden, num_layers, shared, bn, seed=0):
    """Build reference torch stack + our param pytree with identical weights."""
    torch.manual_seed(seed)
    t_model = ref_gsu.efficient_spiking_neuron(
        input_size=input_size,
        hidden_size=hidden,
        num_layers=num_layers,
        shared_weights=shared,
        bn=bn,
    )
    params, state = gsu.gsu_stack_init(
        jax.random.PRNGKey(0), input_size, hidden, num_layers, shared, bn
    )
    for i, layer in enumerate(t_model.layers):
        cell = layer.cell
        p = dict(params["layers"][i])
        p["weight_ih"] = jnp.asarray(cell.weight_ih.detach().numpy())
        p["weight_hh"] = jnp.asarray(cell.weight_hh.detach().numpy())
        p["bias_ih"] = jnp.asarray(cell.bias_ih.detach().numpy())
        if bn:
            p["bn"] = {
                "weight": jnp.asarray(cell.batchnorm.weight.detach().numpy()),
                "bias": jnp.asarray(cell.batchnorm.bias.detach().numpy()),
            }
        params["layers"][i] = p
    return t_model, params, state


def run_torch(t_model, x, hidden, num_layers, train):
    t_model.train(train)
    tx = torch.from_numpy(x)
    states = [
        ref_gsu.MemoryState(torch.zeros(x.shape[1], hidden), torch.zeros(x.shape[1], hidden))
        for _ in range(num_layers)
    ]
    out, _, all_outs = t_model(tx, states)
    return out, all_outs


@pytest.mark.parametrize("shared,bn", [(False, False), (True, False), (False, True), (True, True)])
def test_gsu_forward_parity(shared, bn):
    T, B, F, H, L = 13, 4, 10, 16, 2
    x = np.random.randn(T, B, F).astype(np.float32)
    t_model, params, state = build_pair(F, H, L, shared, bn)

    # --- eval mode (BN running stats = defaults) ---
    with torch.no_grad():
        ref_out, ref_all = run_torch(t_model, x, H, L, train=False)
    ours, all_outs, _ = gsu.gsu_stack_apply(
        params, state, jnp.asarray(x), H, shared, train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-5)
    assert len(all_outs) == len(ref_all)
    for a, b in zip(all_outs, ref_all):
        np.testing.assert_allclose(np.asarray(a), b.detach().numpy(), atol=1e-5)

    # --- train mode (per-timestep batch stats + running stat updates) ---
    ref_out_tr, _ = run_torch(t_model, x, H, L, train=True)
    ours_tr, _, new_state = gsu.gsu_stack_apply(
        params, state, jnp.asarray(x), H, shared, train=True
    )
    np.testing.assert_allclose(np.asarray(ours_tr), ref_out_tr.detach().numpy(), atol=1e-5)

    if bn:
        for i, layer in enumerate(t_model.layers):
            np.testing.assert_allclose(
                np.asarray(new_state["layers"][i]["bn"]["running_mean"]),
                layer.cell.batchnorm.running_mean.numpy(),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(new_state["layers"][i]["bn"]["running_var"]),
                layer.cell.batchnorm.running_var.numpy(),
                atol=1e-5,
            )


def test_spike_surrogate_gradient():
    x = np.linspace(-2.5, 2.5, 41).astype(np.float32)
    g = jax.grad(lambda v: jnp.sum(gsu.spike(v)))(jnp.asarray(x))
    ref = np.maximum(1.0 - np.abs(x), 0.0)
    np.testing.assert_allclose(np.asarray(g), ref, atol=1e-6)
    # forward is a hard step
    np.testing.assert_allclose(
        np.asarray(gsu.spike(jnp.asarray(x))), (x >= 0).astype(np.float32)
    )


@pytest.mark.parametrize("shared,bn", [(True, True), (False, False)])
def test_gsu_gradient_parity(shared, bn):
    """Full BPTT gradient parity on every parameter of a 2-layer stack."""
    T, B, F, H, L = 7, 3, 6, 8, 2
    x = np.random.randn(T, B, F).astype(np.float32)
    w = np.random.randn(T, B, H).astype(np.float32)  # random projection for scalar loss
    t_model, params, state = build_pair(F, H, L, shared, bn)

    t_model.train(True)
    tx = torch.from_numpy(x)
    states = [
        ref_gsu.MemoryState(torch.zeros(B, H), torch.zeros(B, H)) for _ in range(L)
    ]
    out, _, _ = t_model(tx, states)
    loss = (out * torch.from_numpy(w)).sum()
    loss.backward()

    def jax_loss(p):
        o, _, _ = gsu.gsu_stack_apply(p, state, jnp.asarray(x), H, shared, train=True)
        return jnp.sum(o * jnp.asarray(w))

    grads = jax.grad(jax_loss)(params)

    for i, layer in enumerate(t_model.layers):
        cell = layer.cell
        for name, t_p in [
            ("weight_ih", cell.weight_ih),
            ("weight_hh", cell.weight_hh),
            ("bias_ih", cell.bias_ih),
        ]:
            np.testing.assert_allclose(
                np.asarray(grads["layers"][i][name]),
                t_p.grad.numpy(),
                atol=2e-4,
                rtol=1e-3,
                err_msg=f"layer {i} {name}",
            )
        if bn:
            np.testing.assert_allclose(
                np.asarray(grads["layers"][i]["bn"]["weight"]),
                cell.batchnorm.weight.grad.numpy(),
                atol=2e-4,
                rtol=1e-3,
            )
            np.testing.assert_allclose(
                np.asarray(grads["layers"][i]["bn"]["bias"]),
                cell.batchnorm.bias.grad.numpy(),
                atol=2e-4,
                rtol=1e-3,
            )
