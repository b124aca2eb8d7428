"""LIF/ALIF neuron tests incl. parity with the reference LIFNode."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.ops.lif import alif_sequence, lif_dense_apply, lif_dense_init, lif_sequence

from reference_oracle import FREEZE_DIR, add_reference_to_path

add_reference_to_path()
import sys

if FREEZE_DIR not in sys.path:
    sys.path.insert(0, FREEZE_DIR)


def test_lif_matches_reference():
    add_reference_to_path()  # stubs are scoped per-test (conftest)
    from neuron import LIFNode

    x = np.random.randn(25, 3, 8).astype(np.float32)
    for hard_reset in (False, True):
        node = LIFNode(tau=2.0, v_threshold=1.0, hard_reset=hard_reset)
        node.reset()
        ref = []
        with torch.no_grad():
            for t in range(x.shape[0]):
                ref.append(node(torch.from_numpy(x[t])).numpy())
        ref = np.stack(ref)
        ours, _ = lif_sequence(jnp.asarray(x), tau=2.0, v_threshold=1.0, hard_reset=hard_reset)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_lif_gradients_flow():
    x = jnp.asarray(np.random.randn(30, 2, 16).astype(np.float32))
    w = jnp.asarray(np.random.randn(30, 2, 16).astype(np.float32))

    def loss(inp):
        s, _ = lif_sequence(inp, tau=2.0)
        return jnp.sum(s * w)

    g = jax.grad(loss)(x)
    gn = float(jnp.linalg.norm(g))
    assert np.isfinite(gn) and gn > 0


def test_alif_adapts():
    # constant strong input: adaptive threshold should reduce firing over time
    x = jnp.ones((200, 1, 4)) * 1.2
    s_lif, _ = lif_sequence(x, tau=2.0)
    s_alif, _ = alif_sequence(x, tau=2.0, tau_adp=20.0, beta=1.8)
    rate_lif = float(s_lif[100:].mean())
    rate_alif = float(s_alif[100:].mean())
    assert rate_alif < rate_lif


def test_lif_dense_network():
    params = lif_dense_init(jax.random.PRNGKey(0), [257, 64, 64, 257])
    x = jnp.abs(jnp.asarray(np.random.randn(40, 2, 257).astype(np.float32)))
    out, layers = lif_dense_apply(params, x)
    assert out.shape == (40, 2, 257)
    assert len(layers) == 4
    # hidden layers emit binary spikes
    assert set(np.unique(np.asarray(layers[1]))) <= {0.0, 1.0}
