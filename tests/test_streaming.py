"""Streaming enhancement: chunk-size invariance + exact parity with the
offline forward (interior region, after aligning with the offline center
padding via priming)."""

import numpy as np

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
    SpikingFullSubNetConfig,
    spiking_fullsubnet_apply,
    spiking_fullsubnet_init,
)
from spiking_fullsubnet_tpu.streaming import StreamingEnhancer


def _tiny_cfg(**kw):
    return SpikingFullSubNetConfig(
        fb_hidden_size=32,
        sb_hidden_size=16,
        df_orders=(3, 2, 1),
        bn=True,
        shared_weights=True,
        **kw,
    )


def test_streaming_matches_offline():
    cfg = _tiny_cfg()
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

    offline = np.asarray(
        spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(x), train=False)["enhanced_y"]
    )

    hop, pad = cfg.hop_length, cfg.n_fft // 2
    enh = StreamingEnhancer(cfg, params, state, batch_size=1, chunk_frames=1)
    # prime so streamed frames == offline frames (see init_state docstring)
    st = enh.init_state(prime_samples=x[:, : enh.prime_len])
    outs = []
    stream_in = x[:, enh.prime_len :]
    t = stream_in.shape[-1] - stream_in.shape[-1] % hop
    for i in range(0, t, hop):
        st, y = enh.step(st, jnp.asarray(stream_in[:, i : i + hop]))
        outs.append(np.asarray(y))
    stream_out = np.concatenate(outs, axis=-1)

    # stream emission m = OLA[m*hop:(m+1)*hop); offline y = OLA[pad:]. Skip
    # one extra hop where the offline edge envelope differs from steady state.
    k0 = pad // hop + 1
    aligned_stream = stream_out[:, k0 * hop :]
    n = aligned_stream.shape[-1] - 2 * hop  # ignore the tail edge
    np.testing.assert_allclose(
        aligned_stream[:, :n], offline[:, hop : hop + n], atol=2e-4
    )


def test_chunk_size_invariance():
    cfg = _tiny_cfg()
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 4096)) * 0.1).astype(np.float32)

    e1 = StreamingEnhancer(cfg, params, state, batch_size=2, chunk_frames=1)
    e4 = StreamingEnhancer(cfg, params, state, batch_size=2, chunk_frames=4)
    y1 = e1.enhance_stream(x)
    y4 = e4.enhance_stream(x)
    np.testing.assert_allclose(y1, y4, atol=1e-5)
    assert y1.shape == x.shape


def test_streaming_cumulative_norm():
    cfg = _tiny_cfg(norm_type="cumulative_laplace_norm", use_pre_layer_norm_fb=False, use_pre_layer_norm_sb=False)
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)

    offline = np.asarray(
        spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(x), train=False)["enhanced_y"]
    )
    hop, pad = cfg.hop_length, cfg.n_fft // 2
    enh = StreamingEnhancer(cfg, params, state, batch_size=1)
    st = enh.init_state(prime_samples=x[:, : enh.prime_len])
    outs = []
    stream_in = x[:, enh.prime_len :]
    t = stream_in.shape[-1] - stream_in.shape[-1] % hop
    for i in range(0, t, hop):
        st, y = enh.step(st, jnp.asarray(stream_in[:, i : i + hop]))
        outs.append(np.asarray(y))
    stream_out = np.concatenate(outs, axis=-1)
    k0 = pad // hop + 1
    aligned = stream_out[:, k0 * hop :]
    n = aligned.shape[-1] - 2 * hop
    np.testing.assert_allclose(aligned[:, :n], offline[:, hop : hop + n], atol=2e-4)
