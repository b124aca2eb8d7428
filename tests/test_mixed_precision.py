"""Mixed-precision (bfloat16 compute) policy tests.

The reference plumbs Accelerate mixed precision but ships with it off
(SURVEY.md §2d, ddp_four_cards.yaml `mixed_precision: "no"`). The TPU build
makes bf16 a first-class policy: params/optimizer/BN-running-stats stay
float32, the fb/sb recurrences and their matmuls run in bfloat16 on the MXU,
and the complex deep-filtering + istft signal path stays float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spiking_fullsubnet_tpu.losses import freq_mae, mag_mae, si_snr
from spiking_fullsubnet_tpu.models.spiking_fullsubnet import build


def _bundles(**overrides):
    args = dict(
        n_fft=512,
        hop_length=128,
        win_length=512,
        fb_input_size=64,
        fb_hidden_size=32,
        fb_num_layers=2,
        fb_proj_size=64,
        sb_hidden_size=16,
        freq_cutoffs=[0, 32, 128, 256],
        df_orders=[2, 1, 1],
        center_freq_sizes=[4, 32, 64],
        neighbor_freq_sizes=[15, 15, 15],
        bn=True,
        shared_weights=True,
        sequence_model="GSN",
        num_spks=1,
    )
    args.update(overrides)
    f32 = build(seed=0, **args)
    bf16 = build(seed=0, **dict(args, compute_dtype="bfloat16"))
    return f32, bf16


def _si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    a = float((est * ref).sum() / (ref * ref).sum())
    e = est - a * ref
    return float(10 * np.log10(max(((a * ref) ** 2).sum(), 1e-12) / max((e * e).sum(), 1e-12)))


def test_bf16_forward_preserves_quality():
    """bf16 vs f32 is NOT waveform-allclose by design: the Heaviside firing
    makes near-threshold neurons flip under any input rounding and the flips
    compound through the recurrence. The functional contract is that quality
    and spike statistics are preserved, measured on the shipped trained
    baseline_m competition checkpoint (verified: SI-SDR within ~0.1 dB while
    the waveforms differ at ~9 dB SNR)."""
    import dataclasses

    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
        separator_config,
        spiking_fullsubnet_apply,
    )
    from spiking_fullsubnet_tpu.runtime.convert import (
        import_spiking_fullsubnet,
        load_torch_state_dict,
    )

    zoo = "/root/reference/model_zoo/intel_ndns/spike_fsb/baseline_m/checkpoints/best/pytorch_model.bin"
    cfg = separator_config(
        fb_hidden_size=320,
        sb_hidden_size=224,
        freq_cutoffs=[32, 128],
        sb_df_orders=[5, 3, 1],
        sb_num_center_freqs=[4, 32, 64],
        sb_num_neighbor_freqs=[15, 15, 15],
        fb_num_center_freqs=[4, 32, 64],
        fb_num_neighbor_freqs=[0, 0, 0],
        norm_type="offline_laplace_norm",
        shared_weights=True,
        bn=True,
        sequence_model="GSU",
    )
    params, state = import_spiking_fullsubnet(load_torch_state_dict(zoo), cfg)

    rng = np.random.default_rng(3)
    t = np.arange(32000) / 16000.0
    clean = (0.3 * np.sin(2 * np.pi * 440 * t) * np.sin(2 * np.pi * 3 * t)).astype(np.float32)[None]
    noisy = clean + (rng.standard_normal((1, 32000)) * 0.05).astype(np.float32)

    out32 = spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(noisy), train=False)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out16 = spiking_fullsubnet_apply(cfg16, params, state, jnp.asarray(noisy), train=False)

    assert out16["enhanced_y"].dtype == jnp.float32  # signal path stays f32

    q32 = _si_sdr(np.asarray(out32["enhanced_y"][0]), clean[0])
    q16 = _si_sdr(np.asarray(out16["enhanced_y"][0]), clean[0])
    assert abs(q16 - q32) < 0.5, f"bf16 quality drift: f32={q32:.2f} dB, bf16={q16:.2f} dB"

    # spike-rate statistics (the synops energy proxy) must agree closely
    # (all_layer_outputs = [input, spikes_l1, spikes_l2, proj]; spikes only)
    for a, b in zip(out32["fb_all_layer_outputs"][1:-1], out16["fb_all_layer_outputs"][1:-1]):
        r32 = float(np.asarray(a, dtype=np.float32).mean())
        r16 = float(np.asarray(b, dtype=np.float32).mean())
        assert abs(r32 - r16) < 0.02, f"spike rate drift {r32:.4f} vs {r16:.4f}"


def test_bf16_train_step_f32_grads_and_state():
    _, bf16 = _bundles()
    cfg, apply_fn = bf16["config"], bf16["apply"]
    params, state = bf16["params"], bf16["state"]

    rng = np.random.default_rng(1)
    noisy = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32) * 0.1)
    clean = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32) * 0.05)

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            out = apply_fn(cfg, p, state, noisy, train=True)
            enh = out["enhanced_y"]
            loss = freq_mae(enh, clean) + mag_mae(enh, clean) + 0.001 * (100.0 - si_snr(enh, clean))
            return loss, out["state"]

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state, new_opt, loss, grads

    params2, state2, _, loss, grads = step(params, state, opt_state)

    assert np.isfinite(float(loss))
    # master params, grads, and BN running stats must all remain float32
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(params2):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state2):
        assert leaf.dtype == jnp.float32
    # gradients actually flow (surrogate path alive under bf16)
    gnorm = float(optax.global_norm(grads))
    assert gnorm > 0.0


def test_bf16_config_via_toml_arg_surface():
    """compute_dtype rides the normal [model.args] TOML path."""
    from spiking_fullsubnet_tpu.models.cirm_models import build as build_cirm

    bundle = build_cirm(
        seed=0,
        n_fft=256,
        hop_length=64,
        win_length=256,
        input_size=129,
        hidden_size=32,
        num_layers=1,
        proj_size=129,
        df_order=1,
        num_spks=1,
        sequence_model="GSN",
        compute_dtype="bfloat16",
    )
    noisy = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 4000), dtype=np.float32) * 0.1
    )
    out = bundle["apply"](bundle["config"], bundle["params"], bundle["state"], noisy, train=False)
    y = out["enhanced_y"] if isinstance(out, dict) else out
    assert jnp.issubdtype(y.dtype, jnp.floating) and y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()
