"""End-to-end parity of the JAX SpikingFullSubNet with the reference model.

Three oracles:
1. latest-generation audiozen model (random weights, exported + imported)
2. frozen competition `Separator` with a REAL model-zoo checkpoint (baseline_m)
3. multi-speaker branch of the latest generation
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
    SpikingFullSubNetConfig,
    separator_config,
    spiking_fullsubnet_apply,
    spiking_fullsubnet_init,
)
from spiking_fullsubnet_tpu.runtime.convert import (
    import_spiking_fullsubnet,
    load_torch_state_dict,
)

from reference_oracle import import_reference_model, import_reference_separator

ZOO_M = "/root/reference/model_zoo/intel_ndns/spike_fsb/baseline_m/checkpoints/best/pytorch_model.bin"

SMALL_KW = dict(
    n_fft=512,
    hop_length=128,
    win_length=512,
    fdrc=0.5,
    fb_input_size=64,
    fb_hidden_size=48,
    fb_num_layers=2,
    fb_proj_size=64,
    fb_output_activate_function=None,
    sb_hidden_size=32,
    sb_num_layers=2,
    df_orders=[3, 2, 1],
    center_freq_sizes=[4, 32, 64],
    neighbor_freq_sizes=[15, 15, 15],
    use_pre_layer_norm_fb=True,
    use_pre_layer_norm_sb=True,
    bn=True,
    shared_weights=True,
    sequence_model="GSN",
)


def _export_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("num_spks", [1, 2])
def test_latest_generation_parity(num_spks):
    ref_mod = import_reference_model()
    torch.manual_seed(7)
    ref = ref_mod.SpikingFullSubNet(
        freq_cutoffs=[0, 32, 128, 256], num_spks=num_spks, **SMALL_KW
    )
    ref.eval()

    cfg = SpikingFullSubNetConfig(
        freq_cutoffs=(0, 32, 128, 256),
        num_spks=num_spks,
        **{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in SMALL_KW.items()
        },
    )
    params, state = import_spiking_fullsubnet(_export_sd(ref), cfg)

    x = np.random.randn(2, 16000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    out = spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(x), train=False)

    if num_spks == 1:
        ref_y, ref_mag = ref_out[0].numpy(), ref_out[1].numpy()
        np.testing.assert_allclose(np.asarray(out["enhanced_y"]), ref_y, atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["enhanced_mag"]), ref_mag, atol=5e-4)
    else:
        ref_y = ref_out[0].numpy()
        assert out["enhanced_y"].shape == ref_y.shape == (2, 2, 16000)
        np.testing.assert_allclose(np.asarray(out["enhanced_y"]), ref_y, atol=5e-4)

    # spike-layer outputs for synops must align too
    ref_fb = ref_out[-2]
    for a, b in zip(out["fb_all_layer_outputs"], ref_fb):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-4)


# Size knobs from the shipped competition TOMLs
# (recipes/intel_ndns/spiking_fullsubnet_freeze_phase/baseline_{s,m,l,xl}.toml)
ZOO_DIR = "/root/reference/model_zoo/intel_ndns/spike_fsb"
ZOO_SIZES = {
    "baseline_s": dict(fb_hidden_size=240, sb_hidden_size=160,
                       freq_cutoffs=[32, 128], sb_df_orders=[3, 1, 1],
                       sb_num_center_freqs=[4, 32, 64],
                       sb_num_neighbor_freqs=[15, 15, 15],
                       fb_num_center_freqs=[4, 32, 64],
                       fb_num_neighbor_freqs=[0, 0, 0], shared_weights=True),
    "baseline_m": dict(fb_hidden_size=320, sb_hidden_size=224,
                       freq_cutoffs=[32, 128], sb_df_orders=[5, 3, 1],
                       sb_num_center_freqs=[4, 32, 64],
                       sb_num_neighbor_freqs=[15, 15, 15],
                       fb_num_center_freqs=[4, 32, 64],
                       fb_num_neighbor_freqs=[0, 0, 0], shared_weights=True),
    "baseline_l": dict(fb_hidden_size=320, sb_hidden_size=256,
                       freq_cutoffs=[32, 128, 192], sb_df_orders=[5, 3, 1, 1],
                       sb_num_center_freqs=[2, 4, 32, 64],
                       sb_num_neighbor_freqs=[15, 15, 15, 15],
                       fb_num_center_freqs=[2, 4, 32, 64],
                       fb_num_neighbor_freqs=[0, 0, 0, 0], shared_weights=True),
    "baseline_xl": dict(fb_hidden_size=320, sb_hidden_size=224,
                        freq_cutoffs=[32, 128], sb_df_orders=[5, 3, 1],
                        sb_num_center_freqs=[4, 32, 64],
                        sb_num_neighbor_freqs=[15, 15, 15],
                        fb_num_center_freqs=[4, 32, 64],
                        fb_num_neighbor_freqs=[0, 0, 0], shared_weights=False),
}
ZOO_COMMON = dict(
    sr=16000, fdrc=0.5, n_fft=512, fb_freqs=64, hop_length=128, win_length=512,
    num_freqs=256, sequence_model="GSU", fb_output_activate_function=False,
    sb_output_activate_function=False, bn=True,
)


# The reference snapshot ships generator weights only for S and M: the
# baseline_l / baseline_xl best+latest dirs contain just the discriminator
# (pytorch_model_1.bin) — no pytorch_model.bin (verified by listing).
# Weight parity therefore covers S/M; L/XL are covered architecturally by
# test_zoo_architecture_param_counts.
@pytest.mark.parametrize("size", ["baseline_s", "baseline_m"])
def test_frozen_zoo_checkpoint_parity(size):
    """Strongest parity evidence: the shipped competition checkpoints
    loaded into both frameworks, allclose on a real forward."""
    ckpt = f"{ZOO_DIR}/{size}/checkpoints/best/pytorch_model.bin"
    ref_mod = import_reference_separator()
    kwargs = dict(
        ZOO_COMMON,
        **ZOO_SIZES[size],
        # the shipped cumulative_laplace_norm path crashes in the reference
        # snapshot (5-D input, model_low_freq.py:475); offline is runnable in
        # both and exercises identical weights. The cumulative path is
        # covered framework-side by test_zoo_published_cumulative_norm_config.
        norm_type="offline_laplace_norm",
    )
    ref = ref_mod.Separator(**kwargs)
    sd_t = torch.load(ckpt, map_location="cpu", weights_only=False)
    ref.load_state_dict(sd_t)
    ref.eval()

    cfg = separator_config(**kwargs)
    sd = load_torch_state_dict(ckpt)
    params, state = import_spiking_fullsubnet(sd, cfg)

    # published parameter counts (model_zoo/metricsboard_track_1_test.md:3-7;
    # the validation table rounds S to 512k, the actual count is 520,920)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    published = {"baseline_s": 521_000, "baseline_m": 954_000,
                 "baseline_l": 1_289_000, "baseline_xl": 1_798_000}[size]
    assert abs(n_params - published) / published < 0.01, n_params

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 16000)) * 0.05).astype(np.float32)
    with torch.no_grad():
        ref_y, ref_mag, _, _ = ref(torch.from_numpy(x))

    out = spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(x), train=False)
    ours_y = np.asarray(out["enhanced_y"])

    np.testing.assert_allclose(ours_y, ref_y.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["enhanced_mag"]), ref_mag.numpy(), atol=1e-3)
    # sanity: enhanced differs from the input (the model is doing something)
    assert np.abs(ours_y - x).max() > 1e-3


@pytest.mark.parametrize("size", list(ZOO_SIZES))
def test_zoo_architecture_param_counts(size):
    """All four leaderboard architectures build and match published sizes
    (model_zoo/metricsboard_track_1_test.md:3-7), incl. L's 4-section layout
    and XL's untied gate/cell weights."""
    kwargs = dict(ZOO_COMMON, **ZOO_SIZES[size], norm_type="cumulative_laplace_norm")
    cfg = separator_config(**kwargs)
    params, _ = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    published = {"baseline_s": 521_000, "baseline_m": 954_000,
                 "baseline_l": 1_289_000, "baseline_xl": 1_798_000}[size]
    assert abs(n_params - published) / published < 0.01, n_params


@pytest.mark.parametrize("size", ["baseline_s", "baseline_m"])
def test_zoo_published_cumulative_norm_config(size):
    """Run the PUBLISHED eval config (norm_type=cumulative_laplace_norm,
    baseline_m.toml:63) end-to-end on zoo weights. The reference snapshot
    cannot run this path at all (verified: 4-tuple unpack at
    freeze_phase/base_model.py:47 crashes on the 5-D sub-band input of
    model_low_freq.py:475); this framework can — the denoiser must improve
    SI-SDR of a noisy sine on the real published configuration."""
    ckpt = f"{ZOO_DIR}/{size}/checkpoints/best/pytorch_model.bin"
    kwargs = dict(ZOO_COMMON, **ZOO_SIZES[size], norm_type="cumulative_laplace_norm")
    cfg = separator_config(**kwargs)
    sd = load_torch_state_dict(ckpt)
    params, state = import_spiking_fullsubnet(sd, cfg)

    # speech-like synthetic: AM harmonic stack with F0 drift (a pure sine is
    # suppressed as tonal noise by the speech-trained weights)
    rng = np.random.default_rng(5)
    t = np.arange(32000) / 16000.0
    f0 = 120 + 20 * np.sin(2 * np.pi * 2.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / 16000
    sig = sum(np.sin(k * phase) / k for k in range(1, 9))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t - 1.2)) * np.exp(
        -0.5 * ((t % 1.0) - 0.5) ** 2 / 0.09)
    clean = (0.2 * env * sig).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(len(t)).astype(np.float32)

    out = spiking_fullsubnet_apply(cfg, params, state, jnp.asarray(noisy[None]), train=False)
    enh = np.asarray(out["enhanced_y"])[0]
    assert np.isfinite(enh).all()

    def si_sdr(est, ref):
        alpha = np.dot(est, ref) / np.dot(ref, ref)
        return 10 * np.log10(np.sum((alpha * ref) ** 2) / np.sum((alpha * ref - est) ** 2))

    gain = si_sdr(enh, clean) - si_sdr(noisy, clean)
    # measured: +11.3 dB (S), +11.9 dB (M) on this fixture
    assert gain > 8.0, f"SI-SDR gain {gain:.2f} dB on the published config"


def test_jit_and_grad():
    cfg = SpikingFullSubNetConfig(
        fb_hidden_size=32,
        sb_hidden_size=24,
        df_orders=(2, 1, 1),
        bn=True,
        shared_weights=True,
    )
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.randn(2, 8000).astype(np.float32) * 0.1)
    target = jnp.asarray(np.random.randn(2, 8000).astype(np.float32) * 0.1)

    @jax.jit
    def loss_fn(p):
        out = spiking_fullsubnet_apply(cfg, p, state, x, train=True)
        return jnp.mean(jnp.abs(out["enhanced_y"] - target))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in leaves]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0.0
