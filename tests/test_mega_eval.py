"""Whole-model mega eval kernel (ops/mega_eval.py) parity vs the fused scan.

The fused single-scan forward (models/fused_forward.py) is the numerics
reference for the serving path — itself pinned to the layered path and to
the reference torch model (tests/test_fused_forward.py, test_spiking_
fullsubnet.py). These tests pin the mega Pallas kernel to it bit-for-bit in
f64 (interpret mode on CPU) across the config surface the kernel supports,
and check the unsupported-config guard. Real-TPU compiled parity lives in
tests/test_tpu_kernels.py (backend-gated).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import spiking_fullsubnet_tpu.ops.mega_eval as me
from spiking_fullsubnet_tpu.models.presets import flagship_m
from spiking_fullsubnet_tpu.models.fused_forward import spiking_fullsubnet_fused_forward
from spiking_fullsubnet_tpu.models.mega_forward import spiking_fullsubnet_mega_forward


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = me._INTERPRET
    me._INTERPRET = True
    yield
    me._INTERPRET = old


def _bundle_f64(**kw):
    b = flagship_m(fb_hidden_size=32, sb_hidden_size=16, df_orders=[2, 1, 1], **kw)
    params = jax.tree.map(lambda x: x.astype(jnp.float64), b["params"])
    state = jax.tree.map(lambda x: x.astype(jnp.float64), b["state"])
    return b["config"], params, state


@pytest.mark.parametrize(
    "kw",
    [
        {},  # flagship shape: bn + pre-LN + shared weights
        {"shared_weights": False},
        {"bn": False},
        {"use_pre_layer_norm_sb": False, "use_pre_layer_norm_fb": False},
        {"num_spks": 2},
        {"fb_num_layers": 1, "sb_num_layers": 3},
        {"fb_output_activate_function": "tanh"},
    ],
    ids=["flagship", "unshared", "no_bn", "no_preln", "2spk", "deep_sb", "fb_act"],
)
def test_mega_matches_fused_exactly_f64(kw):
    cfg, params, state = _bundle_f64(**kw)
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((3, 7000)))  # f64, odd T/B
    ref = spiking_fullsubnet_fused_forward(cfg, params, state, noisy, train=False)
    got = spiking_fullsubnet_mega_forward(cfg, params, state, noisy)
    np.testing.assert_array_equal(np.asarray(got["enhanced_y"]), np.asarray(ref["enhanced_y"]))
    if cfg.num_spks == 1:
        np.testing.assert_array_equal(
            np.asarray(got["enhanced_mag"]), np.asarray(ref["enhanced_mag"]))


def test_mega_f32_quality_parity():
    """f32 compiled-dtype path: spikes may flip at threshold; demand waveform
    agreement at the same tolerance the fused path is held to vs layered."""
    cfg, params, state = _bundle_f64()
    params32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    state32 = jax.tree.map(lambda x: x.astype(jnp.float32), state)
    rng = np.random.default_rng(1)
    noisy = jnp.asarray(rng.standard_normal((2, 6000)).astype(np.float32) * 0.1)
    ref = spiking_fullsubnet_fused_forward(cfg, params32, state32, noisy, train=False)
    got = spiking_fullsubnet_mega_forward(cfg, params32, state32, noisy)
    ref_y, got_y = np.asarray(ref["enhanced_y"]), np.asarray(got["enhanced_y"])
    # energy-relative error: near-threshold spike flips perturb individual
    # samples; the enhancement must stay the same signal
    rel = np.linalg.norm(ref_y - got_y) / (np.linalg.norm(ref_y) + 1e-12)
    assert rel < 1e-3, rel


def test_scan_mode_mega_through_model_apply():
    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import spiking_fullsubnet_apply

    cfg, params, state = _bundle_f64()
    cfg = cfg.__class__(**{**cfg.__dict__, "scan_mode": "mega"})
    rng = np.random.default_rng(2)
    noisy = jnp.asarray(rng.standard_normal((2, 5000)))
    out = spiking_fullsubnet_apply(cfg, params, state, noisy, train=False)
    assert out["enhanced_y"].shape == noisy.shape
    with pytest.raises(ValueError, match="eval-only"):
        spiking_fullsubnet_apply(cfg, params, state, noisy, train=True)


def test_mega_rejects_frozen_generation():
    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import separator_config

    cfg = separator_config(fb_hidden_size=32, sb_hidden_size=16)
    assert not me.supported(cfg)  # norm_type set -> layered path only


def test_plan_respects_vmem_budget():
    b = flagship_m()
    cfg = b["config"]
    mp = me.plan(cfg, T=3750, B=256, io_bytes=2)
    assert mp.t_blk >= 1 and mp.b_blk >= 16
    assert mp.tp % mp.t_blk == 0 and mp.bp % mp.b_blk == 0
    assert 3750 % mp.t_blk == 0  # divisor choice: no time-padding copy
