"""Per-module NaN/Inf tracer + step-bounded training tests.

Reference semantics: DebugUnderflowOverflow forward hooks record per-module
abs-min/max frames and abort naming the module (audiozen/debug_utils.py:
7-268); max_steps bounds the number of optimizer updates (SURVEY §3.5).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spiking_fullsubnet_tpu.runtime.debug import ActivationTracer, FloatingPointAbort


def _tiny_model():
    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import build

    return build(
        seed=0, fb_input_size=16, fb_hidden_size=24, fb_num_layers=2,
        fb_proj_size=16, sb_hidden_size=16, sb_num_layers=2,
        freq_cutoffs=[0, 8, 32], df_orders=[2, 1], center_freq_sizes=[2, 8],
        neighbor_freq_sizes=[3, 3], n_fft=64, hop_length=16, win_length=64,
        bn=True, shared_weights=True,
    )


def test_tracer_records_module_frames():
    bundle = _tiny_model()
    cfg, apply_fn = bundle["config"], bundle["apply"]
    noisy = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1600), np.float32))
    with ActivationTracer() as tracer:
        apply_fn(cfg, bundle["params"], bundle["state"], noisy, train=False)
    names = [f[0] for f in tracer.frames]
    assert any(n == "fb/gsu_layer0/spikes" for n in names), names
    assert any(n == "fb/gsu_layer0/membrane" for n in names), names
    assert any(n.startswith("sb1/") for n in names), names
    assert "fb/proj" in names
    assert all(np.isfinite(f[1]) and np.isfinite(f[2]) for f in tracer.frames)
    assert "fb/pre_ln" in tracer.report()


def test_tracer_aborts_naming_offending_layer():
    bundle = _tiny_model()
    cfg, apply_fn = bundle["config"], bundle["apply"]
    params = bundle["params"]
    # poison the SECOND fullband GSU layer's recurrent weights with +inf
    params["fb"]["stack"]["layers"][1]["weight_hh"] = (
        params["fb"]["stack"]["layers"][1]["weight_hh"].at[0, 0].set(jnp.inf))
    noisy = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1600), np.float32))
    with pytest.raises(FloatingPointAbort) as exc:
        with ActivationTracer():
            apply_fn(cfg, params, bundle["state"], noisy, train=False)
    msg = str(exc.value)
    assert "fb/gsu_layer1/membrane" in msg.splitlines()[0], msg
    assert "module trail" in msg


def test_max_steps_stops_mid_epoch(tmp_path, monkeypatch):
    """max_steps=3 with 2 updates/epoch stops after exactly 3 updates
    (one batch into epoch 2), not at the reference's epoch ceiling (4)."""
    import shutil
    import sys
    from pathlib import Path

    from spiking_fullsubnet_tpu.runtime.config import toml_load, toml_dump

    recipe_dir = Path(__file__).parent.parent / "recipes" / "intel_ndns" / "spiking_fullsubnet"
    monkeypatch.chdir(tmp_path)
    cfg = toml_load(recipe_dir / "tiny_synthetic.toml")
    cfg["trainer"]["args"]["max_steps"] = 3
    cfg["trainer"]["args"]["max_epochs"] = 50
    cfg["trainer"]["args"]["validation_interval"] = 100
    cfg["trainer"]["args"]["save_ckpt_interval"] = 100
    toml_dump(cfg, tmp_path / "maxsteps.toml")
    monkeypatch.syspath_prepend(str(recipe_dir))
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    import run

    t = run.main(["-C", "maxsteps.toml", "-M", "train"])
    assert t.state.steps_trained == 3, t.state.steps_trained
    assert t.state.epochs_trained == 2  # stopped one batch into epoch 2
