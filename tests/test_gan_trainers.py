"""End-to-end GAN trainer family: single-D, dual-D (SIG/BAK), generator-only.

Drives the intel_ndns GAN recipes in-process on hermetic tiny configs —
covering the reference's trainer_GAN.py, freeze-phase trainer_dualGAN.py and
trainer_onlyGen.py training loops (SURVEY.md §2b/§3.4).
"""

import shutil
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent
GAN_DIR = ROOT / "recipes" / "intel_ndns" / "spiking_fullsubnet"
FREEZE_DIR = ROOT / "recipes" / "intel_ndns" / "spiking_fullsubnet_freeze_phase"

_RECIPE_MODULES = ["run", "run_GAN", "run_dualGAN", "trainer", "trainer_GAN", "trainer_dualGAN", "trainer_onlyGen"]


def _fresh_modules():
    for m in _RECIPE_MODULES:
        sys.modules.pop(m, None)


@pytest.fixture
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _fresh_modules()
    yield tmp_path
    _fresh_modules()


def test_gan_train_e2e(in_tmp, monkeypatch):
    """Single-discriminator MetricGAN loop (reference trainer_GAN.py)."""
    shutil.copy(GAN_DIR / "tiny_synthetic_GAN.toml", in_tmp / "tiny_synthetic_GAN.toml")
    monkeypatch.syspath_prepend(str(GAN_DIR))
    import run_GAN

    t = run_GAN.main(["-C", "tiny_synthetic_GAN.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert t.gan_enabled and list(t.disc_params) == ["d"]
    exp = in_tmp / "exp" / "tiny_synthetic_GAN"
    assert (exp / "checkpoints" / "epoch_0001").exists()

    # resume restores discriminator params + opt state through the checkpoint
    _fresh_modules()
    import run_GAN as run_GAN2

    t2 = run_GAN2.main(["-C", "tiny_synthetic_GAN.toml", "-M", "train", "-R"])
    assert t2.state.epochs_trained == 1


def test_dual_gan_train_e2e(in_tmp, monkeypatch):
    """Dual SIG/BAK discriminators with ExponentialLR schedules
    (reference freeze-phase trainer_dualGAN.py / run_dualGAN.py)."""
    shutil.copy(FREEZE_DIR / "tiny_synthetic_dualGAN.toml", in_tmp / "tiny_synthetic_dualGAN.toml")
    monkeypatch.syspath_prepend(str(FREEZE_DIR))
    import run_dualGAN

    t = run_dualGAN.main(["-C", "tiny_synthetic_dualGAN.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert sorted(t.disc_params) == ["d_bak", "d_sig"]
    # generator schedule follows [lr_scheduler_g] gamma (ExponentialLR),
    # scaled by sqrt(device_count) — the data-parallel LR rule (run.py:31
    # semantics keyed to the mesh size; tests run an 8-device CPU mesh)
    import math

    import jax as _jax

    assert float(t.lr_schedule(0)) == pytest.approx(
        5e-4 * math.sqrt(_jax.device_count()))
    exp = in_tmp / "exp" / "tiny_synthetic_dualGAN"
    assert (exp / "checkpoints" / "epoch_0001").exists()


def test_only_gen_train_e2e(in_tmp, monkeypatch):
    """Generator-only ablation: loss = freq_MAE + mag_MAE
    (reference freeze-phase trainer_onlyGen.py)."""
    from spiking_fullsubnet_tpu.runtime.config import toml_dump, toml_load

    cfg = toml_load(FREEZE_DIR / "tiny_synthetic_dualGAN.toml")
    cfg["trainer"]["path"] = "trainer_onlyGen.Trainer"
    for key in ("model_d_sig", "model_d_bak"):
        cfg.pop(key, None)
    toml_dump(cfg, in_tmp / "tiny_onlyGen.toml")
    monkeypatch.syspath_prepend(str(FREEZE_DIR))
    import run

    t = run.main(["-C", "tiny_onlyGen.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    # loss dict carries only the generator terms
    exp = in_tmp / "exp" / "tiny_onlyGen"
    assert (exp / "checkpoints" / "epoch_0001").exists()


def test_gan_with_real_dnsmos_in_the_loop(in_tmp, monkeypatch):
    """DNSMOS-in-the-train-step plumbing (reference trainer_GAN.py:81-97):
    the REAL DNSMOS windowing + P.835 polynomial protocol runs inside the
    discriminator step via injected inference sessions — verifying the
    (score-1)/4 normalized targets beyond the SI-SDR proxy fallback."""
    import numpy as np

    from spiking_fullsubnet_tpu.metrics.dnsmos import DNSMOS
    calls = {"n": 0}

    class _P835:
        def run(self, _none, feed):
            assert feed["input_1"].shape == (1, 144160)
            calls["n"] += 1
            return [np.array([[3.0, 3.5, 2.5]], np.float32)]

    class _P808:
        def run(self, _none, feed):
            return [np.array([[4.0]], np.float32)]

    real_targets = []

    def patched_dnsmos(input_sr=16000, **kw):
        return DNSMOS(input_sr=input_sr, sessions=(_P835(), _P808()))

    shutil.copy(GAN_DIR / "tiny_synthetic_GAN.toml", in_tmp / "tiny_synthetic_GAN.toml")
    monkeypatch.syspath_prepend(str(GAN_DIR))
    import run_GAN
    from spiking_fullsubnet_tpu.recipes.gan import GanDenoiseTrainer

    orig_batch_mos = GanDenoiseTrainer.batch_mos

    def spying_batch_mos(self, enh_np, clean_np, targets):
        # swap in the session-injected DNSMOS for this run
        if self.dns_mos is None:
            self.dns_mos = patched_dnsmos(input_sr=self.sr)
        out = orig_batch_mos(self, enh_np, clean_np, targets)
        real_targets.append({k: v.copy() for k, v in out.items()})
        return out

    monkeypatch.setattr(GanDenoiseTrainer, "batch_mos", spying_batch_mos)

    t = run_GAN.main(["-C", "tiny_synthetic_GAN.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert calls["n"] > 0, "P.835 session never ran inside the train loop"
    # targets are the normalized OVRL: ((-0.06766283*6.25 + 1.11546468*2.5
    # + 0.04602535) - 1) / 4 = 0.35295 for every utterance
    for batch_targets in real_targets:
        for v in batch_targets.values():
            np.testing.assert_allclose(v, 0.352949, atol=1e-4)
