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
    # generator schedule follows [lr_scheduler_g] gamma (ExponentialLR)
    assert float(t.lr_schedule(0)) == pytest.approx(5e-4)
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
