"""End-to-end tiny runs for the remaining recipe matrix (SURVEY.md §2b).

Each test drives a recipe's real CLI in-process on a hermetic tiny config:
reverb dereverberation (scp data + predict tree), cirm_gsn denoising,
wsj0-mix cirm_lstm / conv_tasnet separation, sdnn_delays, and the finetune
mode (reference exposes `-M finetune` but never implemented it).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _enter_recipe(tmp_path, monkeypatch, recipe_dir, config_name):
    monkeypatch.chdir(tmp_path)
    import shutil

    shutil.copy(recipe_dir / config_name, tmp_path / config_name)
    monkeypatch.syspath_prepend(str(recipe_dir))
    for mod in ("run", "trainer", "dataloader"):
        sys.modules.pop(mod, None)


def _fresh_run():
    for mod in ("run", "trainer", "dataloader"):
        sys.modules.pop(mod, None)
    import run

    return run


def test_reverb_train_validate_predict(tmp_path, monkeypatch):
    """REVERB recipe: scp-driven data, train 1 epoch, predict mirrors tree."""
    recipe = REPO / "recipes" / "reverb" / "spiking_fullsubnet"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")

    from spiking_fullsubnet_tpu.dsp.io import save_wav

    sr, n = 16000, 6400
    rng = np.random.default_rng(0)
    (tmp_path / "data").mkdir()
    far = tmp_path / "wav" / "far_test"
    cln = tmp_path / "wav" / "cln_test"
    far.mkdir(parents=True)
    cln.mkdir(parents=True)
    tr_rvb_lines, tr_cln_lines = [], []
    for i in range(4):
        y = rng.standard_normal(n).astype(np.float32) * 0.1
        rvb = y + 0.3 * np.roll(y, 80)
        save_wav(rvb, far / f"utt{i}_ch1.wav", sr)
        save_wav(y, cln / f"utt{i}.wav", sr)
        tr_rvb_lines.append(f"utt{i} wav/far_test/utt{i}_ch1.wav")
        tr_cln_lines.append(f"utt{i} wav/cln_test/utt{i}.wav")
    (tmp_path / "data" / "tr_simu_1ch.scp").write_text("\n".join(tr_rvb_lines))
    (tmp_path / "data" / "tr_cln.scp").write_text("\n".join(tr_cln_lines))
    # dev/eval set: SimDTDataset derives the clean path from the rvb path
    (tmp_path / "data" / "et_simu_1ch.scp").write_text("\n".join(tr_rvb_lines[:2]))
    (tmp_path / "data" / "et_cln.scp").write_text("\n".join(tr_cln_lines[:2]))

    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    exp = tmp_path / "exp" / "tiny_synthetic"
    assert (exp / "checkpoints" / "best").exists()

    run = _fresh_run()
    run.main(["-C", "tiny_synthetic.toml", "-M", "predict", "--ckpt_path", "best"])
    # enhanced wavs mirror the input tree relative to predict.mix_root
    out = exp / "enhanced" / "dataloader_0" / "far_test"
    assert sorted(p.name for p in out.glob("*.wav")) == ["utt0_ch1.wav", "utt1_ch1.wav"]


def test_cirm_gsn_train(tmp_path, monkeypatch):
    recipe = REPO / "recipes" / "intel_ndns" / "cirm_gsn"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")
    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert np.isfinite(t.state.best_score)


def test_finetune_mode(tmp_path, monkeypatch):
    """-M finetune: warm-start weights, fresh counters/optimizer, then train."""
    recipe = REPO / "recipes" / "intel_ndns" / "cirm_gsn"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")
    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    first_best = t.state.best_score

    run = _fresh_run()
    t2 = run.main(["-C", "tiny_synthetic.toml", "-M", "finetune", "--ckpt_path", "best"])
    # counters were reset: one finetune epoch, not resumed at epoch 2
    assert t2.state.epochs_trained == 1
    assert np.isfinite(t2.state.best_score)
    assert t2.state.best_score != -np.inf or first_best == -np.inf


def test_wsj0_cirm_lstm_train(tmp_path, monkeypatch):
    recipe = REPO / "recipes" / "wsj0-mix" / "cirm_lstm"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")
    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert np.isfinite(t.state.best_score)


def test_wsj0_conv_tasnet_train(tmp_path, monkeypatch):
    recipe = REPO / "recipes" / "wsj0-mix" / "conv_tasnet"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")
    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert np.isfinite(t.state.best_score)


def test_sdnn_delays_train(tmp_path, monkeypatch):
    recipe = REPO / "recipes" / "intel_ndns" / "sdnn_delays"
    _enter_recipe(tmp_path, monkeypatch, recipe, "tiny_synthetic.toml")
    run = _fresh_run()
    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 1
    assert np.isfinite(t.state.best_score)
