"""End-to-end recipe integration: train -> checkpoints -> validate -> resume.

Drives the intel_ndns recipe in-process on the tiny synthetic config
(hermetic, no audio files) — the framework-level equivalent of the
reference's `-M train` smoke runs (SURVEY.md §4).
"""

import shutil
import sys
from pathlib import Path

import pytest

RECIPE_DIR = Path(__file__).parent.parent / "recipes" / "intel_ndns" / "spiking_fullsubnet"


@pytest.fixture
def recipe_env(tmp_path, monkeypatch):
    # run inside a temp dir so exp/ artifacts land there
    monkeypatch.chdir(tmp_path)
    shutil.copy(RECIPE_DIR / "tiny_synthetic.toml", tmp_path / "tiny_synthetic.toml")
    monkeypatch.syspath_prepend(str(RECIPE_DIR))
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    yield tmp_path


def test_train_validate_resume(recipe_env):
    import run

    t = run.main(["-C", "tiny_synthetic.toml", "-M", "train"])
    assert t.state.epochs_trained == 2
    exp = recipe_env / "exp" / "tiny_synthetic"
    assert (exp / "checkpoints" / "best").exists()
    assert (exp / "checkpoints" / "epoch_0002").exists()
    mean_csvs = list((exp / "metrics").glob("dl_0_epoch_2_*_mean.csv"))
    assert mean_csvs
    # neuromorphic cost proxies land in the metrics CSV (leaderboard columns)
    header = mean_csvs[0].read_text().splitlines()[0]
    assert "synops" in header and "neuron_ops" in header
    assert t.state.best_score > -100

    # resume: counters restore; max_epochs already reached -> no extra epochs
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    import run as run2

    t2 = run2.main(["-C", "tiny_synthetic.toml", "-M", "train", "-R"])
    assert t2.state.epochs_trained == 2

    # test mode on the best checkpoint
    sys.modules.pop("run", None)
    sys.modules.pop("trainer", None)
    import run as run3

    t3 = run3.main(["-C", "tiny_synthetic.toml", "-M", "test", "--ckpt_path", "best"])
    assert t3.state.epochs_trained == 2
