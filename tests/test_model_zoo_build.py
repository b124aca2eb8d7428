"""Model-zoo build pipeline: .bin -> .npz -> torch-free reload -> leaderboard.

Covers tools/build_model_zoo.py (VERDICT: own model-zoo artifacts +
metricsboard generated from framework-native checkpoints).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

TOOL = Path(__file__).parent.parent / "tools" / "build_model_zoo.py"


def _load_tool():
    spec = importlib.util.spec_from_file_location("bmz", TOOL)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_build_model_zoo_s(tmp_path):
    m = _load_tool()
    m.main(["--out", str(tmp_path), "--sizes", "s", "--utts", "2"])

    npz = tmp_path / "intel_ndns" / "spike_fsb" / "baseline_s.npz"
    assert npz.exists() and npz.stat().st_size > 1_000_000

    entries = json.loads((tmp_path / "entries_framework.json").read_text())
    assert len(entries) == 1
    e = entries[0]
    assert e["params"] == 520_920
    assert e["SI-SNR"] > 8.0  # real enhancement on the published config
    assert e["PDP_proxy_Ops"] > 0
    assert e["latency_total_ms"] == pytest.approx(8.036)

    md = (tmp_path / "metricsboard_framework.md").read_text()
    assert "baseline_s" in md and "SI-SNRi_data" in md

    # torch-free reload round trip
    import jax

    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
        separator_config, spiking_fullsubnet_init)
    from spiking_fullsubnet_tpu.runtime.convert import load_npz

    cfg = separator_config(**m.COMMON, **m.SIZES["baseline_s"])
    template = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    restored = load_npz(str(npz), {"params": template[0], "state": template[1]})
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(restored["params"]))
    assert n == 520_920
