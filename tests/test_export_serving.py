"""Serving export (tools/export_serving.py): jax.export AOT artifacts.

Verifies the deployable-artifact contract end-to-end on the CPU backend:
serialize -> bytes on disk -> deserialize in a fresh Exported -> call ->
bit-identical to the live graph, for both the offline enhance graph and the
streaming per-chunk step, plus manifest integrity.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("export_serving", REPO / "tools" / "export_serving.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["export_serving"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_bundle(tool):
    # tiny flagship so the test compiles fast; scan path (portable on CPU)
    return tool.build_bundle(
        None,
        fb_hidden_size=16,
        sb_hidden_size=8,
        fb_num_layers=1,
        sb_num_layers=1,
        df_orders=[2, 1, 1],
        scan_mode="layered",
    )


def test_offline_export_roundtrip(tool, tiny_bundle):
    exported, example = tool.export_offline(tiny_bundle, batch=2, seconds=0.2, sr=16000,
                                            platforms=["cpu"])
    blob = exported.serialize()
    assert len(blob) > 1000

    cfg, apply_fn = tiny_bundle["config"], tiny_bundle["apply"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(example.shape, dtype=np.float32) * 0.1)
    ref = apply_fn(cfg, tiny_bundle["params"], tiny_bundle["state"], x, train=False)["enhanced_y"]

    restored = jax.export.deserialize(blob)
    got = restored.call(x)
    # the cpu-platform artifact and the live default backend (TPU on the
    # bench machine) differ by float32 summation order — not bit-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_streaming_export_roundtrip_multi_step(tool, tiny_bundle):
    exported, enhancer, state, chunk = tool.export_streaming(
        tiny_bundle, batch=1, chunk_frames=2, platforms=["cpu"])
    restored = jax.export.deserialize(exported.serialize())

    rng = np.random.default_rng(1)
    st_live, st_art = state, state
    for _ in range(4):  # state threads through the artifact across steps
        c = jnp.asarray(rng.standard_normal(chunk.shape, dtype=np.float32) * 0.1)
        st_live, y_live = enhancer.step(st_live, c)
        st_art, y_art = restored.call(st_art, c)
        np.testing.assert_allclose(np.asarray(y_art), np.asarray(y_live), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_art), jax.tree_util.tree_leaves(st_live)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_cli_writes_artifacts_and_manifest(tool, tmp_path, monkeypatch):
    orig_build = tool.build_bundle
    tiny = dict(fb_hidden_size=16, sb_hidden_size=8, fb_num_layers=1,
                sb_num_layers=1, df_orders=[2, 1, 1], scan_mode="layered")
    monkeypatch.setattr(
        tool, "build_bundle",
        # tiny defaults, overridden by whatever main() forwards (e.g. scan_mode)
        lambda npz=None, **kw: orig_build(npz, **{**tiny, **kw}),
    )
    out = tmp_path / "exported"
    monkeypatch.setattr(sys, "argv", [
        "tool", "-O", str(out), "--batch", "1", "--seconds", "0.1",
        "--chunk_frames", "1", "--platforms", "cpu", "--check",
    ])
    tool.main()

    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["hop_length"] == 128 and manifest["platforms"] == ["cpu"]
    for kind in ("offline", "streaming"):
        art = manifest["artifacts"][kind]
        f = out / art["file"]
        assert f.exists() and f.stat().st_size == art["bytes"]
    assert manifest["artifacts"]["streaming"]["latency_budget_ms"] == pytest.approx(8.0)
