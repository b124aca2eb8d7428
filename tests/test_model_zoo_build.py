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

    cfg = separator_config(**m.shipped_model_args(Path(m.REF_ZOO) / "baseline_s"))
    template = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
    restored = load_npz(str(npz), {"params": template[0], "state": template[1]})
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(restored["params"]))
    assert n == 520_920


def test_build_model_zoo_l_xl_alif(tmp_path):
    """The remaining published entries: L/XL import everything the upstream
    snapshot ships (architecture + GAN discriminator; generator weights are
    absent upstream — verified in tools/build_model_zoo.py), ALIF is
    documented as irreproducible (no weights, model module absent)."""
    m = _load_tool()
    m.main(["--out", str(tmp_path), "--sizes", "l", "xl", "alif"])

    entries = json.loads((tmp_path / "entries_framework.json").read_text())
    by_model = {e["model"].split(" ")[0]: e for e in entries}
    assert by_model["baseline_l"]["params"] is not None
    assert abs(by_model["baseline_l"]["params"] - 1_289_000) < 0.02 * 1_289_000
    assert abs(by_model["baseline_xl"]["params"] - 1_798_000) < 0.02 * 1_798_000
    for size in ("baseline_l", "baseline_xl"):
        npz = tmp_path / "intel_ndns" / "spike_fsb" / f"{size}_discriminator.npz"
        assert npz.exists() and npz.stat().st_size > 100_000
    alif = next(e for e in entries if e["model"].startswith("ALIF"))
    assert "ALIF_Model is absent" in alif["model"]
    assert alif["latency_total_ms"] == 16.036

    md = (tmp_path / "metricsboard_framework.md").read_text()
    assert "baseline_l" in md and "baseline_xl" in md and "ALIF" in md


def test_zoo_discriminator_import_parity():
    """The imported L discriminator weights reproduce the torch oracle's
    forward (spectral-norm eval semantics) on a real input."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_oracle import add_reference_to_path, remove_stubs

    add_reference_to_path()
    try:
        from audiozen.models.spiking_fullsubnet.discriminator import (
            Discriminator as RefModel)

        import jax.numpy as jnp

        from spiking_fullsubnet_tpu.models.discriminator import discriminator_apply
        from spiking_fullsubnet_tpu.runtime.convert import (
            import_discriminator, load_torch_state_dict)

        ckpt = ("/root/reference/model_zoo/intel_ndns/spike_fsb/baseline_l/"
                "checkpoints/best/pytorch_model_1.bin")
        sd = load_torch_state_dict(ckpt)
        params = import_discriminator(sd)

        ref = RefModel(ndf=16)
        sd_t = torch.load(ckpt, map_location="cpu", weights_only=False)
        ref.load_state_dict(sd_t)
        ref.eval()

        rng = np.random.default_rng(11)
        x = np.abs(rng.standard_normal((2, 257, 126))).astype(np.float32)
        y = np.abs(rng.standard_normal((2, 257, 126))).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(y))
        ours, _ = discriminator_apply(params, jnp.asarray(x), jnp.asarray(y), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=2e-5)
    finally:
        remove_stubs()
