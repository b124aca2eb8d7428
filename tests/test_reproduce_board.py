"""E2E leaderboard reproduction harness (VERDICT r2 #3).

Builds a 5-utterance synthetic DNSAudio tree, then runs
tools/reproduce_board.py end to end THROUGH the real recipe CLI
(`run.py -M test` semantics): dataset gate -> generated TOML -> DenoiseTrainer
test loop -> metrics CSVs -> board row YAML+markdown comparable to the
reference's model_zoo/metricsboard_track_1_validation.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


def _write_wav(path: Path, audio: np.ndarray, sr: int = 16000) -> None:
    from spiking_fullsubnet_tpu.dsp.io import save_wav

    path.parent.mkdir(parents=True, exist_ok=True)
    save_wav(audio, path, sr)


@pytest.fixture()
def dns_tree(tmp_path):
    """5-utterance DNSAudio tree (noisy/ + clean/, fileid naming)."""
    sr = 16000
    rng = np.random.default_rng(7)
    root = tmp_path / "ndns_val"
    for fid in range(5):
        t = np.arange(sr * 2) / sr
        clean = 0.3 * np.sin(2 * np.pi * (180 + 40 * fid) * t).astype(np.float32)
        noisy = clean + 0.08 * rng.standard_normal(len(clean)).astype(np.float32)
        _write_wav(root / "noisy" / f"book_snr10_tl-25_fileid_{fid}.wav", noisy, sr)
        _write_wav(root / "clean" / f"clean_fileid_{fid}.wav", clean, sr)
    return root


def test_dataset_gate_skips_cleanly(tmp_path, capsys):
    import reproduce_board

    rc = reproduce_board.main(["--dns_root", str(tmp_path / "nope"), "--out", str(tmp_path / "o")])
    assert rc == 2
    assert "skipping cleanly" in capsys.readouterr().err


def test_board_row_end_to_end(dns_tree, tmp_path, capsys, monkeypatch):
    import reproduce_board

    # tiny model so the CPU test stays fast: override the generated config's
    # model args post-generation via the build_config hook
    orig_build = reproduce_board.build_config

    def tiny_build(size, dns_root, out_dir, limit=None):
        import tomllib

        path = orig_build(size, dns_root, out_dir, limit=limit)
        with open(path, "rb") as f:
            cfg = tomllib.load(f)
        cfg["model"]["args"].update(
            fb_hidden_size=16, sb_hidden_size=8, fb_num_layers=1, sb_num_layers=1,
            df_orders=[2, 1, 1], scan_mode="fused",
        )
        reproduce_board._dump_toml(cfg, path)
        return path

    monkeypatch.setattr(reproduce_board, "build_config", tiny_build)

    out = tmp_path / "board_out"
    rc = reproduce_board.main([
        "--dns_root", str(dns_tree), "--size", "m", "--out", str(out),
        "--entry_name", "tiny_e2e", "--ckpt_path", "init",
    ])
    assert rc == 0

    # the board row printed as JSON on the last-but-one line
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    entry = json.loads(lines[-1])
    assert entry["model"] == "tiny_e2e"
    assert np.isfinite(entry["SI-SNR"])
    # SI-SNRi computed vs the challenge noisy baseline (writeout rule)
    assert entry["SI-SNRi_data"] == pytest.approx(entry["SI-SNR"] - 6.89, abs=1e-3)
    assert entry["power_proxy_Ops/s"] > 0
    assert entry["PDP_proxy_Ops"] > 0
    assert entry["latency_total_ms"] == pytest.approx(8.036)

    yml = (out / "metricsboard_validation.yml").read_text()
    md = (out / "metricsboard_validation.md").read_text()
    assert "tiny_e2e" in yml and "tiny_e2e" in md
    # markdown schema matches the reference board columns
    assert "| SI-SNRi_data |" in md.splitlines()[0].replace("|", "| ").replace("  ", " ") or \
        "SI-SNRi_data" in md.splitlines()[0]

    # metrics CSVs really came from the recipe test loop
    csvs = list((out / f"board_m" / "metrics").glob("dl_0_*_mean.csv"))
    assert csvs, "recipe test loop wrote no metrics CSVs"
