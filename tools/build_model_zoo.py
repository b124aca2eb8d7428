#!/usr/bin/env python
"""Build the framework-native model zoo + leaderboard from reference weights.

One command produces everything a user needs to evaluate the published
Spiking-FullSubNet models without torch at runtime. It covers ALL FIVE
reference leaderboard entries (model_zoo/intel_ndns/spike_fsb/
{baseline_s,baseline_m,baseline_l,baseline_xl,ALIF}), each to the extent
the upstream snapshot makes reproducible:

  baseline_s / baseline_m
      Full import: the shipped generator checkpoint
      (checkpoints/best/pytorch_model.bin) converts to the framework's
      torch-free .npz, is run end-to-end on a hermetic speech-like
      validation set under the checkpoint's OWN shipped config (the
      config__*.toml / baseline_*.toml stored next to the weights — all
      published sizes use norm_type = "offline_laplace_norm"; the
      cumulative_laplace_norm seen in the retraining recipe
      baseline_m.toml:63 is NOT what the shipped weights were saved with),
      and scored for SI-SDR + the neuromorphic power proxies
      (metric.py:303-340 semantics).

  baseline_l / baseline_xl
      The upstream snapshot ships NO generator weights for these sizes —
      checkpoints/best/ contains only the GAN discriminator
      (pytorch_model_1.bin, 34 tensors, layers.0.weight_orig [16,2,4,4])
      plus its optimizer/scheduler state; verified 2026-08. What IS
      importable is imported: the architecture is built from the shipped
      config and its parameter count is checked against the published
      leaderboard table (L 1,289k / XL 1,798k params,
      metricsboard_track_1_validation.md), and the discriminator weights
      convert to {size}_discriminator.npz (parity-tested against the torch
      oracle in tests/test_model_zoo_build.py). The leaderboard row is
      emitted architecture-only with an explicit note.

  ALIF
      Upstream ships neither weights nor code: the checkpoint dir has only
      a config + tb_log, and the config's model path
      (sdnn_delays.spk_model.ALIF_Model) does not exist anywhere in the
      reference snapshot (stale import, like the freeze-phase trainers —
      SURVEY.md §1). The row is emitted as documentation; the framework's
      LIF/ALIF neuron (ops/lif.py) is the native offering for that neuron
      family.

Usage:
    python tools/build_model_zoo.py [--out model_zoo] [--sizes s m l xl alif]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

try:
    import tomllib  # py311+
except ImportError:  # pragma: no cover
    import tomli as tomllib

# Source of the upstream competition checkpoints to IMPORT (one-shot
# conversion input, not a runtime dependency): any checkout of the
# reference's model_zoo/intel_ndns/spike_fsb tree.
REF_ZOO = Path(os.environ.get(
    "SFSN_REF_ZOO", "/root/reference/model_zoo/intel_ndns/spike_fsb"))

ALL_SIZES = ["s", "m", "l", "xl", "alif"]
# sizes whose generator weights ship upstream (full import + eval)
GENERATOR_SIZES = {"s", "m"}
# published parameter counts (reference model_zoo leaderboard tables)
PUBLISHED_PARAMS = {
    "baseline_s": 521_000, "baseline_m": 954_000,
    "baseline_l": 1_289_000, "baseline_xl": 1_798_000,
}


def shipped_model_args(ckpt_dir: Path) -> dict:
    """[model_g.args] from the config TOML stored next to the checkpoint —
    the authoritative config for the shipped weights."""
    tomls = sorted(ckpt_dir.glob("*.toml"))
    if not tomls:
        raise FileNotFoundError(f"no shipped config TOML under {ckpt_dir}")
    cfg = tomllib.loads(tomls[0].read_text())
    section = cfg.get("model_g") or cfg.get("model") or {}
    return dict(section.get("args") or {})


def speechlike_fixture(n_utts: int, seconds: float = 4.0, sr: int = 16000, seed: int = 7):
    """Hermetic speech-like utterances: AM harmonic stacks with F0 drift."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n_utts):
        f0 = rng.uniform(90, 220) + rng.uniform(10, 40) * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = sum(np.sin(k * phase) / k for k in range(1, 9))
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 5) * t + rng.uniform(0, 6)))
        clean = (0.2 * env * sig).astype(np.float32)
        noise = (rng.uniform(0.03, 0.1) * rng.standard_normal(len(t))).astype(np.float32)
        yield clean, clean + noise


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    alpha = float(np.dot(est, ref) / np.dot(ref, ref))
    return float(10 * np.log10(np.sum((alpha * ref) ** 2) / (np.sum((alpha * ref - est) ** 2) + 1e-12)))


def _entry_base(size: str, model_desc: str) -> dict:
    buffer_latency_ms = 128 / 16000 * 1e3
    dns_delays_ms = 0.036  # challenge enc+dec window accounting
    return {
        "team": "spiking_fullsubnet_tpu",
        "model": model_desc,
        "date": "2026-08-21",
        "SI-SNR": None,
        "MOS_ovrl": None,
        "latency_enc+dec_ms": dns_delays_ms,
        "latency_total_ms": round(buffer_latency_ms + dns_delays_ms, 3),
        "power_proxy_Ops/s": None,
        "PDP_proxy_Ops": None,
        "neuron_ops": None,
        "params": None,
        "size_kilobytes": None,
        "model_path": None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="model_zoo")
    ap.add_argument("--sizes", nargs="+", default=ALL_SIZES, choices=ALL_SIZES)
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--ref-zoo", default=str(REF_ZOO))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spiking_fullsubnet_tpu.metrics.neuromorphic import (
        compute_neuronops, compute_synops)
    from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
        separator_config, spiking_fullsubnet_apply, spiking_fullsubnet_init)
    from spiking_fullsubnet_tpu.runtime.convert import (
        import_discriminator, import_spiking_fullsubnet, load_npz,
        load_torch_state_dict, save_npz)

    out_dir = Path(args.out) / "intel_ndns" / "spike_fsb"
    out_dir.mkdir(parents=True, exist_ok=True)
    entries = []

    for short in args.sizes:
        if short == "alif":
            e = _entry_base("ALIF", "ALIF (NOT reproducible from the reference "
                            "snapshot: no weights shipped and the config's model "
                            "module sdnn_delays.spk_model.ALIF_Model is absent — "
                            "stale import; see ops/lif.py for the framework ALIF)")
            e["latency_total_ms"] = 16.036  # published: 2-hop buffer
            e["params"] = 1_580_000
            entries.append(e)
            print("ALIF: documented-only (upstream ships neither weights nor code)",
                  flush=True)
            continue

        size = f"baseline_{short}"
        ckpt_dir = Path(args.ref_zoo) / size
        margs = shipped_model_args(ckpt_dir)
        cfg = separator_config(**margs)
        template, tstate = spiking_fullsubnet_init(jax.random.PRNGKey(0), cfg)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(template))
        published = PUBLISHED_PARAMS[size]
        if abs(n_params - published) > 0.02 * published:
            raise AssertionError(
                f"{size}: built architecture has {n_params} params, published "
                f"table says ~{published}")

        gen_ckpt = ckpt_dir / "checkpoints" / "best" / "pytorch_model.bin"
        disc_ckpt = ckpt_dir / "checkpoints" / "best" / "pytorch_model_1.bin"

        if short in GENERATOR_SIZES:
            sd = load_torch_state_dict(str(gen_ckpt))
            params, state = import_spiking_fullsubnet(sd, cfg)
            npz_path = out_dir / f"{size}.npz"
            save_npz(str(npz_path), {"params": params, "state": state})
            # round-trip sanity: reload through the torch-free path
            restored = load_npz(str(npz_path), {"params": template, "state": tstate})
            params, state = restored["params"], restored["state"]

            apply = jax.jit(lambda p, s, n: spiking_fullsubnet_apply(cfg, p, s, n, train=False))
            sisdrs, synops_l, neuronops_l = [], [], []
            for clean, noisy in speechlike_fixture(args.utts):
                out = apply(params, state, jnp.asarray(noisy[None]))
                enh = np.asarray(out["enhanced_y"])[0]
                sisdrs.append(si_sdr(enh, clean))
                synops_l.append(float(compute_synops(
                    out["fb_all_layer_outputs"], out["sb_all_layer_outputs"],
                    shared_weights=cfg.shared_weights)))
                neuronops_l.append(float(compute_neuronops(
                    out["fb_all_layer_outputs"], out["sb_all_layer_outputs"])))

            e = _entry_base(size, f"{size} (framework-native, shipped config: "
                            f"norm_type={cfg.norm_type})")
            e.update({
                "SI-SNR": round(float(np.mean(sisdrs)), 2),
                "power_proxy_Ops/s": round(float(np.mean(synops_l)) / (cfg.hop_length / 16000), 1),
                "PDP_proxy_Ops": round(float(np.mean(synops_l)), 1),
                "neuron_ops": round(float(np.mean(neuronops_l)), 1),
                "params": n_params,
                "size_kilobytes": round(npz_path.stat().st_size / 1024, 1),
                "model_path": str(npz_path),
            })
            entries.append(e)
            print(f"{size}: SI-SDR {e['SI-SNR']} dB, synops {e['PDP_proxy_Ops']}, "
                  f"params {n_params}", flush=True)
        else:
            # L/XL: generator absent upstream; import what ships (the GAN
            # discriminator) and emit an architecture-verified row.
            d_path = None
            if disc_ckpt.exists():
                d_sd = load_torch_state_dict(str(disc_ckpt))
                d_params = import_discriminator(d_sd)
                d_path = out_dir / f"{size}_discriminator.npz"
                save_npz(str(d_path), d_params)
            e = _entry_base(size, f"{size} (architecture-only: upstream snapshot "
                            "ships no generator weights — checkpoints/best has "
                            "only the GAN discriminator, imported alongside)")
            e.update({
                "params": n_params,
                "model_path": str(d_path) if d_path else None,
                "size_kilobytes": round(d_path.stat().st_size / 1024, 1) if d_path else None,
            })
            entries.append(e)
            print(f"{size}: architecture verified ({n_params} params ~ published "
                  f"{published}); discriminator -> {d_path}", flush=True)

    entries_path = Path(args.out) / "entries_framework.json"
    entries_path.write_text(json.dumps(entries, indent=2))
    subprocess.run(
        [sys.executable, str(Path(__file__).parent / "metricsboard_writeout.py"),
         "-I", str(entries_path),
         "-O", str(Path(args.out) / "metricsboard_framework")],
        check=True,
    )
    print(f"Wrote {Path(args.out) / 'metricsboard_framework'}.{{yml,md}}")


if __name__ == "__main__":
    main()
