"""Benchmark: flagship-model serving + training throughput on one chip.

Prints ONE JSON line with the primary metric plus context fields:
    {"metric": "audio_seconds_per_second_per_chip", "value": N,
     "unit": "audio-s/s", "vs_baseline": R, ...}

value = seconds of 16 kHz audio enhanced per wall-clock second (steady
state, batch 256 x 30 s utterances, offline/batched) with Spiking-FullSubNet
M (954k params, the published leaderboard model) under the production
config (scan_mode=auto, bfloat16 matmuls — quality parity vs f32 verified
on the competition checkpoint, tests/test_mixed_precision.py).

vs_baseline = value / realtime: how many real-time streams one chip
sustains (the reference publishes no wall-clock numbers — SURVEY.md §6).

Context fields (all measured on-device with the chained-iteration protocol
of runtime/timing.py — plain block_until_ready is a no-op over tunneled
backends and under-reports by orders of magnitude):
    mfu / fraction_of_roofline  analytic-FLOPs MFU vs v5e bf16 peak
    train_audio_s_per_s         training step throughput (batch 64 x 6 s)
    streaming_ms_per_hop_b1     per-hop on-device latency of the streaming
                                API at batch 1 vs the 8 ms real-time budget
                                (BASELINE.md latency rows)
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    from spiking_fullsubnet_tpu.models.presets import flagship_m as _flagship_bundle
    from spiking_fullsubnet_tpu.runtime.roofline import roofline_report
    from spiking_fullsubnet_tpu.runtime.timing import time_fn_per_iter

    bundle = _flagship_bundle(scan_mode="auto", compute_dtype="bfloat16")
    cfg, apply_fn = bundle["config"], bundle["apply"]
    params, state = bundle["params"], bundle["state"]

    sr = 16000
    rng = np.random.default_rng(0)

    # ---- offline enhance throughput (the headline) ----
    batch, seconds = 256, 30.0
    noisy = jnp.asarray(rng.standard_normal((batch, int(seconds * sr)), dtype=np.float32) * 0.1)

    def enhance(params, state, noisy):
        return apply_fn(cfg, params, state, noisy, train=False)["enhanced_y"]

    dt = time_fn_per_iter(enhance, (params, state, noisy), iters=(1, 3), reps=3)
    enhance_tput = batch * seconds / dt

    # ---- training throughput ----
    tb, tsec = 64, 6.0
    t_noisy = jnp.asarray(rng.standard_normal((tb, int(tsec * sr)), dtype=np.float32) * 0.1)
    t_clean = jnp.asarray(rng.standard_normal((tb, int(tsec * sr)), dtype=np.float32) * 0.05)

    def train_step(params, state, n, c):
        def loss_fn(p, s):
            out = apply_fn(cfg, p, s, n, train=True)
            return jnp.mean(jnp.abs(out["enhanced_y"] - c)), out["state"]

        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        return l, ns, g

    dt_train = time_fn_per_iter(train_step, (params, state, t_noisy, t_clean), iters=(1, 5), reps=3)
    train_tput = tb * tsec / dt_train

    # ---- streaming per-hop latency, batch 1 (serving mode) ----
    from spiking_fullsubnet_tpu.streaming import StreamingEnhancer

    enhancer = StreamingEnhancer(cfg, params, state, batch_size=1)
    s0 = enhancer.init_state()
    hop_samples = jnp.asarray(
        rng.standard_normal((1, cfg.hop_length), dtype=np.float32) * 0.1)

    def hop_step(st, chunk):
        st2, y = enhancer.step(st, chunk)
        return st2, y

    dt_hop = time_fn_per_iter(hop_step, (s0, hop_samples), iters=(8, 64), reps=3)
    ms_per_hop = dt_hop * 1e3
    hop_budget_ms = cfg.hop_length / sr * 1e3  # 8 ms at 16 kHz / hop 128

    roof = roofline_report(cfg, enhance_tput, chip="tpu_v5e", matmul_dtype="bf16")

    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip",
                "value": round(enhance_tput, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(enhance_tput, 2),
                "mfu": round(roof["mfu"], 4),
                "fraction_of_roofline": round(roof["fraction_of_roofline"], 4),
                "roofline_audio_s_per_s": round(roof["roofline_audio_s_per_s"], 0),
                "model_gflops_per_audio_second": round(roof["model_gflops_per_audio_second"], 3),
                "train_audio_s_per_s": round(train_tput, 2),
                "streaming_ms_per_hop_b1": round(ms_per_hop, 3),
                "streaming_hop_budget_ms": hop_budget_ms,
                "streaming_realtime_ok": bool(ms_per_hop < hop_budget_ms),
            }
        )
    )


if __name__ == "__main__":
    main()
