"""Analytic roofline / MFU accounting for the flagship model.

SURVEY.md §5a prescribes "jax.profiler traces + per-kernel roofline
accounting" as the TPU-native equivalent of the reference's absent
profiling subsystem. This module supplies the analytic half: FLOPs and
minimum HBM bytes per STFT frame derived from the model configuration, so
bench.py can report what fraction of the chip's speed-of-light the
measured throughput represents (the reference publishes no wall-clock
numbers — BASELINE.md — so "fraction of hardware peak" is the honest
denominator).

Counting convention: 1 MAC = 2 FLOPs; only matmul work is counted toward
MFU (elementwise gate math rides the VPU and is not MXU-limited);
byte counts assume the fused Pallas path (activations cross HBM once per
stack boundary; carries and inter-layer spikes stay in VMEM).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

# Public peak specs, TPU v5e (per chip): 197 TFLOP/s bf16, ~1/4 of that for
# f32 matmuls (the MXU is a bf16 systolic array), 819 GB/s HBM bandwidth.
CHIP_SPECS: Dict[str, Dict[str, float]] = {
    "tpu_v5e": {"bf16": 197e12, "f32": 49.25e12, "hbm_gbps": 819e9},
    "tpu_v4": {"bf16": 275e12, "f32": 68.75e12, "hbm_gbps": 1228e9},
}


@dataclass(frozen=True)
class ModelCost:
    flops_per_frame_per_item: float  # matmul FLOPs, one STFT frame, batch 1
    bytes_per_frame_per_item: float  # minimum HBM activation traffic
    frames_per_audio_second: float

    def flops_per_audio_second(self) -> float:
        return self.flops_per_frame_per_item * self.frames_per_audio_second

    def bytes_per_audio_second(self) -> float:
        return self.bytes_per_frame_per_item * self.frames_per_audio_second


def _gsu_stack_macs(input_size: int, hidden: int, num_layers: int,
                    shared: bool, proj: int) -> int:
    """Per-timestep MACs of one GSU stack + projection for one batch row."""
    rows = hidden if shared else 2 * hidden
    macs = 0
    fin = input_size
    for _ in range(num_layers):
        macs += fin * rows  # input projection
        macs += hidden * rows  # recurrent projection
        fin = hidden
    macs += hidden * proj
    return macs


def spiking_fullsubnet_cost(cfg, sample_rate: int = 16000,
                            dtype_bytes: int = 4) -> ModelCost:
    """Analytic cost of SpikingFullSubNetConfig per STFT frame, batch 1."""
    frames_per_second = sample_rate / cfg.hop_length

    fbc = cfg.fb_config()
    macs = _gsu_stack_macs(fbc.input_size, fbc.hidden_size, fbc.num_layers,
                           fbc.shared_weights, fbc.proj_size)
    act_elems = fbc.input_size + fbc.proj_size  # fb in/out across HBM

    for i in range(cfg.num_sections):
        sbc = cfg.sb_config(i)
        ctr = cfg.center_freq_sizes[i]
        width = cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i]
        n_units = width // ctr  # folded sub-band rows per batch item
        macs += n_units * _gsu_stack_macs(
            sbc.input_size, sbc.hidden_size, sbc.num_layers,
            sbc.shared_weights, sbc.proj_size)
        act_elems += n_units * (sbc.input_size + sbc.proj_size)
        # deep filtering: complex MAC per (df_order, freq) pair = 4 real MACs
        macs += 4 * cfg.df_orders[i] * width

    # STFT + iSTFT as framed matmul-DFT: [win] x [win, n_fft+2] each way
    macs += 2 * cfg.win_length * (cfg.n_fft + 2)
    act_elems += 2 * (cfg.n_fft + 2)

    return ModelCost(
        flops_per_frame_per_item=2.0 * macs,
        bytes_per_frame_per_item=float(dtype_bytes * act_elems),
        frames_per_audio_second=frames_per_second,
    )


def roofline_report(cfg, audio_seconds_per_second: float,
                    chip: str = "tpu_v5e", matmul_dtype: str = "bf16",
                    sample_rate: int = 16000) -> Dict[str, float]:
    """MFU + roofline fraction for a measured enhance throughput."""
    spec = CHIP_SPECS[chip]
    cost = spiking_fullsubnet_cost(
        cfg, sample_rate, dtype_bytes=2 if matmul_dtype == "bf16" else 4)
    achieved_flops = cost.flops_per_audio_second() * audio_seconds_per_second
    achieved_bytes = cost.bytes_per_audio_second() * audio_seconds_per_second
    peak_flops = spec[matmul_dtype if matmul_dtype in spec else "bf16"]
    # speed-of-light time per audio-second: compute and memory overlap
    t_flops = cost.flops_per_audio_second() / peak_flops
    t_bytes = cost.bytes_per_audio_second() / spec["hbm_gbps"]
    t_min = max(t_flops, t_bytes)
    return {
        "mfu": achieved_flops / peak_flops,
        "memory_bw_util": achieved_bytes / spec["hbm_gbps"],
        "fraction_of_roofline": t_min * audio_seconds_per_second,
        "bound": "compute" if t_flops >= t_bytes else "memory",
        "model_gflops_per_audio_second": cost.flops_per_audio_second() / 1e9,
        "roofline_audio_s_per_s": 1.0 / t_min,
        "chip": chip,
    }
