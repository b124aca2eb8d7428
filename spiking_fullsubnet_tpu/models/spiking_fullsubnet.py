"""Spiking-FullSubNet: the flagship STFT-domain spiking denoiser.

Ground-up JAX re-design of the reference model
(audiozen/models/spiking_fullsubnet/modeling_spiking_fullsubnet.py:349-474),
parameterized to also express the frozen competition `Separator`
(recipes/intel_ndns/spiking_fullsubnet_freeze_phase/model_low_freq.py:485-618)
whose weights ship in the model zoo: optional input normalization
(`norm_type`) on fullband/sub-band inputs, separate fullband unfold widths,
and no pre-LayerNorm. With num_spks=1 and fb neighbor widths of 0 the two
generations share a single forward.

Pipeline (one jittable graph):
    wave [B,T]
      -> stft (hann 512/128, constant pad)           [B, 257, Tf]
      -> mag**fdrc, drop Nyquist                      [B, 1, 256, Tf]
      -> fullband GSU over lowest fb_input_size bins -> tiled across spectrum
      -> per-section frequency unfold (sub-band fold into batch)
      -> per-section sub-band GSU -> deep-filter coefficients
      -> complex deep filtering per section, Nyquist passthrough
      -> istft (length-trimmed)                       [B, T] (or [B, S, T])

TPU notes: every sub-band sequence is folded into the batch axis of one GSU
scan per section (3-4 sections, static Python loop), so the sequential work
is O(T) with all parallelism expressed as batch; that axis is what the mesh
shards (see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from ..dsp.feature_norm import norm_wrapper
from ..dsp.spectral import istft_complex, stft_complex
from ..ops.deep_filter import deep_filter
from ..ops.freq_unfold import freq_unfold
from ..nn.module_tracer import module_scope
from .sequence_model import (
    SequenceModelConfig,
    sequence_model_apply,
    sequence_model_init,
    subband_sequence_model_apply,
)

Array = jax.Array


@dataclass(frozen=True)
class SpikingFullSubNetConfig:
    n_fft: int = 512
    hop_length: int = 128
    win_length: int = 512
    fdrc: float = 0.5
    fb_input_size: int = 64
    fb_hidden_size: int = 320
    fb_num_layers: int = 2
    fb_proj_size: int = 64
    fb_output_activate_function: Optional[str] = None
    sb_hidden_size: int = 224
    sb_num_layers: int = 2
    freq_cutoffs: Tuple[int, ...] = (0, 32, 128, 256)
    df_orders: Tuple[int, ...] = (5, 3, 1)
    center_freq_sizes: Tuple[int, ...] = (4, 32, 64)
    neighbor_freq_sizes: Tuple[int, ...] = (15, 15, 15)
    # Fullband-output unfold widths; defaults reproduce the latest generation
    # (ctr = center_freq_sizes, nbr = 0, modeling_spiking_fullsubnet.py:249-255).
    fb_center_freq_sizes: Optional[Tuple[int, ...]] = None
    fb_neighbor_freq_sizes: Optional[Tuple[int, ...]] = None
    use_pre_layer_norm_fb: bool = True
    use_pre_layer_norm_sb: bool = True
    # Frozen-generation input normalization (model_low_freq.py:578,475); None
    # for the latest generation.
    norm_type: Optional[str] = None
    bn: bool = False
    shared_weights: bool = False
    sequence_model: str = "GSN"
    num_spks: int = 1
    # Shared sub-band ablation (model_low_freq_shared_subband.py intent):
    # when set, per-section Linear adapters feed ONE shared GSU stack of
    # this bottleneck width instead of per-section stacks.
    sb_shared_bottleneck: Optional[int] = None
    # Mixed precision for the fb/sb recurrences ("bfloat16" on TPU); the
    # complex deep-filtering/istft signal path stays float32 regardless.
    compute_dtype: Optional[str] = None
    # GSU execution backend for the layered path: "auto" picks the Pallas
    # TPU kernels on TPU and lax.scan elsewhere; "scan" forces the portable
    # scan (needed e.g. when jax.export-lowering for a non-TPU platform
    # while a TPU backend is live).
    backend: str = "auto"
    # Multi-chip activation sharding (fused path): mesh axis names for the
    # utterance batch (data_axis) and the folded sub-band dimension
    # (band_axis — the width axis of SURVEY §2d, reference
    # modeling_spiking_fullsubnet.py:155). When set, the fused scan keeps
    # [N, B] as separate axes and pins P(band, data) on every sub-band
    # activation/carry, so each utterance's sub-band GSU rows genuinely
    # split across the band axis (no per-step collectives — rows are
    # independent and weights replicate). Requires a mesh context at trace
    # time; None (default) is the single-chip/no-constraint path.
    data_axis: Optional[str] = None
    band_axis: Optional[str] = None
    # Execution strategy: "layered" runs one lax.scan per GSU layer per stack
    # (numerics reference); "fused" runs the whole causal fb->sb pipeline as
    # ONE scan over STFT frames (8x fewer sequential scan iterations — the
    # model is dispatch-bound on TPU, see models/fused_forward.py; also the
    # multi-chip band/data-sharded path); "stream" (TPU production) runs
    # hoisted time-parallel matmuls around recurrent-only Pallas stack
    # kernels in time-major layout (models/stream_forward.py) for both eval
    # and train. "auto" picks stream when supported, else fused/layered.
    scan_mode: str = "layered"
    # Whether forwards must materialize the per-layer spike tensors
    # (fb/sb_all_layer_outputs — consumed by the synops/neuronops metrics).
    # The stream serving path skips the non-final layers' HBM spike streams
    # entirely when False (~25% of its kernel write traffic at serving
    # batch); layered/fused always collect (XLA DCEs unused outputs there).
    collect_layer_outputs: bool = True

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2  # Nyquist dropped

    @property
    def num_sections(self) -> int:
        return len(self.center_freq_sizes)

    @property
    def fb_ctrs(self) -> Tuple[int, ...]:
        return self.fb_center_freq_sizes or self.center_freq_sizes

    @property
    def fb_nbrs(self) -> Tuple[int, ...]:
        return self.fb_neighbor_freq_sizes or tuple(0 for _ in self.center_freq_sizes)

    def fb_config(self) -> SequenceModelConfig:
        return SequenceModelConfig(
            input_size=self.fb_input_size,
            hidden_size=self.fb_hidden_size,
            num_layers=self.fb_num_layers,
            sequence_model=self.sequence_model,
            proj_size=self.fb_proj_size,
            shared_weights=self.shared_weights,
            output_activate_function=self.fb_output_activate_function or None,
            bn=self.bn,
            use_pre_layer_norm=self.use_pre_layer_norm_fb,
            compute_dtype=self.compute_dtype,
            backend=self.backend,
        )

    def sb_config(self, idx: int) -> SequenceModelConfig:
        ctr = self.center_freq_sizes[idx]
        nbr = self.neighbor_freq_sizes[idx]
        fb_ctr = self.fb_ctrs[idx]
        fb_nbr = self.fb_nbrs[idx]
        return SequenceModelConfig(
            input_size=(ctr + 2 * nbr) + (fb_ctr + 2 * fb_nbr),
            hidden_size=self.sb_hidden_size,
            num_layers=self.sb_num_layers,
            sequence_model=self.sequence_model,
            proj_size=2 * ctr * self.df_orders[idx] * self.num_spks,
            shared_weights=self.shared_weights,
            output_activate_function=None,
            bn=self.bn,
            use_pre_layer_norm=self.use_pre_layer_norm_sb,
            compute_dtype=self.compute_dtype,
            backend=self.backend,
        )


def spiking_fullsubnet_init(rng, cfg: SpikingFullSubNetConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, 1 + cfg.num_sections)
    fb_params, fb_state = sequence_model_init(keys[0], cfg.fb_config(), dtype)
    if cfg.sb_shared_bottleneck:
        from .shared_subband import shared_subband_init

        sb_params, sb_state = shared_subband_init(keys[1], cfg, dtype)
        return {"fb": fb_params, "sb": sb_params}, {"fb": fb_state, "sb": sb_state}
    sb_params, sb_states = [], []
    for i in range(cfg.num_sections):
        p, s = sequence_model_init(keys[1 + i], cfg.sb_config(i), dtype)
        sb_params.append(p)
        sb_states.append(s)
    return {"fb": fb_params, "sb": sb_params}, {"fb": fb_state, "sb": sb_states}


def _subband_forward(
    cfg: SpikingFullSubNetConfig,
    params,
    state,
    noisy_mag: Array,  # [B, 1, F, T]
    fb_output: Array,  # [B, 1, F, T]
    train: bool,
):
    """SubbandModel.forward (modeling_spiking_fullsubnet.py:216-263)."""
    if cfg.sb_shared_bottleneck:
        from .shared_subband import shared_subband_forward

        df_list, alos, new_stack = shared_subband_forward(
            cfg, params["sb"], state["sb"], noisy_mag, fb_output, train)
        return df_list, alos, new_stack

    df_coef_list = []
    all_layer_outputs = []
    new_states = []
    norm = norm_wrapper(cfg.norm_type) if cfg.norm_type else None
    for idx in range(cfg.num_sections):
        lo, hi = cfg.freq_cutoffs[idx], cfg.freq_cutoffs[idx + 1]
        noisy_sub = freq_unfold(
            noisy_mag, lo, hi, cfg.center_freq_sizes[idx], cfg.neighbor_freq_sizes[idx]
        )
        fb_sub = freq_unfold(fb_output, lo, hi, cfg.fb_ctrs[idx], cfg.fb_nbrs[idx])
        sb_input = jnp.concatenate([noisy_sub, fb_sub], axis=-2)
        if norm is not None:
            sb_input = norm(sb_input)
        with module_scope(f"sb{idx}"):
            out, sb_layer_outputs, ns = subband_sequence_model_apply(
                cfg.sb_config(idx),
                params["sb"][idx],
                state["sb"][idx],
                sb_input,
                cfg.df_orders[idx],
                cfg.num_spks,
                train,
            )
        df_coef_list.append(out)
        all_layer_outputs.append(sb_layer_outputs)
        new_states.append(ns)
    return df_coef_list, all_layer_outputs, new_states


def spiking_fullsubnet_apply(
    cfg: SpikingFullSubNetConfig,
    params,
    state,
    noisy_y: Array,  # [B, T]
    train: bool = False,
):
    """Forward (modeling_spiking_fullsubnet.py:415-474 / model_low_freq.py:561-618).

    Returns a dict:
        enhanced_y: [B, T] (num_spks == 1) or [B, S, T]
        enhanced_mag: [B, F, T] (num_spks == 1 only)
        fb_all_layer_outputs / sb_all_layer_outputs: spike tensors for synops
        state: updated BN running stats
    """
    assert noisy_y.ndim == 2, f"Input tensor must be 2D, but got {noisy_y.ndim}D."
    _, sequence_length = noisy_y.shape

    scan_mode = cfg.scan_mode
    if scan_mode == "auto":
        # Measured on v5e (batch 64 train / 256 eval, 2026-08): training is
        # fastest on the stream path's per-layer Pallas vjp kernels; offline
        # enhance is fastest on the STREAM path (models/stream_forward.py),
        # which internally dispatches the serving config to the whole-model
        # MONOLITH launch (82k audio-s/s) or the two-launch merged kernels,
        # falling back to the fused single-scan forward (which also carries
        # the multi-chip band/data sharding) and then layered.
        from ..ops import gsu_pallas
        from .stream_forward import stream_supported

        fused_ok = (cfg.norm_type is None and cfg.sequence_model == "GSN"
                    and not cfg.sb_shared_bottleneck)
        if stream_supported(cfg) and (not train or gsu_pallas.available()):
            # train picks stream only on TPU (the hoisted glue + per-layer
            # Pallas vjp kernels, 45->~30 ms/step at flagship-M batch 64);
            # CPU training keeps the layered scan reference path.
            scan_mode = "stream"
        elif train and gsu_pallas.available() and cfg.sequence_model == "GSN":
            scan_mode = "layered"
        elif fused_ok and not train:
            scan_mode = "fused"
        else:
            scan_mode = "layered"

    if scan_mode == "stream":
        from .stream_forward import spiking_fullsubnet_stream_forward

        return spiking_fullsubnet_stream_forward(cfg, params, state, noisy_y, train)

    if scan_mode == "fused":
        from .fused_forward import spiking_fullsubnet_fused_forward

        return spiking_fullsubnet_fused_forward(cfg, params, state, noisy_y, train)

    spec = stft_complex(noisy_y, cfg.n_fft, cfg.hop_length, cfg.win_length)  # [B, F, T]
    noisy_cmp = spec[:, None]  # [B, 1, F, T]
    noisy_mag = jnp.abs(spec)[:, None] ** cfg.fdrc
    noisy_mag = noisy_mag[..., :-1, :]  # drop Nyquist -> [B, 1, 256, T]

    norm = norm_wrapper(cfg.norm_type) if cfg.norm_type else None

    # Mixed precision for the recurrent glue: the unfold/tile/rearrange
    # between the stacks move multi-GB activation tensors at serving batch
    # sizes; carrying them in compute_dtype halves that HBM traffic. The
    # sequence models cast their inputs to compute_dtype anyway, so this is
    # numerically the same values reaching the matmuls; the complex
    # deep-filtering signal path (noisy_cmp) stays float32.
    if cfg.compute_dtype is not None and norm is None:
        noisy_mag = noisy_mag.astype(jnp.dtype(cfg.compute_dtype))

    # ---- fullband ----
    fb_input = noisy_mag[..., : cfg.fb_input_size, :]
    if norm is not None:
        fb_input = norm(fb_input)
    fb_input = rearrange(fb_input, "b c f t -> b (c f) t")
    with module_scope("fb"):
        fb_output, fb_all_layer_outputs, new_fb_state = sequence_model_apply(
            cfg.fb_config(), params["fb"], state["fb"], fb_input, train
        )
    fb_output = fb_output.astype(noisy_mag.dtype)[:, None]  # [B, 1, F', T]
    num_repeats = (cfg.n_fft // 2 + 1) // cfg.fb_input_size
    fb_output = jnp.tile(fb_output, (1, 1, num_repeats, 1))

    # ---- subband ----
    df_coef_list, sb_all_layer_outputs, new_sb_states = _subband_forward(
        cfg, params, state, noisy_mag, fb_output, train
    )

    # ---- deep filtering per section ----
    num_filtered = 0
    enh_list = []
    for df_coef, df_order in zip(df_coef_list, cfg.df_orders):
        nf = df_coef.shape[3]
        section_spec = noisy_cmp[..., num_filtered : num_filtered + nf, :]
        # coef layout [B, df, S, F, T, 2] == deep_filter's [B, C*df, S, F, T, 2] (C=1)
        enh = deep_filter(section_spec, df_coef, df_order, cfg.num_spks)  # [B, 1, S, F, T]
        enh_list.append(enh)
        num_filtered += nf

    # Nyquist passthrough (modeling_spiking_fullsubnet.py:461-470) — built by
    # concatenation instead of repeat + masked overwrite (one pass, not three)
    nyq = repeat(noisy_cmp[..., -1:, :], "b 1 f t -> b 1 s f t", s=cfg.num_spks)
    enh_stft = jnp.concatenate(
        [jnp.concatenate(enh_list, axis=-2), nyq], axis=-2
    )  # [B, 1, S, F, T]

    new_state = {"fb": new_fb_state, "sb": new_sb_states}

    if cfg.num_spks > 1:
        flat = rearrange(enh_stft, "b 1 s f t -> (b s) f t")
        enh_y = istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=sequence_length)
        enh_y = rearrange(enh_y, "(b s) t -> b s t", s=cfg.num_spks)
        return {
            "enhanced_y": enh_y,
            "fb_all_layer_outputs": fb_all_layer_outputs,
            "sb_all_layer_outputs": sb_all_layer_outputs,
            "state": new_state,
        }
    else:
        flat = rearrange(enh_stft, "b 1 1 f t -> b f t")
        enh_mag = jnp.abs(flat)
        enh_y = istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=sequence_length)
        return {
            "enhanced_y": enh_y,
            "enhanced_mag": enh_mag,
            "fb_all_layer_outputs": fb_all_layer_outputs,
            "sb_all_layer_outputs": sb_all_layer_outputs,
            "state": new_state,
        }


# --------------------------------------------------------------- TOML builder


def _norm_cfg_args(model_args: dict) -> dict:
    """TOML arg normalization: lists->tuples, false->None for activations."""
    out = {}
    for k, v in model_args.items():
        if isinstance(v, list):
            v = tuple(v)
        if k.endswith("activate_function") and v is False:
            v = None
        out[k] = v
    return out


def build(seed: int = 0, **model_args):
    """Model bundle for the trainer runtime: TOML [model] args -> dict with
    config/apply/params/state. The reference resolves a torch class here
    (instantiate, utils.py:75); this framework resolves a builder function."""
    cfg = SpikingFullSubNetConfig(**_norm_cfg_args(model_args))
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(seed), cfg)
    return {
        "config": cfg,
        "apply": spiking_fullsubnet_apply,
        "params": params,
        "state": state,
    }


def build_separator(seed: int = 0, **model_args):
    """Bundle for the frozen competition arg surface (model_low_freq.Separator)."""
    cfg = separator_config(**_norm_cfg_args(model_args))
    params, state = spiking_fullsubnet_init(jax.random.PRNGKey(seed), cfg)
    return {
        "config": cfg,
        "apply": spiking_fullsubnet_apply,
        "params": params,
        "state": state,
    }


# --------------------------------------------------------------- freeze-phase surface


def separator_config(
    *,
    sr: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: int = 512,
    fdrc: float = 0.5,
    num_freqs: int = 256,
    fb_freqs: int = 64,
    freq_cutoffs: Sequence[int] = (32, 128),
    sb_num_center_freqs: Sequence[int] = (4, 32, 64),
    sb_num_neighbor_freqs: Sequence[int] = (15, 15, 15),
    fb_num_center_freqs: Sequence[int] = (4, 32, 64),
    fb_num_neighbor_freqs: Sequence[int] = (0, 0, 0),
    fb_hidden_size: int = 320,
    sb_hidden_size: int = 224,
    sb_df_orders: Sequence[int] = (5, 3, 1),
    sequence_model: str = "GSN",
    fb_output_activate_function=False,
    sb_output_activate_function=False,
    norm_type: str = "offline_laplace_norm",
    shared_weights: bool = False,
    bn: bool = False,
) -> SpikingFullSubNetConfig:
    """Map the frozen `Separator` arg surface (model_low_freq.py:485-559) onto
    the unified config. "GSU" is the frozen name for the GSN backbone."""
    cutoffs = (0, *freq_cutoffs, num_freqs)
    return SpikingFullSubNetConfig(
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        fdrc=fdrc,
        fb_input_size=fb_freqs,
        fb_hidden_size=fb_hidden_size,
        fb_num_layers=2,
        fb_proj_size=fb_freqs,
        fb_output_activate_function=fb_output_activate_function or None,
        sb_hidden_size=sb_hidden_size,
        sb_num_layers=2,
        freq_cutoffs=cutoffs,
        df_orders=tuple(sb_df_orders),
        center_freq_sizes=tuple(sb_num_center_freqs),
        neighbor_freq_sizes=tuple(sb_num_neighbor_freqs),
        fb_center_freq_sizes=tuple(fb_num_center_freqs),
        fb_neighbor_freq_sizes=tuple(fb_num_neighbor_freqs),
        use_pre_layer_norm_fb=False,
        use_pre_layer_norm_sb=False,
        norm_type=norm_type,
        bn=bn,
        shared_weights=shared_weights,
        sequence_model="GSN" if sequence_model in ("GSU", "GSN") else sequence_model,
        num_spks=1,
    )
