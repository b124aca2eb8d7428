"""Full-band-only deep-filtering models: cIRM-GSN (spiking) / cIRM-LSTM.

Re-design of reference audiozen/models/cirm_gsn/modeling_cirm_gsn.py:162-268
and cirm_lstm/modeling_cirm_lstm.py:125-213 — a single SequenceModel over all
magnitude bins emitting deep-filter coefficients for every bin
(proj = F * spks * df * 2). The only structural difference between the two
reference files is the LSTM variant's pad-to-hop-multiple; both are options
here (pad_to_hop).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange

from ..dsp.spectral import istft_complex, stft_complex
from ..ops.deep_filter import deep_filter
from .sequence_model import (
    SequenceModelConfig,
    sequence_model_apply,
    sequence_model_init,
)

Array = jax.Array


@dataclass(frozen=True)
class CirmModelConfig:
    n_fft: int = 512
    hop_length: int = 128
    win_length: int = 512
    fdrc: float = 0.5
    input_size: int = 257
    hidden_size: int = 256
    num_layers: int = 2
    proj_size: int = 257
    output_activate_function: Optional[str] = None
    df_order: int = 3
    use_pre_layer_norm_fb: bool = True
    bn: bool = False
    shared_weights: bool = False
    sequence_model: str = "LSTM"  # "GSN" => cirm_gsn, "LSTM" => cirm_lstm
    num_spks: int = 2
    pad_to_hop: bool = False  # cirm_lstm pads input to a hop multiple (:184-185)
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" (params stay f32)

    def fb_config(self) -> SequenceModelConfig:
        return SequenceModelConfig(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            sequence_model=self.sequence_model,
            proj_size=self.proj_size * self.num_spks * self.df_order * 2,
            shared_weights=self.shared_weights,
            output_activate_function=self.output_activate_function or None,
            bn=self.bn,
            use_pre_layer_norm=self.use_pre_layer_norm_fb,
            compute_dtype=self.compute_dtype,
        )


def cirm_model_init(rng, cfg: CirmModelConfig, dtype=jnp.float32):
    params, state = sequence_model_init(rng, cfg.fb_config(), dtype)
    return {"fb": params}, {"fb": state}


def cirm_model_apply(cfg: CirmModelConfig, params, state, noisy_y: Array, train: bool = False):
    assert noisy_y.ndim == 2, f"Input tensor must be 2D, but got {noisy_y.ndim}D."
    _, sequence_length = noisy_y.shape

    if cfg.pad_to_hop:
        pad = cfg.hop_length - (sequence_length % cfg.hop_length)
        noisy_y = jnp.pad(noisy_y, ((0, 0), (0, pad)))

    spec = stft_complex(noisy_y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    noisy_cmp = spec[:, None]
    noisy_mag = jnp.abs(spec)[:, None] ** cfg.fdrc

    fb_input = rearrange(noisy_mag, "b c f t -> b (c f) t")
    fb_output, all_layer_outputs, new_state = sequence_model_apply(
        cfg.fb_config(), params["fb"], state["fb"], fb_input, train
    )
    df_coef = rearrange(
        fb_output, "b (c d s f) t -> b d s f t c", c=2, d=cfg.df_order, s=cfg.num_spks
    )

    enh_stft = deep_filter(noisy_cmp, df_coef, cfg.df_order, cfg.num_spks)  # [B, 1, S, F, T]

    out_state = {"fb": new_state}
    if cfg.num_spks > 1:
        flat = rearrange(enh_stft, "b 1 s f t -> (b s) f t")
        enh_y = istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=None if cfg.pad_to_hop else sequence_length)
        enh_y = enh_y[:, :sequence_length]
        enh_y = rearrange(enh_y, "(b s) t -> b s t", s=cfg.num_spks)
        return {"enhanced_y": enh_y, "all_layer_outputs": all_layer_outputs, "state": out_state}
    flat = rearrange(enh_stft, "b 1 1 f t -> b f t")
    enh_mag = jnp.abs(flat)
    enh_y = istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=None if cfg.pad_to_hop else sequence_length)
    enh_y = enh_y[:, :sequence_length]
    return {
        "enhanced_y": enh_y,
        "enhanced_mag": enh_mag,
        "all_layer_outputs": all_layer_outputs,
        "state": out_state,
    }


def build(seed: int = 0, **model_args):
    """TOML [model] builder (see spiking_fullsubnet.build)."""
    for k, v in list(model_args.items()):
        if k.endswith("activate_function") and v is False:
            model_args[k] = None
    cfg = CirmModelConfig(**model_args)
    params, state = cirm_model_init(jax.random.PRNGKey(seed), cfg)
    return {"config": cfg, "apply": cirm_model_apply, "params": params, "state": state}
