"""FullSubNet baseline (non-spiking, cIRM-mask output).

Re-design of reference audiozen/models/fullsubnet.py:9-149: full-band
GRU/LSTM over all bins + per-bin sub-band model over unfolded neighbors,
with the drop_band complexity trick and look-ahead time padding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..dsp.feature_norm import norm_wrapper
from ..dsp.mask import drop_band
from ..ops.freq_unfold import freq_unfold_per_bin
from .rnn_sequence_model import (
    RnnSequenceModelConfig,
    rnn_sequence_model_apply,
    rnn_sequence_model_init,
)


@dataclass(frozen=True)
class FullSubNetConfig:
    num_freqs: int
    look_ahead: int
    sequence_model: str  # "GRU" | "LSTM"
    fb_num_neighbors: int
    sb_num_neighbors: int
    fb_output_activate_function: str | None
    sb_output_activate_function: str | None
    fb_model_hidden_size: int
    sb_model_hidden_size: int
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2

    def fb_config(self) -> RnnSequenceModelConfig:
        return RnnSequenceModelConfig(
            input_size=self.num_freqs,
            output_size=self.num_freqs,
            hidden_size=self.fb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=self.sequence_model,
            output_activate_function=self.fb_output_activate_function or None,
        )

    def sb_config(self) -> RnnSequenceModelConfig:
        return RnnSequenceModelConfig(
            input_size=(self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1),
            output_size=2,
            hidden_size=self.sb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=self.sequence_model,
            output_activate_function=self.sb_output_activate_function or None,
        )


def fullsubnet_init(rng, cfg: FullSubNetConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "fb_model": rnn_sequence_model_init(k1, cfg.fb_config(), dtype),
        "sb_model": rnn_sequence_model_init(k2, cfg.sb_config(), dtype),
    }


def fullsubnet_apply(cfg: FullSubNetConfig, params, noisy_mag, drop_band_enabled: bool = True):
    """noisy_mag: [B, 1, F, T] -> cIRM [B, 2, F(/groups when dropped), T]
    (fullsubnet.py:73-149)."""
    assert noisy_mag.ndim == 4
    norm = norm_wrapper(cfg.norm_type)
    noisy_mag = jnp.pad(noisy_mag, ((0, 0), (0, 0), (0, 0), (0, cfg.look_ahead)))
    b, c, f, t = noisy_mag.shape
    assert c == 1

    fb_input = norm(noisy_mag).reshape(b, c * f, t)
    fb_output = rnn_sequence_model_apply(cfg.fb_config(), params["fb_model"], fb_input)
    fb_output = fb_output.reshape(b, 1, f, t)

    fb_unf = freq_unfold_per_bin(fb_output, cfg.fb_num_neighbors).reshape(
        b, f, cfg.fb_num_neighbors * 2 + 1, t
    )
    mag_unf = freq_unfold_per_bin(noisy_mag, cfg.sb_num_neighbors).reshape(
        b, f, cfg.sb_num_neighbors * 2 + 1, t
    )
    sb_input = jnp.concatenate([mag_unf, fb_unf], axis=2)  # [B, F, Fs+Ff, T]
    sb_input = norm(sb_input)

    if b > 1 and drop_band_enabled and cfg.num_groups_in_drop_band > 1:
        sb_input = drop_band(
            jnp.transpose(sb_input, (0, 2, 1, 3)), num_groups=cfg.num_groups_in_drop_band
        )
        f = sb_input.shape[2]
        sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))

    sb_input = sb_input.reshape(
        b * f, (cfg.sb_num_neighbors * 2 + 1) + (cfg.fb_num_neighbors * 2 + 1), t
    )
    sb_mask = rnn_sequence_model_apply(cfg.sb_config(), params["sb_model"], sb_input)
    sb_mask = jnp.transpose(sb_mask.reshape(b, f, 2, t), (0, 2, 1, 3))
    return sb_mask[:, :, :, cfg.look_ahead :]


def build(seed: int = 0, weight_init: bool = True, **model_args):
    for k, v in list(model_args.items()):
        if k.endswith("activate_function") and v is False:
            model_args[k] = None
    cfg = FullSubNetConfig(**model_args)
    params = fullsubnet_init(jax.random.PRNGKey(seed), cfg)
    return {
        "config": cfg,
        "apply": lambda c, p, s, x, train=False: {"cirm": fullsubnet_apply(c, p, x, train), "state": s},
        "params": params,
        "state": {},
    }
