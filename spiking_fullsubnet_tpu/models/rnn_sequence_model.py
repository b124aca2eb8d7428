"""Generic RNN sequence wrapper: (GRU | LSTM) + fc + activation.

Re-design of reference audiozen/models/module/sequence_model.py:9-217 for
the conventional (non-spiking) models (FullSubNet). SharedGroupGRU /
LayerNormLSTM / Mogrifier variants of the reference are research spares not
used by any recipe; GRU/LSTM (uni/bidirectional) cover the used surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.core import linear_apply, linear_init, output_activation
from ..ops.rnn import gru_apply, gru_init, lstm_apply, lstm_init


@dataclass(frozen=True)
class RnnSequenceModelConfig:
    input_size: int
    output_size: int
    hidden_size: int
    num_layers: int
    bidirectional: bool = False
    sequence_model: str = "GRU"
    output_activate_function: Optional[str] = "Tanh"


def rnn_sequence_model_init(rng, cfg: RnnSequenceModelConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    if cfg.sequence_model == "GRU":
        stack = gru_init(k1, cfg.input_size, cfg.hidden_size, cfg.num_layers, cfg.bidirectional, dtype)
    elif cfg.sequence_model == "LSTM":
        stack = lstm_init(k1, cfg.input_size, cfg.hidden_size, cfg.num_layers, cfg.bidirectional, dtype)
    else:
        raise NotImplementedError(f"Not implemented {cfg.sequence_model}")
    params = {"stack": stack}
    if int(cfg.output_size):
        dirs = 2 if cfg.bidirectional else 1
        params["fc_output_layer"] = linear_init(k2, cfg.hidden_size * dirs, cfg.output_size, dtype=dtype)
    return params


def rnn_sequence_model_apply(cfg: RnnSequenceModelConfig, params, x):
    """x: [B, F, T] -> [B, output_size, T]."""
    xt = jnp.transpose(x, (2, 0, 1))  # [T, B, F]
    if cfg.sequence_model == "GRU":
        out = gru_apply(params["stack"], xt, cfg.hidden_size, cfg.bidirectional)
    else:
        out = lstm_apply(params["stack"], xt, cfg.hidden_size, cfg.bidirectional)
    if "fc_output_layer" in params:
        out = linear_apply(params["fc_output_layer"], out)
    out = output_activation(cfg.output_activate_function)(out)
    return jnp.transpose(out, (1, 2, 0))
