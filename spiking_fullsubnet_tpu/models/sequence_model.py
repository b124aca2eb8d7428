"""SequenceModel family: pre-LN + (GSU | LSTM) stack + projection + activation.

Functional re-design of the reference SequenceModel / SubBandSequenceModel
(modeling_spiking_fullsubnet.py:12-169) and the frozen SequenceModel /
SubBandSequenceWrapper (model_low_freq.py:42-139,235-271). A single
implementation covers both generations: with num_spks=1 the frozen output
rearrange "(c fc df) t" coincides with the latest "(c fc df s) t".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange

from ..nn.core import (
    cast_floating,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    output_activation,
)
from ..ops.gsu import gsu_stack_apply, gsu_stack_init
from ..ops.rnn import lstm_apply, lstm_init

Array = jax.Array


@dataclass(frozen=True)
class SequenceModelConfig:
    input_size: int
    hidden_size: int
    num_layers: int
    sequence_model: str = "GSN"  # "GSN" (spiking) or "LSTM"
    proj_size: int = 0
    shared_weights: bool = False
    output_activate_function: Optional[str] = None
    bn: bool = False
    use_pre_layer_norm: bool = True
    # Mixed precision: run the recurrence/matmuls in this dtype (e.g.
    # "bfloat16" for the TPU MXU) while params/state/optimizer stay float32.
    # None = full precision. BN running statistics always update in float32.
    compute_dtype: Optional[str] = None
    # GSU execution backend: "auto" picks the Pallas TPU kernels
    # (ops/gsu_pallas.py) on TPU and the lax.scan reference elsewhere;
    # "scan"/"pallas" force one.
    backend: str = "auto"


def sequence_model_init(rng, cfg: SequenceModelConfig, dtype=jnp.float32):
    k_ln, k_stack, k_proj = jax.random.split(rng, 3)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    if cfg.use_pre_layer_norm:
        params["pre_ln"] = layer_norm_init(cfg.input_size, dtype)
    if cfg.sequence_model == "GSN":
        params["stack"], state["stack"] = gsu_stack_init(
            k_stack,
            cfg.input_size,
            cfg.hidden_size,
            cfg.num_layers,
            cfg.shared_weights,
            cfg.bn,
            dtype,
        )
    elif cfg.sequence_model == "LSTM":
        params["stack"] = lstm_init(k_stack, cfg.input_size, cfg.hidden_size, cfg.num_layers, dtype=dtype)
        state["stack"] = {}
    elif cfg.sequence_model in ("LIF", "ALIF"):
        from ..ops.lif import lif_dense_init

        sizes = [cfg.input_size] + [cfg.hidden_size] * cfg.num_layers
        params["stack"] = lif_dense_init(k_stack, sizes, dtype)
        state["stack"] = {}
    else:
        raise NotImplementedError(f"Sequence model {cfg.sequence_model} not implemented.")
    if cfg.proj_size > 0:
        params["proj"] = linear_init(k_proj, cfg.hidden_size, cfg.proj_size, dtype=dtype)
    return params, state


def sequence_model_apply(
    cfg: SequenceModelConfig,
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,  # [B, F, T]
    train: bool = False,
) -> Tuple[Array, List[Array], Dict[str, Any]]:
    """Returns (output [B, proj|H, T], all_layer_outputs (time-major), new_state).

    Mirrors SequenceModel.forward (modeling_spiking_fullsubnet.py:81-125):
    rearrange to time-major, optional pre-LayerNorm, backbone, projection
    (appended to all_layer_outputs for the synops proxies), activation.
    """
    assert x.ndim == 3, f"Input tensor must be 3D, but got {x.ndim}D."
    xt = jnp.transpose(x, (2, 0, 1))  # [T, B, F]

    out_dtype = xt.dtype
    if cfg.compute_dtype is not None:
        # Cast-at-boundary mixed precision: the scans/matmuls below run in
        # compute_dtype; grads return in float32 via astype's transpose.
        cdt = jnp.dtype(cfg.compute_dtype)
        xt = xt.astype(cdt)
        params = cast_floating(params, cdt)

    from ..nn.module_tracer import trace_activation

    if cfg.use_pre_layer_norm:
        xt = trace_activation("pre_ln", layer_norm_apply(params["pre_ln"], xt))

    new_state = state
    if cfg.sequence_model == "GSN":
        out, all_layer_outputs, new_stack_state = gsu_stack_apply(
            params["stack"],
            state["stack"],
            xt,
            cfg.hidden_size,
            cfg.shared_weights,
            train,
            backend=cfg.backend,
        )
        new_state = dict(state)
        new_state["stack"] = new_stack_state
    elif cfg.sequence_model in ("LIF", "ALIF"):
        # ALIF leaderboard-row backbone (freeze-phase neuron.py LIF family):
        # dense + (adaptive) leaky integrate-and-fire per layer, spikes out.
        from ..ops.lif import lif_dense_apply

        out, all_layer_outputs = lif_dense_apply(
            params["stack"], xt, adaptive=(cfg.sequence_model == "ALIF"), last_layer_spikes=True
        )
    else:  # LSTM: the reference LSTM path returns no layer outputs (forward_lstm)
        out = lstm_apply(params["stack"], xt, cfg.hidden_size)
        all_layer_outputs = []

    if cfg.proj_size > 0:
        out = trace_activation("proj", linear_apply(params["proj"], out))
        if cfg.sequence_model == "GSN":
            all_layer_outputs = all_layer_outputs + [out]

    out = output_activation(cfg.output_activate_function)(out)
    out = jnp.transpose(out, (1, 2, 0))  # [B, F', T]
    if cfg.compute_dtype is not None:
        out = out.astype(out_dtype)
    return out, all_layer_outputs, new_state


# --------------------------------------------------------------- sub-band wrapper


def subband_sequence_model_apply(
    cfg: SequenceModelConfig,
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,  # [B, N, C, fs, T]
    df_order: int,
    num_spks: int,
    train: bool = False,
):
    """SubBandSequenceModel.forward (modeling_spiking_fullsubnet.py:134-169).

    Folds the sub-band units into the batch (the TPU-width axis) and splits
    the projection back into deep-filter coefficients
    [B, df, S, N*fc, T, 2].
    """
    batch_size, num_subbands, num_channels, fs, t = x.shape
    assert num_channels == 1, "Only mono audio is supported."
    flat = rearrange(x, "b n c fs t -> (b n) (c fs) t")
    out, all_layer_outputs, new_state = sequence_model_apply(cfg, params, state, flat, train)
    out = rearrange(
        out,
        "(b n) (c fc df s) t -> b df s (n fc) t c",
        b=batch_size,
        s=num_spks,
        c=num_channels * 2,
        df=df_order,
    )
    return out, all_layer_outputs, new_state
