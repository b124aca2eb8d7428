"""Shared sub-band ablation: one GSU stack for ALL frequency sections.

Implements the intent of the reference's
recipes/intel_ndns/spiking_fullsubnet_freeze_phase/
model_low_freq_shared_subband.py: per-section Linear adapters project each
section's unfolded sub-band input into a common `bottleneck_size`, a SINGLE
shared GSU sequence model processes every section's units, and per-section
output Linears map the bottleneck features to that section's deep-filter
coefficients (LinearWrapper/SubbandProcessor, ibid.:41-160).

The reference implementation is unfinished and cannot run: its output loop
is empty and it returns an empty coefficient list (verified,
model_low_freq_shared_subband.py:294-300 — the loop body only recomputes
`upper_cutoff_freq`, the final concat is commented out). This version
completes the design, and does it TPU-first: all sections' units fold into
ONE batch for the shared stack — a single large recurrence instead of one
per section, which is exactly the shape the Pallas GSU kernels want.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange

from ..dsp.feature_norm import norm_wrapper
from ..nn.core import linear_apply, linear_init
from ..ops.freq_unfold import freq_unfold
from .sequence_model import (
    SequenceModelConfig,
    sequence_model_apply,
    sequence_model_init,
)

Array = jax.Array


def shared_subband_init(rng, cfg, dtype=jnp.float32):
    """Params/state for the shared sub-band processor.

    cfg is a SpikingFullSubNetConfig with sb_shared_bottleneck set; section
    geometry (cutoffs, center/neighbor widths, df orders) is reused as-is.
    """
    n_sections = cfg.num_sections
    keys = jax.random.split(rng, 2 * n_sections + 1)
    lin_in, lin_out = [], []
    for i in range(n_sections):
        in_size = cfg.sb_config(i).input_size
        ctr = cfg.center_freq_sizes[i]
        out_size = ctr * 2 * cfg.df_orders[i] * cfg.num_spks
        lin_in.append(linear_init(keys[2 * i], in_size, cfg.sb_shared_bottleneck, dtype=dtype))
        lin_out.append(linear_init(keys[2 * i + 1], cfg.sb_shared_bottleneck, out_size, dtype=dtype))
    stack_params, stack_state = sequence_model_init(keys[-1], shared_stack_config(cfg), dtype)
    return (
        {"lin_in": lin_in, "lin_out": lin_out, "stack": stack_params},
        {"stack": stack_state},
    )


def shared_stack_config(cfg) -> SequenceModelConfig:
    return SequenceModelConfig(
        input_size=cfg.sb_shared_bottleneck,
        hidden_size=cfg.sb_hidden_size,
        num_layers=cfg.sb_num_layers,
        sequence_model=cfg.sequence_model,
        proj_size=cfg.sb_shared_bottleneck,  # output_size=bottleneck (ref :142-152)
        shared_weights=cfg.shared_weights,
        output_activate_function=None,
        bn=cfg.bn,
        use_pre_layer_norm=cfg.use_pre_layer_norm_sb,
        compute_dtype=cfg.compute_dtype,
        backend=getattr(cfg, "backend", "auto"),
    )


def shared_subband_forward(
    cfg,
    params: Dict[str, Any],
    state: Dict[str, Any],
    noisy_mag: Array,  # [B, 1, F, T]
    fb_output: Array,  # [B, 1, F, T]
    train: bool = False,
) -> Tuple[List[Array], List[List[Array]], Dict[str, Any]]:
    """Returns (df_coef_list, all_layer_outputs, new_state) with the same
    contract as spiking_fullsubnet._subband_forward."""
    norm = norm_wrapper(cfg.norm_type) if cfg.norm_type else None

    # 1) per-section unfold + adapter into the common bottleneck
    unit_feats = []  # [B, N_i, bottleneck, T] per section
    n_units = []
    for idx in range(cfg.num_sections):
        lo, hi = cfg.freq_cutoffs[idx], cfg.freq_cutoffs[idx + 1]
        noisy_sub = freq_unfold(noisy_mag, lo, hi, cfg.center_freq_sizes[idx],
                                cfg.neighbor_freq_sizes[idx])
        fb_sub = freq_unfold(fb_output, lo, hi, cfg.fb_ctrs[idx], cfg.fb_nbrs[idx])
        sb_input = jnp.concatenate([noisy_sub, fb_sub], axis=-2)  # [B,N,1,fs,T]
        if norm is not None:
            sb_input = norm(sb_input)
        flat = rearrange(sb_input, "b n c fs t -> b n (c fs) t")
        feats = jnp.einsum(
            "bnft,of->bnot", flat, params["lin_in"][idx]["weight"]
        ) + params["lin_in"][idx]["bias"][None, None, :, None]
        unit_feats.append(feats)
        n_units.append(feats.shape[1])

    # 2) ONE shared recurrence over every section's units (folded into batch)
    batch = noisy_mag.shape[0]
    stacked = jnp.concatenate(unit_feats, axis=1)  # [B, N_total, bottleneck, T]
    flat = rearrange(stacked, "b n f t -> (b n) f t")
    out, all_layer_outputs, new_stack_state = sequence_model_apply(
        shared_stack_config(cfg), params["stack"], state["stack"], flat, train
    )
    out = rearrange(out, "(b n) f t -> b n f t", b=batch)

    # 3) per-section output adapters -> deep-filter coefficient layout
    df_coef_list = []
    offset = 0
    for idx in range(cfg.num_sections):
        sec = out[:, offset : offset + n_units[idx]]
        offset += n_units[idx]
        coefs = jnp.einsum(
            "bnft,of->bnot", sec, params["lin_out"][idx]["weight"]
        ) + params["lin_out"][idx]["bias"][None, None, :, None]
        coefs = rearrange(
            coefs,
            "b n (c fc df s) t -> b df s (n fc) t c",
            s=cfg.num_spks,
            c=2,
            df=cfg.df_orders[idx],
        )
        df_coef_list.append(coefs)

    return df_coef_list, [all_layer_outputs] * cfg.num_sections, {"stack": new_stack_state}
