"""Serving forward on the whole-model Pallas kernel (ops/mega_eval.py).

Same signal path as models/fused_forward.py (reference call graph
modeling_spiking_fullsubnet.py:415-474) with the recurrent pipeline executed
by ONE Pallas kernel instead of an XLA scan: STFT, magnitude compression,
fullband pre-LayerNorm and the fullband first-layer input projection are
hoisted (big time-parallel MXU ops); deep filtering, Nyquist passthrough and
the iSTFT run after the kernel. The kernel keeps every weight and every
(h, c) carry VMEM-resident for the whole sequence.

This is the production enhance/serving path (eval only — training uses the
layered Pallas vjp kernels, spiking_fullsubnet.py scan_mode docs). It returns
the standard output dict minus the per-layer spike tensors: synops proxies
need the spike streams written to HBM, which costs ~2x the kernel's HBM
traffic — validation therefore keeps the fused-scan path (scan_mode="auto"),
and scan_mode="mega" is the explicit serving configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from ..dsp.spectral import istft_complex, stft_complex
from ..nn.core import cast_floating, layer_norm_apply
from ..ops.deep_filter import deep_filter
from ..ops.freq_unfold import freq_unfold
from ..ops import mega_eval as me

Array = jax.Array


def spiking_fullsubnet_mega_forward(cfg, params, state, noisy_y: Array):
    """Eval forward on the mega kernel. Drop-in for the layered/fused paths'
    output dict (enhanced_y / enhanced_mag / state), without the spike
    tensors (see module docstring)."""
    if not me.supported(cfg):
        raise ValueError("mega kernel requires the latest-generation config "
                         "(norm_type=None, GSN, fb neighbor widths 0)")
    assert noisy_y.ndim == 2, f"Input tensor must be 2D, but got {noisy_y.ndim}D."
    B, sequence_length = noisy_y.shape
    compute_dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else noisy_y.dtype
    acc_dtype = jnp.float32 if cfg.compute_dtype else noisy_y.dtype

    spec = stft_complex(noisy_y, cfg.n_fft, cfg.hop_length, cfg.win_length)  # [B, F+1, T]
    noisy_cmp = spec[:, None]
    noisy_mag = jnp.abs(spec)[:, None] ** cfg.fdrc
    noisy_mag = noisy_mag[..., :-1, :]  # [B, 1, 256, T]
    T = noisy_mag.shape[-1]

    fb_cfg = cfg.fb_config()
    fb_params = cast_floating(params["fb"], compute_dtype) if cfg.compute_dtype else params["fb"]

    # ---- hoisted fullband preprocessing (identical to fused_forward) ----
    fb_in = rearrange(noisy_mag[..., : cfg.fb_input_size, :], "b c f t -> t b (c f)")
    fb_in = fb_in.astype(compute_dtype)
    if fb_cfg.use_pre_layer_norm:
        fb_in = layer_norm_apply(fb_params["pre_ln"], fb_in)
    w_ih0 = fb_params["stack"]["layers"][0]["weight_ih"]
    xg_fb0 = jnp.matmul(
        fb_in.reshape(T * B, -1), w_ih0.T, preferred_element_type=acc_dtype
    ).reshape(T, B, -1)

    # ---- per-section noisy unfolds, n-major fold for the kernel ----
    noisy_secs = []
    for i in range(cfg.num_sections):
        lo, hi = cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1]
        ns = freq_unfold(noisy_mag, lo, hi, cfg.center_freq_sizes[i], cfg.neighbor_freq_sizes[i])
        noisy_secs.append(rearrange(ns, "b n c w t -> t n b (c w)").astype(compute_dtype))

    coefs = me.mega_eval(cfg, params, state, xg_fb0, noisy_secs)

    # ---- deep filtering (time-parallel, outside the kernel) ----
    num_filtered = 0
    enh_list = []
    for i, df_order in enumerate(cfg.df_orders):
        # coefs stay in io dtype (bf16 under the MP policy) through the
        # rearrange; deep_filter upcasts inside its fused multiply, so the
        # transpose + coefficient reads cost half the HBM bytes.
        coef = rearrange(
            coefs[i],
            "t n b (c fc df s) -> b df s (n fc) t c",
            s=cfg.num_spks, c=2, df=df_order,
        )
        nf = coef.shape[3]
        section_spec = noisy_cmp[..., num_filtered : num_filtered + nf, :]
        enh_list.append(deep_filter(section_spec, coef, df_order, cfg.num_spks))
        num_filtered += nf

    nyq = repeat(noisy_cmp[..., -1:, :], "b 1 f t -> b 1 s f t", s=cfg.num_spks)
    enh_stft = jnp.concatenate([jnp.concatenate(enh_list, axis=-2), nyq], axis=-2)

    if cfg.num_spks > 1:
        flat = rearrange(enh_stft, "b 1 s f t -> (b s) f t")
        enh_y = istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=sequence_length)
        return {
            "enhanced_y": rearrange(enh_y, "(b s) t -> b s t", s=cfg.num_spks),
            "state": state,
        }
    flat = rearrange(enh_stft, "b 1 1 f t -> b f t")
    return {
        "enhanced_y": istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=sequence_length),
        "enhanced_mag": jnp.abs(flat),
        "state": state,
    }
