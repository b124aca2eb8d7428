"""Fused single-scan forward for Spiking-FullSubNet.

The layered forward (spiking_fullsubnet.py) runs one `lax.scan` per GSU layer
per stack: 2 x (1 fullband + num_sections sub-band) = 8 sequential scans of T
steps each. Every step is a tiny matmul, so on TPU the model is bound by scan
-iteration dispatch overhead (~us/step), not FLOPs. But the whole model is
causal per-STFT-frame — the sub-band stack at frame t consumes only the
fullband output at frame t (the unfolds act on the frequency axis, never on
time; reference call graph at modeling_spiking_fullsubnet.py:415-474). So the
entire fb -> unfold -> sb pipeline legally fuses into ONE scan over frames,
cutting sequential scan iterations 8x. Deep filtering and the iSTFT stay
outside the scan (they are time-parallel).

What stays hoisted OUT of the scan (big MXU matmuls / gathers):
- STFT, magnitude compression, fullband pre-LayerNorm (per-frame op applied
  to the whole sequence at once),
- the fullband FIRST layer's input projection xg = x @ W_ih^T over [T*B, F],
- the noisy-magnitude frequency unfolds per section (pure gathers),
- deep filtering, Nyquist passthrough, iSTFT, synops tensor assembly.

What runs per step: fb layer cells, fb projection, the fullband-output
frequency gather (static indices), sub-band pre-LN + cells + projection per
section. Numerics match the layered path op-for-op; only matmul summation
order differs (input projections computed per-frame instead of batched over
T*B), which perturbs membranes at ~1e-7 in f32 — near-threshold neurons can
flip, exactly as between our layered path and the reference's per-step torch
loop. Tests therefore check exact equality in f64 and quality-parity in f32.

Supports train=True (per-step BatchNorm batch statistics, identical to
ops/gsu.py semantics) and the bf16 compute_dtype policy (bf16 matmuls, f32
accumulation/membranes). norm_type must be None (the latest-generation
model); the frozen generation's offline norms need full-sequence statistics
between fb and sb and keep the layered path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat

from ..dsp.spectral import istft_complex, stft_complex
from ..nn.core import cast_floating, layer_norm_apply, linear_apply, output_activation
from ..ops.deep_filter import deep_filter
from ..ops.freq_unfold import freq_unfold
from ..ops.gsu import bn_running_update, spike

Array = jax.Array


def _reflect_unfold_indices(lo: int, hi: int, ctr: int, nbr: int, num_freqs: int) -> np.ndarray:
    """Static gather indices replicating freq_unfold's section reflect-pad
    (ops/freq_unfold.py:43-58) directly into the full [num_freqs] axis."""
    n = (hi - lo) // ctr
    width = ctr + 2 * nbr
    pos = lo - nbr + np.arange(n)[:, None] * ctr + np.arange(width)[None, :]
    pos = np.abs(pos)  # left reflect around bin 0
    over = pos - (num_freqs - 1)
    pos = np.where(over > 0, (num_freqs - 1) - over, pos)  # right reflect
    return pos  # [N, width]


def _cell_step(layer_params, xg_t, rg_in, hidden: int, shared: bool, c, acc_dtype,
               bn_mode: Optional[str], bn_aux, compute_dtype,
               bn_mask=None, bn_count: Optional[int] = None):
    """One GSU cell timestep. xg_t: precomputed input gates [..., rows]
    (already in acc_dtype); rg_in: recurrent input spikes [..., H] (compute
    dtype). Leading axes are arbitrary batch dims (the sub-band stacks run
    [N, B, .] so the mesh can shard N over the band axis). Returns
    (hy, cy, stats). Math identical to ops/gsu._gsu_layer_apply.

    bn_mask/bn_count: when the sub-band axis is PADDED to a band-axis
    multiple (ragged sections), train-mode BatchNorm statistics must span
    only the real rows — bn_mask broadcasts over the batch axes (1 for
    real rows) and bn_count is the real row count.
    """
    w_hh_t = layer_params["weight_hh"].T
    b = layer_params["bias_ih"].astype(acc_dtype)
    b_f, b_c = b[:hidden], b[hidden:]
    rg = jnp.matmul(rg_in, w_hh_t, preferred_element_type=acc_dtype)
    if shared:
        f_in = xg_t + rg + b_f
        c_in = xg_t + rg + b_c
    else:
        f_in = xg_t[..., :hidden] + rg[..., :hidden] + b_f
        c_in = xg_t[..., hidden:] + rg[..., hidden:] + b_c
    f = jax.nn.sigmoid(f_in)
    cy = f * c + (1.0 - f) * c_in
    stats = ()
    batch_axes = tuple(range(cy.ndim - 1))  # all but the feature axis
    if bn_mode == "train":
        bn_w, bn_b = bn_aux
        if bn_mask is None:
            mean = jnp.mean(cy, axis=batch_axes)
            var = jnp.mean(jnp.square(cy - mean), axis=batch_axes)
        else:
            inv = 1.0 / bn_count
            mean = jnp.sum(cy * bn_mask, axis=batch_axes) * inv
            var = jnp.sum(jnp.square(cy - mean) * bn_mask, axis=batch_axes) * inv
        cy = (cy - mean) * jax.lax.rsqrt(var + 1e-5)
        cy = cy * bn_w + bn_b
        stats = (mean, var)
    elif bn_mode == "eval":
        bn_scale, bn_shift = bn_aux
        cy = cy * bn_scale + bn_shift
    hy = spike(cy)
    return hy.astype(compute_dtype), cy, stats


def _stack_step_aux(seq_cfg, params, state, train: bool, acc_dtype):
    """Per-layer BN auxiliaries for a stack: (mode, aux) per layer."""
    out = []
    for lp, ls in zip(params["stack"]["layers"], state["stack"]["layers"]):
        if "bn" not in lp:
            out.append((None, None))
        elif train:
            out.append(("train", (lp["bn"]["weight"].astype(acc_dtype),
                                  lp["bn"]["bias"].astype(acc_dtype))))
        else:
            rm = ls["bn"]["running_mean"]
            rv = ls["bn"]["running_var"]
            w32 = lp["bn"]["weight"].astype(rv.dtype)
            b32 = lp["bn"]["bias"].astype(rv.dtype)
            scale = w32 * jax.lax.rsqrt(rv + 1e-5)
            out.append(("eval", (scale.astype(acc_dtype), (b32 - rm * scale).astype(acc_dtype))))
    return out


def spiking_fullsubnet_fused_forward(cfg, params, state, noisy_y: Array, train: bool = False):
    """Drop-in replacement for the layered spiking_fullsubnet_apply
    (same output dict), executing the recurrent pipeline as ONE lax.scan."""
    if cfg.norm_type is not None:
        raise ValueError("fused scan supports norm_type=None (latest generation) only")
    if cfg.sequence_model != "GSN":
        raise ValueError("fused scan supports the GSN backbone only")

    assert noisy_y.ndim == 2, f"Input tensor must be 2D, but got {noisy_y.ndim}D."
    B, sequence_length = noisy_y.shape
    # With no MP policy both dtypes track the input (so f64 tests stay exact);
    # under bf16 the accumulators/membranes stay f32.
    compute_dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else noisy_y.dtype
    acc_dtype = jnp.float32 if cfg.compute_dtype else noisy_y.dtype
    H_fb, H_sb = cfg.fb_hidden_size, cfg.sb_hidden_size
    shared = cfg.shared_weights

    spec = stft_complex(noisy_y, cfg.n_fft, cfg.hop_length, cfg.win_length)  # [B, F+1, T]
    noisy_cmp = spec[:, None]
    noisy_mag = jnp.abs(spec)[:, None] ** cfg.fdrc
    noisy_mag = noisy_mag[..., :-1, :]  # [B, 1, 256, T]
    T = noisy_mag.shape[-1]

    fb_cfg = cfg.fb_config()
    fb_params = cast_floating(params["fb"], compute_dtype) if cfg.compute_dtype else params["fb"]
    sb_cfgs = [cfg.sb_config(i) for i in range(cfg.num_sections)]
    sb_params = [
        cast_floating(params["sb"][i], compute_dtype) if cfg.compute_dtype else params["sb"][i]
        for i in range(cfg.num_sections)
    ]

    # ---- hoisted fullband preprocessing (whole sequence at once) ----
    fb_in = rearrange(noisy_mag[..., : cfg.fb_input_size, :], "b c f t -> t b (c f)")
    fb_in = fb_in.astype(compute_dtype)
    if fb_cfg.use_pre_layer_norm:
        fb_in = layer_norm_apply(fb_params["pre_ln"], fb_in)
    w_ih0 = fb_params["stack"]["layers"][0]["weight_ih"]
    xg_fb0 = jnp.matmul(
        fb_in.reshape(T * B, -1), w_ih0.T, preferred_element_type=acc_dtype
    ).reshape(T, B, -1)

    # ---- sharding constraints (multi-chip): data shards the utterance
    # batch, band shards the folded sub-band axis N — the width dimension
    # SURVEY §2d names (modeling_spiking_fullsubnet.py:155). Sub-band
    # tensors keep N and B as SEPARATE leading axes through the scan, so
    # P(band, data) splits each utterance's sub-band GSU rows across the
    # band axis with zero per-step collectives (rows are independent;
    # weights replicate). Requires a mesh context at trace time.
    shard = cfg.data_axis or cfg.band_axis
    if shard:
        from jax.lax import with_sharding_constraint
        from jax.sharding import PartitionSpec as _P

        from ..parallel.mesh import current_axis_size

        band_size = current_axis_size(cfg.band_axis) if cfg.band_axis else None

        _p_fb = lambda x: with_sharding_constraint(  # [.., B, feat]
            x, _P(*([None] * (x.ndim - 2)), cfg.data_axis, None))

        def _p_sb(x):  # [.., N, B, feat]
            # Band-shard only when N provably divides the axis: GSPMD's
            # uneven-partition padding gives WRONG gradients for this padded
            # scanned axis (measured, jax 0.9 — see parallel/mesh.py
            # current_axis_size). Fail SAFE: when the mesh axis size cannot
            # be detected (band_size None), replicate instead of risking
            # silent numerical corruption on ragged sections.
            n = x.shape[-3]
            band = (
                cfg.band_axis
                if (band_size is not None and n % band_size == 0)
                else None
            )
            return with_sharding_constraint(
                x, _P(*([None] * (x.ndim - 3)), band, cfg.data_axis, None))
    else:
        band_size = None
        _p_fb = _p_sb = lambda x: x

    xg_fb0 = _p_fb(xg_fb0)

    # ---- hoisted noisy-magnitude unfolds per section (pure gathers) ----
    # Ragged sections (N not a multiple of the band axis) are EXPLICITLY
    # zero-padded to the next multiple so every section genuinely band-
    # shards: the partition is then even (no GSPMD uneven-partition
    # padding, whose gradients on this scanned axis are documented wrong —
    # parallel/mesh.py). Pad units are finite garbage rows: excluded from
    # train-mode BN statistics by mask, sliced off after the scan.
    noisy_sub_seq = []
    sub_rows = []
    sec_n_real: List[int] = []
    sec_n_pad: List[int] = []
    for i in range(cfg.num_sections):
        lo, hi = cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1]
        ns = freq_unfold(noisy_mag, lo, hi, cfg.center_freq_sizes[i], cfg.neighbor_freq_sizes[i])
        n_real = ns.shape[1]
        n_pad = -(-n_real // band_size) * band_size if band_size else n_real
        arr = rearrange(ns, "b n c w t -> t n b (c w)").astype(compute_dtype)
        if n_pad != n_real:
            arr = jnp.pad(arr, ((0, 0), (0, n_pad - n_real), (0, 0), (0, 0)))
        noisy_sub_seq.append(_p_sb(arr))
        sub_rows.append(B * n_real)
        sec_n_real.append(n_real)
        sec_n_pad.append(n_pad)

    if shard and os.environ.get("SFSN_INSPECT_SHARDING"):
        from jax.debug import inspect_array_sharding

        for i, ns in enumerate(noisy_sub_seq):
            inspect_array_sharding(
                ns,
                callback=lambda s, i=i, shp=tuple(ns.shape): print(
                    f"[sharding] sb section {i} activation [T,N,B,w]={shp}: {s}"),
            )
        inspect_array_sharding(
            xg_fb0,
            callback=lambda s, shp=tuple(xg_fb0.shape): print(
                f"[sharding] fb input-gate stream [T,B,G]={shp}: {s}"),
        )

    # static index maps for the per-step fullband-output unfolds (pad units
    # re-read unit 0's bins — values are masked/sliced, only finiteness
    # matters)
    num_repeats = (cfg.n_fft // 2 + 1) // cfg.fb_input_size
    full_f = cfg.num_freqs
    fb_idx = []
    for i in range(cfg.num_sections):
        idx = _reflect_unfold_indices(
            cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1], cfg.fb_ctrs[i],
            cfg.fb_nbrs[i], full_f)
        if sec_n_pad[i] != idx.shape[0]:
            idx = np.concatenate(
                [idx, np.repeat(idx[:1], sec_n_pad[i] - idx.shape[0], axis=0)])
        fb_idx.append(jnp.asarray(idx))

    # train-mode BN row masks for padded sections
    sb_masks = []
    for i in range(cfg.num_sections):
        if train and cfg.bn and sec_n_pad[i] != sec_n_real[i]:
            m = jnp.zeros((sec_n_pad[i], 1, 1), acc_dtype).at[: sec_n_real[i]].set(1.0)
            sb_masks.append(m)
        else:
            sb_masks.append(None)

    fb_bn = _stack_step_aux(fb_cfg, fb_params, state["fb"], train, acc_dtype)
    sb_bn = [
        _stack_step_aux(sb_cfgs[i], sb_params[i], state["sb"][i], train, acc_dtype)
        for i in range(cfg.num_sections)
    ]

    def zeros_hc(shape: Tuple[int, ...], h: int, con) -> Tuple[Array, Array]:
        return (con(jnp.zeros((*shape, h), compute_dtype)),
                con(jnp.zeros((*shape, h), acc_dtype)))

    carry0 = {
        "fb": [zeros_hc((B,), H_fb, _p_fb) for _ in range(fb_cfg.num_layers)],
        "sb": [[zeros_hc((sec_n_pad[i], B), H_sb, _p_sb)
                for _ in range(sb_cfgs[i].num_layers)]
               for i in range(cfg.num_sections)],
    }

    def step(carry, xs):
        xg0_t, noisy_t = xs  # [B, rows], list [R_i, w_i]
        new_fb = []
        out = None
        fb_spikes = []
        fb_stats = []
        for li, (lp, (bn_mode, bn_aux)) in enumerate(zip(fb_params["stack"]["layers"], fb_bn)):
            h, c = carry["fb"][li]
            if li == 0:
                xg_t = xg0_t
            else:
                xg_t = jnp.matmul(out, lp["weight_ih"].T, preferred_element_type=acc_dtype)
            hy, cy, st = _cell_step(lp, xg_t, h, H_fb, shared, c, acc_dtype, bn_mode, bn_aux, compute_dtype)
            new_fb.append((hy, cy))
            fb_spikes.append(hy)
            fb_stats.append(st)
            out = hy
        # synops records the projection pre-activation; the tiled fullband
        # feature uses post-activation (sequence_model.py:119-125 ordering)
        fb_proj = linear_apply(fb_params["proj"], out) if fb_cfg.proj_size > 0 else out
        fb_act = output_activation(fb_cfg.output_activate_function)(fb_proj)  # [B, 64]
        fb_full = jnp.tile(fb_act, (1, num_repeats))[:, :full_f]  # [B, 256]

        new_sb = []
        sb_outs = []
        sb_inputs = []
        sb_spikes = []
        sb_stats = []
        for i in range(cfg.num_sections):
            scfg = sb_cfgs[i]
            fb_sub = jnp.swapaxes(fb_full[:, fb_idx[i]], 0, 1)  # [N, B, w_fb]
            x_t = jnp.concatenate([noisy_t[i], fb_sub], axis=-1)  # [N, B, w']
            if scfg.use_pre_layer_norm:
                x_t = layer_norm_apply(sb_params[i]["pre_ln"], x_t)
            x_t = _p_sb(x_t)
            sb_inputs.append(x_t)
            sec_states = []
            sec_spikes = []
            sec_stats = []
            o = x_t
            for li, (lp, (bn_mode, bn_aux)) in enumerate(zip(sb_params[i]["stack"]["layers"], sb_bn[i])):
                h, c = carry["sb"][i][li]
                xg_t = jnp.matmul(o, lp["weight_ih"].T, preferred_element_type=acc_dtype)
                hy, cy, st = _cell_step(lp, xg_t, h, H_sb, shared, c, acc_dtype, bn_mode, bn_aux, compute_dtype,
                                        bn_mask=sb_masks[i], bn_count=sub_rows[i])
                sec_states.append((hy, cy))
                sec_spikes.append(hy)
                sec_stats.append(st)
                o = hy
            proj = linear_apply(sb_params[i]["proj"], o)  # pre-activation
            new_sb.append(sec_states)
            sb_outs.append(proj.astype(acc_dtype))
            sb_spikes.append(sec_spikes)
            sb_stats.append(sec_stats)

        new_carry = {"fb": new_fb, "sb": new_sb}
        ys = {
            "fb_spikes": fb_spikes,
            "fb_out": fb_proj.astype(acc_dtype),
            "sb_inputs": sb_inputs,
            "sb_spikes": sb_spikes,
            "sb_outs": sb_outs,
            "fb_stats": fb_stats,
            "sb_stats": sb_stats,
        }
        return new_carry, ys

    xs = (xg_fb0, noisy_sub_seq)
    _, ys = jax.lax.scan(step, carry0, xs)

    # slice the padded sub-band units back off ([T, n_pad, B, .] -> n_real)
    for i in range(cfg.num_sections):
        if sec_n_pad[i] != sec_n_real[i]:
            n = sec_n_real[i]
            ys["sb_inputs"][i] = ys["sb_inputs"][i][:, :n]
            ys["sb_outs"][i] = ys["sb_outs"][i][:, :n]
            ys["sb_spikes"][i] = [s[:, :n] for s in ys["sb_spikes"][i]]

    # ---- BN running-stat updates (closed form, matching ops/gsu.py) ----
    new_state = state
    if train and cfg.bn:
        def upd(layer_state, st, rows):
            means, vars_ = st  # [T, H]
            return {"bn": bn_running_update(layer_state["bn"], means, vars_, rows)}

        new_fb_layers = [
            upd(ls, st, B) for ls, st in zip(state["fb"]["stack"]["layers"], ys["fb_stats"])
        ]
        new_sb = []
        for i in range(cfg.num_sections):
            new_sb.append({"stack": {"layers": [
                upd(ls, st, sub_rows[i])
                for ls, st in zip(state["sb"][i]["stack"]["layers"], ys["sb_stats"][i])
            ]}})
        new_state = {"fb": {"stack": {"layers": new_fb_layers}}, "sb": new_sb}

    # ---- synops tensors (same layout as the layered path: time-major,
    # b-major folded rows — the scan's internal [T, N, B, .] layout folds
    # back so the two paths stay bitwise-comparable) ----
    _fold = lambda x: rearrange(x, "t n b w -> t (b n) w")
    fb_all_layer_outputs = [fb_in] + list(ys["fb_spikes"]) + (
        [ys["fb_out"]] if fb_cfg.proj_size > 0 else []
    )
    sb_all_layer_outputs = [
        [_fold(ys["sb_inputs"][i])] + [_fold(s) for s in ys["sb_spikes"][i]]
        + [_fold(ys["sb_outs"][i])]
        for i in range(cfg.num_sections)
    ]

    # ---- deep filtering (time-parallel, outside the scan) ----
    num_filtered = 0
    enh_list = []
    for i, df_order in enumerate(cfg.df_orders):
        act = output_activation(sb_cfgs[i].output_activate_function)
        coef = rearrange(
            act(ys["sb_outs"][i]),
            "t n b (c fc df s) -> b df s (n fc) t c",
            s=cfg.num_spks, c=2, df=df_order,
        )
        nf = coef.shape[3]
        section_spec = noisy_cmp[..., num_filtered : num_filtered + nf, :]
        enh = deep_filter(section_spec, coef, df_order, cfg.num_spks)
        enh_list.append(enh)
        num_filtered += nf

    enh_freqs = jnp.concatenate(enh_list, axis=-2)
    enh_stft = repeat(noisy_cmp, "b 1 f t -> b 1 s f t", s=cfg.num_spks)
    enh_stft = enh_stft.at[..., :-1, :].set(enh_freqs)  # Nyquist passthrough

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
    flat = rearrange(enh_stft, "b 1 1 f t -> b f t")
    return {
        "enhanced_y": istft_complex(flat, cfg.n_fft, cfg.hop_length, cfg.win_length, length=sequence_length),
        "enhanced_mag": jnp.abs(flat),
        "fb_all_layer_outputs": fb_all_layer_outputs,
        "sb_all_layer_outputs": sb_all_layer_outputs,
        "state": new_state,
    }
