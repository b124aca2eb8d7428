"""Stream (serve) forward: hoisted time-parallel matmuls + recurrent-only kernels.

The round-3 profile of the serving path (batch 256 x 30 s, v5e) showed the
recurrence kernels cost ~78 ms while the surrounding GLUE — layout
transposes, per-section unfolds in [B, N, C, w, T] layout, pre-LayerNorms,
projections, deep-filter rearranges — cost ~180 ms, plus 61 ms of
STFT/iSTFT. This module removes the glue by construction:

- the ENTIRE pipeline is time-major [T, B, ...]: the STFT emits [T, B, F]
  directly (dsp/spectral.stft_real_imag_tmajor — the only transpose touches
  hop-chunked audio), and the iSTFT consumes it back;
- real/imag stay SEPARATE arrays end to end (complex packing costs a
  relayout pass per consumer on TPU); deep filtering is explicit
  real-arithmetic complex multiply-adds;
- the per-unit frequency unfold + concat + pre-LayerNorm + layer-0 input
  projection collapse into ONE matmul per section against a SCATTER-FOLDED
  weight matrix: LN(x) @ W == rstd * (x @ diag(ln_w) W) - (rstd*mu) *
  colsum + const, and the unfold (incl. reflect padding and the fullband
  tile-broadcast) is folded into the matrix by one-hot placement — so the
  noisy magnitude and the fullband output each feed a single aligned
  [T*B, w] @ [w, N*G] MXU matmul; NO gather ops anywhere;
- each GSU stack runs as ONE Pallas kernel with the layer-0 projection
  hoisted (ops/gsu_pallas.gsu_stack_eval_pallas_xg): weights + carries stay
  VMEM-resident, only the xg0 stream and per-layer spikes touch HBM;
- rows fold b-major (b n) so every [T, B, N, .] <-> [T, B*N, .] move is a
  pure reshape;
- T is block-aligned at the SOURCE (n_frames_out) so no [T, ...] tensor is
  ever pad-copied; the tail frames read zero audio and are sliced off
  before deep filtering.

The output dict preserves the full apply contract (enhanced_y/enhanced_mag/
all-layer spike tensors for synops) — unused outputs are dead-code
eliminated by XLA under jit, so serving pays nothing for them.

Numerics: identical math to models/fused_forward.py with three documented
re-associations (LN folded into the matmul; LN statistics accumulated in
f32; under the bf16 policy the DFT matmuls run bf16-in/f32-accum). Parity:
allclose in f64 vs the layered path (tests/test_stream_forward.py),
quality-parity in f32/bf16 on the competition checkpoints. Reference call
graph: modeling_spiking_fullsubnet.py:415-474.

Eval-only (the training path uses the layered Pallas vjp kernels); the
multi-chip eval path keeps the fused scan (band/data sharding) — this is
the single-chip serving configuration.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.spectral import (
    istft_real_imag_tmajor,
    num_frames,
    stft_real_imag_tmajor,
)
from ..nn.core import cast_floating, layer_norm_apply, output_activation
from ..ops import gsu_pallas
from ..ops.gsu import _gsu_layer_apply
from .fused_forward import _reflect_unfold_indices

Array = jax.Array

LN_EPS = 1e-5


def stream_supported(cfg) -> bool:
    """Static config gate (latest generation, single speaker).

    fb_proj_size > 0 is required because this path unconditionally uses the
    fullband projection (fb_params["proj"], idx_fb % fb_proj_size); proj-less
    configs fall back to the fused path via scan_mode='auto' (advisor r04).
    """
    return (
        cfg.norm_type is None
        and cfg.sequence_model == "GSN"
        and not cfg.sb_shared_bottleneck
        and cfg.num_spks == 1
        and cfg.data_axis is None
        and cfg.band_axis is None
        and cfg.fb_proj_size > 0
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gate_layout(H: int, shared: bool, padded: bool):
    """(real gate rows, kernel lane width, c-half offset)."""
    rows = H if shared else 2 * H
    if not padded:
        return rows, rows, H
    hp = _round_up(H, 128)
    return rows, (hp if shared else 2 * hp), hp


def _place_cols(w_t: Array, H: int, shared: bool, g: int, off_c: int) -> Array:
    """[in, rows_real] -> [in, g] with the f/c halves at kernel lane offsets."""
    if w_t.shape[1] == g:
        return w_t
    out = jnp.zeros((w_t.shape[0], g), w_t.dtype)
    if shared:
        return out.at[:, :H].set(w_t)
    return out.at[:, :H].set(w_t[:, :H]).at[:, off_c:off_c + H].set(w_t[:, H:])


def _fold_ln_weights(sb_params, w_noisy: int, H: int, shared: bool, g: int,
                     off_c: int, dtype):
    """Fold pre-LN into layer-0 input weights (see module docstring).

    Returns (Wn [w_noisy, g], Wf [wf, g], u [g], v [g]) — u is the column
    sum of the folded weights, v the ln-bias projection.
    """
    w_ih = sb_params["stack"]["layers"][0]["weight_ih"].astype(dtype)  # [rows, w']
    ln_w = sb_params["pre_ln"]["weight"].astype(dtype)  # [w']
    ln_b = sb_params["pre_ln"]["bias"].astype(dtype)
    w_t = w_ih.T  # [w', rows]
    w_fold = ln_w[:, None] * w_t
    u = jnp.sum(w_fold, axis=0)  # [rows]
    v = ln_b @ w_t  # [rows]
    w_fold = _place_cols(w_fold, H, shared, g, off_c)
    u = _place_cols(u[None, :], H, shared, g, off_c)[0]
    v = _place_cols(v[None, :], H, shared, g, off_c)[0]
    return w_fold[:w_noisy], w_fold[w_noisy:], u, v


def _one_hot_scatter(idx: np.ndarray, width: int) -> np.ndarray:
    """Static [N, w, width] one-hot of per-unit input-lane -> source-bin maps
    (reflect duplicates accumulate, matching the unfold semantics)."""
    n, w = idx.shape
    oh = np.zeros((n, w, width), np.float32)
    oh[np.arange(n)[:, None], np.arange(w)[None, :], idx] = 1.0
    return oh


def _stack_eval_scan_xg(params, state, xg0, hidden: int, shared: bool):
    """Scan-backend stack eval with hoisted layer-0 gates (CPU fallback /
    f64 parity oracle for the Pallas xg kernel)."""
    spikes, _ = _gsu_layer_apply(
        params["layers"][0], state["layers"][0], None, hidden, shared,
        train=False, precomputed_xg=xg0)
    outs = [spikes]
    for lp, ls in zip(params["layers"][1:], state["layers"][1:]):
        spikes, _ = _gsu_layer_apply(lp, ls, spikes, hidden, shared, train=False)
        outs.append(spikes)
    return outs[-1], outs, state


def _pad_w_rows(w_t: Array, hp: int) -> Array:
    """[H, out] -> [hp, out] with zero rows for the padded spike lanes."""
    if w_t.shape[0] == hp:
        return w_t
    return jnp.concatenate(
        [w_t, jnp.zeros((hp - w_t.shape[0], w_t.shape[1]), w_t.dtype)], axis=0)


def _stack_train_xg(params, state, xg0, hidden: int, shared: bool,
                    use_pallas: bool, compute_dtype, acc_dtype,
                    t_real: int):
    """Training stack with hoisted layer-0 gates: per-layer Pallas vjp
    kernels (recurrence + surrogate-gradient backward, exact batch-stat BN)
    with the inter-layer input projections as big time-parallel matmuls.

    Pallas mode streams PRE-PADDED bf16/f32 tensors end to end
    (gsu_layer_pallas_train_padded): xg0 [Tp, R, G] lane-padded, spikes
    stay [Tp, R, Hp] and the next layer's weights zero-pad the extra lanes
    — no pack/unpack/convert passes anywhere. Scan mode (CPU parity
    oracle) takes the unpadded [T, R, rows_real] layout.

    Returns (spikes_per_layer, new_stack_state).
    """
    from ..ops.gsu import bn_running_update

    spikes_list, new_layers = [], []
    cur = None
    hp = _round_up(hidden, 128)
    g = hp if shared else 2 * hp
    off_c = hp
    for k, (lp, ls) in enumerate(zip(params["layers"], state["layers"])):
        has_bn = "bn" in lp
        if use_pallas:
            if k == 0:
                xg = xg0
            else:
                w_pad = _pad_w_rows(
                    _place_cols(lp["weight_ih"].T, hidden, shared, g, off_c), hp)
                xg = jnp.matmul(cur, w_pad, preferred_element_type=acc_dtype
                                ).astype(compute_dtype)
            spk, stats = gsu_pallas.gsu_layer_pallas_train_padded(
                xg, lp["weight_hh"], lp["bias_ih"], hidden, shared,
                lp["bn"]["weight"] if has_bn else None,
                lp["bn"]["bias"] if has_bn else None,
                t_real=t_real)
            ns = ls
            if has_bn:
                means, vars_ = stats
                ns = {"bn": bn_running_update(ls["bn"], means, vars_, xg.shape[1])}
            spk = spk.astype(compute_dtype)  # [Tp, R, Hp] padded
        else:
            if k == 0:
                xg = xg0
            else:
                xg = jnp.matmul(cur, lp["weight_ih"].T,
                                preferred_element_type=acc_dtype)
            spk, ns = _gsu_layer_apply(
                lp, ls, None, hidden, shared, train=True, precomputed_xg=xg)
        spikes_list.append(spk)
        new_layers.append(ns)
        cur = spk
    return spikes_list, {"layers": new_layers}


def spiking_fullsubnet_stream_forward(cfg, params, state, noisy_y: Array,
                                      train: bool = False):
    """Forward in stream layout. Same output dict as the layered path.

    Eval: fused stack kernels with hoisted gates, state returned unchanged
    (BN uses running stats). Train: the same hoisted glue (fully
    differentiable — the LN fold and scatter dots autodiff into transposed
    matmuls) around the per-layer Pallas vjp train kernels, with BN
    running-state updates returned like the layered path.
    """
    if not stream_supported(cfg):
        raise ValueError("stream forward: unsupported config (see stream_supported)")
    assert noisy_y.ndim == 2, f"Input tensor must be 2D, but got {noisy_y.ndim}D."
    B, sequence_length = noisy_y.shape

    compute_dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else noisy_y.dtype
    acc_dtype = jnp.float32 if cfg.compute_dtype else noisy_y.dtype
    use_pallas = (
        gsu_pallas.available() or gsu_pallas._INTERPRET
    ) and acc_dtype == jnp.float32
    # bf16 DFT matmuls (f32 accumulation) only under the explicit
    # mixed-precision policy; quality-parity tested on the zoo checkpoints.
    dft_dtype = compute_dtype if cfg.compute_dtype else None
    H_fb, H_sb = cfg.fb_hidden_size, cfg.sb_hidden_size
    shared = cfg.shared_weights
    full_f = cfg.num_freqs  # 256 (Nyquist dropped)
    padded = use_pallas  # pre-padded streams end to end on the kernel path

    # ---- STFT (time-major re/im, block-aligned frame count) ----
    T = num_frames(sequence_length, cfg.n_fft, cfg.hop_length)
    Tp = _round_up(T, 128) if padded else T
    re_t, im_t = stft_real_imag_tmajor(
        noisy_y, cfg.n_fft, cfg.hop_length, cfg.win_length,
        n_frames_out=Tp, matmul_dtype=dft_dtype,
    )  # [Tp, B, F+1] each
    mag_t = (jnp.square(re_t) + jnp.square(im_t)) ** (cfg.fdrc / 2)
    mag_t = mag_t[..., :full_f].astype(compute_dtype)  # [Tp, B, 256]

    fb_params = cast_floating(params["fb"], compute_dtype) if cfg.compute_dtype else params["fb"]
    sb_params = [
        cast_floating(params["sb"][i], compute_dtype) if cfg.compute_dtype else params["sb"][i]
        for i in range(cfg.num_sections)
    ]
    fb_cfg = cfg.fb_config()
    sb_cfgs = [cfg.sb_config(i) for i in range(cfg.num_sections)]

    # ---- fullband stack ----
    fb_in = mag_t[..., : cfg.fb_input_size]  # [Tp, B, 64]
    if fb_cfg.use_pre_layer_norm:
        fb_ln = layer_norm_apply(fb_params["pre_ln"], fb_in)
    else:
        fb_ln = fb_in
    _, g_fb, off_c_fb = _gate_layout(H_fb, shared, padded)
    w0_fb = _place_cols(
        fb_params["stack"]["layers"][0]["weight_ih"].T, H_fb, shared, g_fb, off_c_fb)
    xg0_fb = jnp.matmul(
        fb_ln.reshape(Tp * B, -1), w0_fb, preferred_element_type=acc_dtype
    ).reshape(Tp, B, g_fb).astype(compute_dtype)

    collect = cfg.collect_layer_outputs
    new_fb_stack = state["fb"]["stack"]
    if train:
        fb_spikes, new_fb_stack = _stack_train_xg(
            fb_params["stack"], state["fb"]["stack"], xg0_fb, H_fb, shared,
            use_pallas, compute_dtype, acc_dtype, T)
    elif use_pallas:
        _, fb_spikes, _ = gsu_pallas.gsu_stack_eval_pallas_xg(
            fb_params["stack"], state["fb"]["stack"], xg0_fb, H_fb, shared,
            collect_all=collect, keep_padded=True)
        fb_spikes = [s.astype(compute_dtype) for s in fb_spikes]
    else:
        _, fb_spikes, _ = _stack_eval_scan_xg(
            fb_params["stack"], state["fb"]["stack"], xg0_fb, H_fb, shared)
    hp_fb = _round_up(H_fb, 128) if padded else H_fb
    fb_proj = (
        jnp.matmul(fb_spikes[-1],
                   _pad_w_rows(fb_params["proj"]["weight"].T, hp_fb),
                   preferred_element_type=acc_dtype)
        + fb_params["proj"]["bias"].astype(acc_dtype)
    )  # [Tp, B, 64]
    fb_act = output_activation(fb_cfg.output_activate_function)(fb_proj)
    fb_act_c = fb_act.astype(compute_dtype)

    # ---- per-section sub-band pipeline ----
    enh_re: List[Array] = []
    enh_im: List[Array] = []
    sb_alos: List[List[Array]] = []
    new_sb_stacks: List[Any] = []
    num_filtered = 0
    for i in range(cfg.num_sections):
        scfg = sb_cfgs[i]
        lo, hi = cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1]
        ctr, nbr = cfg.center_freq_sizes[i], cfg.neighbor_freq_sizes[i]
        n = (hi - lo) // ctr
        w_noisy = ctr + 2 * nbr
        wf = cfg.fb_ctrs[i] + 2 * cfg.fb_nbrs[i]
        w_tot = w_noisy + wf

        # static maps: per-unit source bins (reflect at spectrum edges; fb
        # indices fold the tile-broadcast back onto the projection lanes)
        idx_noisy = _reflect_unfold_indices(lo, hi, ctr, nbr, full_f)  # [n, w_noisy]
        idx_fb = (
            _reflect_unfold_indices(lo, hi, cfg.fb_ctrs[i], cfg.fb_nbrs[i], full_f)
            % cfg.fb_proj_size
        )
        a = int(idx_noisy.min())
        b = int(idx_noisy.max()) + 1
        oh_n = _one_hot_scatter(idx_noisy - a, b - a)  # [n, w_noisy, w_sec]
        oh_f = _one_hot_scatter(idx_fb, cfg.fb_proj_size)

        _, g_sb, off_c_sb = _gate_layout(H_sb, shared, padded)
        wn, wfb, u, v = _fold_ln_weights(
            sb_params[i], w_noisy, H_sb, shared, g_sb, off_c_sb, compute_dtype)

        # fold the unfold into the weights: PER-UNIT [T*B, w] @ [w, G] dots,
        # concatenated along the row axis. Every dot output is a plain
        # [T, B, G] row-major array and the (n b) row merge via
        # concatenate(axis=1) is a pure write — the single-big-dot variants
        # ([T,B,nG] 2D rhs or [t,b,n,g]/[t,n,b,g] 3D einsums) all measured
        # 13-31 ms of retiling copies per section at serving batch because
        # the (8,128) tile grid cannot be re-split across the folded axis.
        # scatter[p, n, j] = sum_w onehot[n, w, p] * W[w, j]
        wsc_n = jnp.einsum("nwp,wj->pnj", jnp.asarray(oh_n, wn.dtype), wn)
        wsc_f = jnp.einsum("nwp,wj->pnj", jnp.asarray(oh_f, wfb.dtype), wfb)
        sel_n = jnp.asarray(oh_n.sum(axis=1).T, acc_dtype)  # [w_sec, n]
        sel_f = jnp.asarray(oh_f.sum(axis=1).T, acc_dtype)  # [64, n]

        # under the bf16 policy the gate dots emit compute_dtype directly
        # (f32 MXU accumulation, converted on write) — f32 [T, ..., G]
        # temporaries are 7.5 GB for section 0 at serving batch and OOM.
        dot_out = compute_dtype if cfg.compute_dtype else acc_dtype
        mag_sec = mag_t[:, :, a:b]
        sec32 = mag_sec.astype(acc_dtype)
        fb32 = fb_act_c.astype(acc_dtype)
        s1 = sec32 @ sel_n + fb32 @ sel_f  # [Tp, B, n]
        s2 = jnp.square(sec32) @ sel_n + jnp.square(fb32) @ sel_f
        mu = s1 / w_tot
        var = s2 / w_tot - jnp.square(mu)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        u32, v32 = u.astype(acc_dtype), v.astype(acc_dtype)
        units = []
        for k in range(n):
            ck = (
                jnp.matmul(mag_sec, wsc_n[:, k], preferred_element_type=dot_out)
                + jnp.matmul(fb_act_c, wsc_f[:, k], preferred_element_type=dot_out)
            )  # [Tp, B, g]
            rs = rstd[:, :, k, None].astype(acc_dtype)
            units.append(
                (rs * ck.astype(acc_dtype)
                 - (rs * mu[:, :, k, None]) * u32 + v32).astype(compute_dtype))
        # units stack on the OUTERMOST axis — disjoint slab writes, no
        # retiling (a row-axis concatenate measured 13 ms/section)
        xg0 = jnp.stack(units, axis=0)  # [n, Tp, B, g]

        if train:
            # train runs rows-folded time-major (BN stats span all (n b)
            # rows); tensors are ~8x smaller than serving so the layout
            # conversions are cheap here
            spikes, ns = _stack_train_xg(
                sb_params[i]["stack"], state["sb"][i]["stack"],
                jnp.swapaxes(xg0, 0, 1).reshape(Tp, n * B, -1), H_sb, shared,
                use_pallas, compute_dtype, acc_dtype, T)
            new_sb_stacks.append(ns)
            spikes = [
                jnp.swapaxes(s.reshape(Tp, n, B, -1), 0, 1) for s in spikes]
        elif use_pallas:
            _, spikes, _ = gsu_pallas.gsu_stack_eval_pallas_xg(
                sb_params[i]["stack"], state["sb"][i]["stack"], xg0, H_sb, shared,
                collect_all=collect, keep_padded=True)
            spikes = [s.astype(compute_dtype) for s in spikes]  # [n, Tp, B, Hp]
        else:
            # scan fallback runs time-major [Tp, n*B, g] rows
            _, spikes, _ = _stack_eval_scan_xg(
                sb_params[i]["stack"], state["sb"][i]["stack"],
                jnp.swapaxes(xg0, 0, 1).reshape(Tp, n * B, -1), H_sb, shared)
            spikes = [
                jnp.swapaxes(s.reshape(Tp, n, B, -1), 0, 1) for s in spikes]
        # projection with DF-friendly column order: permute the output
        # columns from the reference's (c, fc, df) lane order to
        # (c, df, fc) so each tap's coefficients are a CONTIGUOUS lane
        # slice — the (c fc df) 6D reshape + strided slicing measured
        # ~25 ms of T-minor relayout fusions at serving batch.
        df = cfg.df_orders[i]
        # new row (c, d, fc) pulls old row (c, fc, d):
        # new_W[(c*df+d)*ctr+fc] = W[(c*ctr+fc)*df+d]
        src = (np.arange(2)[:, None, None] * ctr * df
               + np.arange(ctr)[None, None, :] * df
               + np.arange(df)[None, :, None]).reshape(-1)
        w_proj = sb_params[i]["proj"]["weight"][src]
        b_proj = sb_params[i]["proj"]["bias"][src]
        hp_sb = _round_up(H_sb, 128) if padded else H_sb
        proj_p = (
            jnp.matmul(spikes[-1], _pad_w_rows(w_proj.T, hp_sb),
                       preferred_element_type=dot_out)
            + b_proj.astype(dot_out)
        )  # [n, Tp, B, 2*df*ctr] in (c, d, fc) lane order
        proj_p = output_activation(scfg.output_activate_function)(proj_p)

        # ---- deep filtering: real-arithmetic complex FIR, units-major ----
        f0 = num_filtered
        sr_ = re_t[:T, :, f0 : f0 + n * ctr].reshape(T, B, n, ctr)
        si_ = im_t[:T, :, f0 : f0 + n * ctr].reshape(T, B, n, ctr)
        # taps to units-major [n, T, B, ctr] (small tensors — cheap)
        sr_ = jnp.transpose(sr_, (2, 0, 1, 3))
        si_ = jnp.transpose(si_, (2, 0, 1, 3))
        if df > 1:
            zpad = jnp.zeros(sr_.shape[:1] + (df - 1,) + sr_.shape[2:], sr_.dtype)
            pr = jnp.concatenate([zpad, sr_], axis=1)
            pi = jnp.concatenate([zpad, si_], axis=1)
        coef = proj_p[:, :T]  # [n, T, B, 2*df*ctr]
        er = ei = None
        for d in range(df):
            tr = pr[:, d : d + T] if df > 1 else sr_
            ti = pi[:, d : d + T] if df > 1 else si_
            cr = coef[..., d * ctr : (d + 1) * ctr].astype(acc_dtype)
            ci = coef[..., (df + d) * ctr : (df + d + 1) * ctr].astype(acc_dtype)
            t_re = tr * cr - ti * ci
            t_im = tr * ci + ti * cr
            er = t_re if er is None else er + t_re
            ei = t_im if ei is None else ei + t_im
        # back to [T, B, n*ctr] for the spectrum assembly
        enh_re.append(jnp.transpose(er, (1, 2, 0, 3)).reshape(T, B, n * ctr))
        enh_im.append(jnp.transpose(ei, (1, 2, 0, 3)).reshape(T, B, n * ctr))
        num_filtered += n * ctr

        # synops contract: [ln_input, spikes..., proj] with (b n)-folded
        # rows. The LN'ed input is reconstructed only when consumed (the
        # serving jit DCEs this gather entirely). With
        # collect_layer_outputs=False the lists are empty (the kernel never
        # writes the non-final spike streams).
        if collect:
            # mu/rstd are [Tp, n, B]; the gathered input is [Tp, B, n, w] —
            # the contract's fold is b-major (t (b n) w), matching fused.
            x_gather = jnp.concatenate(
                [mag_t[:, :, jnp.asarray(idx_noisy)],
                 fb_act_c[:, :, jnp.asarray(idx_fb)]],
                axis=-1).astype(acc_dtype)
            ln_x = (x_gather - mu[..., None]) * rstd[..., None]
            ln_x = (
                ln_x * sb_params[i]["pre_ln"]["weight"].astype(acc_dtype)
                + sb_params[i]["pre_ln"]["bias"].astype(acc_dtype)
            ).astype(compute_dtype).reshape(Tp, B * n, w_tot)
            # undo the units-major layout, spike lane padding, and the DF
            # column permutation: the contract is (t (b n) feat)
            to_bn = lambda x: jnp.transpose(x, (1, 2, 0, 3)).reshape(
                Tp, B * n, -1)
            inv = np.argsort(src)
            proj_orig = to_bn(proj_p)[..., jnp.asarray(inv)].astype(acc_dtype)
            sb_alos.append(
                [ln_x[:T]]
                + [to_bn(s[..., :H_sb])[:T] for s in spikes]
                + [proj_orig[:T]])

    # ---- Nyquist passthrough + iSTFT ----
    out_re = jnp.concatenate(enh_re + [re_t[:T, :, full_f:]], axis=-1)
    out_im = jnp.concatenate(enh_im + [im_t[:T, :, full_f:]], axis=-1)
    enhanced_y = istft_real_imag_tmajor(
        out_re, out_im, cfg.n_fft, cfg.hop_length, cfg.win_length,
        length=sequence_length, matmul_dtype=dft_dtype)

    if collect:
        fb_alos = [fb_ln[:T], *[s[:T, :, :H_fb] for s in fb_spikes]] + (
            [fb_proj[:T]] if fb_cfg.proj_size > 0 else [])
    else:
        fb_alos = []

    enhanced_mag = jnp.transpose(
        jnp.sqrt(jnp.square(out_re) + jnp.square(out_im)), (1, 2, 0))

    new_state = state
    if train and cfg.bn:
        new_state = {
            "fb": {"stack": new_fb_stack},
            "sb": [{"stack": s} for s in new_sb_stacks],
        }

    return {
        "enhanced_y": enhanced_y,
        "enhanced_mag": enhanced_mag,
        "fb_all_layer_outputs": fb_alos,
        "sb_all_layer_outputs": sb_alos,
        "state": new_state,
    }
