"""Stream (serve) forward: hoisted time-parallel matmuls + fused kernels.

The round-3 profile of the serving path (batch 256 x 30 s, v5e) showed the
recurrence kernels cost ~78 ms while the surrounding GLUE — layout
transposes, per-section unfolds in [B, N, C, w, T] layout, pre-LayerNorms,
projections, deep-filter rearranges — cost ~180 ms, plus 61 ms of
STFT/iSTFT. This module removes the glue by construction (and round 5's
merged serving launch moves what remained INTO the kernel — see below):

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

Round-5 serving configurations (eval + collect_layer_outputs=False +
identity output activations), in order of preference:

1. MONOLITH (_serve_monolith -> ops/gsu_pallas.sfsb_monolith_serve_pallas):
   the ENTIRE model is one Pallas launch — in-kernel STFT from an audio hop
   ring, per-frame normalization statistics (pre-LN fold / cumulative
   running sum), fullband stack, per-unit layer-0 gates, section-batched
   sub-band stacks, output projection, deep filter against a noisy-spectrum
   ring, and the inverse DFT + overlap-add ring. HBM sees audio in, audio
   out, and weights (XLA: ~1 GB accessed per serving batch vs 88.9 GB for
   the round-4 formulation; 92 ms / 82k audio-s/s at batch 256 x 30 s).
   Requires causal statistics — offline_laplace_norm falls through to:

2. TWO-LAUNCH (gsu_sections_eval_pallas with in-kernel DF): fullband stack
   kernel + one merged-sections kernel computing the layer-0 gates from the
   magnitude/fullband streams, the stacks, projection and deep filter; the
   normalization scalars (any mode, including offline) stream in as
   alpha/beta. Used by the imported competition checkpoints (shipped
   configs use offline_laplace_norm).

Training and the synops-collecting eval use the per-section kernels below;
the multi-chip eval path keeps the fused scan (band/data sharding) — this
module is the single-chip serving configuration.
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
from ..dsp.mask import EPSILON
from .fused_forward import _reflect_unfold_indices

Array = jax.Array

LN_EPS = 1e-5

# perf-bisect escape hatch for the merged serving path (None in production;
# "alpha" returns the stage up to the normalization streams so its XLA cost
# can be measured in isolation; it also disables the monolith dispatch)
_DEBUG_STAGE = None


def stream_supported(cfg) -> bool:
    """Static config gate (single speaker; both generations).

    norm_type coverage: the frozen-generation input norms are per-(unit,
    frame) SCALAR divisions, so they commute through the hoisted layer-0
    matmul exactly like the pre-LN fold — xg = alpha * (x @ W) with alpha a
    [T, B, N] stream (offline: constant over T; cumulative: a prefix-sum).
    The published competition checkpoints (norm_type=offline_laplace_norm
    per their shipped configs; the recipe's cumulative_laplace_norm
    likewise) therefore serve on this fast path. A config combining
    norm_type WITH pre-LN is not hoistable in one scale (and exists in
    neither generation) — it falls back to the layered path.

    fb_proj_size > 0 is required because this path unconditionally uses the
    fullband projection (fb_params["proj"], idx_fb % fb_proj_size); proj-less
    configs fall back to the fused path via scan_mode='auto' (advisor r04).
    """
    norm_ok = cfg.norm_type in (
        None, "offline_laplace_norm", "cumulative_laplace_norm")
    no_ln_with_norm = cfg.norm_type is None or not (
        cfg.use_pre_layer_norm_fb or cfg.use_pre_layer_norm_sb)
    return (
        norm_ok
        and no_ln_with_norm
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


def _serve_monolith(cfg, params, state, noisy_y, m_spec, norm_mode, U, T, Tp,
                    fb_params, compute_dtype):
    """Whole-model single-launch serving (see _monolith_kernel): builds the
    stats columns, fullband fold, and hop chunks, runs the kernel, and
    overlap-trims + COLA-edge-fixes the audio. enhanced_mag and the synops
    tensors are not materialized on this path (collect_layer_outputs=False
    serving only)."""
    B, seq_len = noisy_y.shape
    H_sb, H_fb = cfg.sb_hidden_size, cfg.fb_hidden_size
    shared = cfg.shared_weights
    full_f = cfg.num_freqs
    Fp = _round_up(full_f + 1, 128)
    fbp = _round_up(cfg.fb_proj_size, 128)
    _, g_fb, off_c_fb = _gate_layout(H_fb, shared, True)
    fb_ln = bool(cfg.use_pre_layer_norm_fb)

    if norm_mode == "raw":
        sel_mag = sel_fb = None
    else:
        up = _round_up(U + 1, 8)
        sel_mag = np.zeros((Fp, up), np.float32)
        sel_fb = np.zeros((fbp, up), np.float32)
        u0 = 0
        for (cols_m, cols_f, w_tot_s, _), geo in zip(m_spec["sel"], m_spec["geom"]):
            n_s = geo[0]
            sel_mag[:full_f, u0:u0 + n_s] = cols_m / w_tot_s
            sel_fb[:cols_f.shape[0], u0:u0 + n_s] = cols_f / w_tot_s
            u0 += n_s
        # column U: the fullband input's own statistics (mean over its bins)
        sel_mag[:cfg.fb_input_size, U] = 1.0 / cfg.fb_input_size

    if fb_ln:
        wn_fb, _, u_fb, v_fb = _fold_ln_weights(
            fb_params, cfg.fb_input_size, H_fb, shared, g_fb, off_c_fb,
            compute_dtype)
        fb_uv = (u_fb, v_fb)
    else:
        w_ih0 = fb_params["stack"]["layers"][0]["weight_ih"].astype(compute_dtype)
        wn_fb = _place_cols(w_ih0.T, H_fb, shared, g_fb, off_c_fb)
        fb_uv = None
    fb_wa = jnp.pad(wn_fb, ((0, 128 - wn_fb.shape[0]), (0, 0)))

    hop = cfg.hop_length
    half = cfg.n_fft // 2
    M = Tp + 3
    y_pad = jnp.pad(noisy_y, ((0, 0), (half, 0)))
    need = M * hop
    y_pad = jnp.pad(y_pad, ((0, 0), (0, max(need - y_pad.shape[1], 0))))[:, :need]
    chunks = jnp.swapaxes(y_pad.reshape(B, M, hop), 0, 1)
    if cfg.compute_dtype:
        chunks = chunks.astype(compute_dtype)

    sec_geom = [(g[1], g[2]) for g in m_spec["geom"]]
    sec_f0 = [g[3] for g in m_spec["geom"]]
    spans = [
        sp if sp[0] + sp[1] <= _round_up(full_f, 128)
        else (0, _round_up(full_f, 128))
        for sp in m_spec["span"]
    ]
    out = gsu_pallas.sfsb_monolith_serve_pallas(
        chunks, fb_params["stack"], state["fb"]["stack"], fb_wa, fb_uv,
        fb_params["proj"]["weight"], fb_params["proj"]["bias"],
        m_spec["p"], m_spec["s"], m_spec["wa"], m_spec["wb"], m_spec["uv"],
        m_spec["wp"], m_spec["bp"], sec_geom, spans, sec_f0,
        sel_mag, sel_fb, norm_mode, fb_ln,
        H_sb, H_fb, shared, cfg.n_fft, hop, Tp, EPSILON, t_real=T)

    audio = jnp.swapaxes(out, 0, 1).reshape(B, Tp * hop)
    enhanced = audio[:, half: half + seq_len]
    # COLA start-edge correction (the constant 3/2 is folded into the
    # inverse-DFT matrices; only the first n_fft-hop samples of the padded
    # timeline deviate, of which edge-half land in the trimmed output)
    edge = cfg.n_fft - hop
    w2 = np.square(
        0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)))
    env = np.zeros(edge + cfg.n_fft)
    for k in range(4):
        env[k * hop:k * hop + cfg.n_fft] += w2
    nfix = min(edge - half, seq_len)
    if nfix > 0:
        fix = (1.5 / np.maximum(env[half:half + nfix], 1e-11)).astype(np.float32)
        enhanced = jnp.concatenate(
            [enhanced[:, :nfix] * jnp.asarray(fix)[None, :],
             enhanced[:, nfix:]], axis=1)
    # END edge: the reference iSTFT uses exactly T frames, whose OLA
    # envelope decays over the last n_fft-hop samples. The monolith's tail
    # frames (t >= T, zero audio) contribute zero SIGNAL but the folded
    # constant assumed their window share — rescale by c0/env_T there.
    t_full_T = cfg.n_fft + hop * (T - 1)
    j_lo = max(t_full_T - edge - half, nfix)
    if j_lo < seq_len:
        ps = np.arange(half + j_lo, half + seq_len)
        env_e = np.zeros(len(ps))
        for k in range(max(T - 4, 0), T):
            off = ps - k * hop
            msk = (off >= 0) & (off < cfg.n_fft)
            env_e[msk] += w2[off[msk]]
        fix_e = (1.5 / np.maximum(env_e, 1e-11)).astype(np.float32)
        enhanced = jnp.concatenate(
            [enhanced[:, :j_lo],
             enhanced[:, j_lo:] * jnp.asarray(fix_e)[None, :]], axis=1)
    return {
        "enhanced_y": enhanced,
        "enhanced_mag": None,  # not materialized on the monolith path
        "fb_all_layer_outputs": [],
        "sb_all_layer_outputs": [],
        "state": state,
    }


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
    if cfg.norm_type is not None:
        # frozen-generation input norm (model_low_freq.py:578): a scalar
        # division per (b[, t]), applied directly — 64 lanes, cheap. The
        # padded tail frames [T:Tp] read zero audio, so they never pollute
        # the real frames' statistics (cumulative is a prefix over t<=T;
        # offline sums are taken over [:T] explicitly).
        f_sum = jnp.sum(fb_in.astype(acc_dtype), axis=-1)  # [Tp, B]
        if cfg.norm_type == "cumulative_laplace_norm":
            cnt = jnp.arange(1, Tp + 1, dtype=acc_dtype)[:, None] * cfg.fb_input_size
            mu_fb = jnp.cumsum(f_sum, axis=0) / cnt
        else:  # offline_laplace_norm: utterance mean over the real frames
            mu_fb = jnp.broadcast_to(
                jnp.sum(f_sum[:T], axis=0)[None] / (cfg.fb_input_size * T),
                f_sum.shape)
        fb_ln = (fb_in.astype(acc_dtype) / (mu_fb[..., None] + EPSILON)
                 ).astype(compute_dtype)
    elif fb_cfg.use_pre_layer_norm:
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

    def _df_section(coef_p, n, ctr, df, f0):
        """Deep filtering: real-arithmetic complex FIR, FLAT [T, B, n*ctr].

        coef_p: [n, Tp, B, P>=2*df*ctr] in (c, d, fc) lane order per unit.
        Narrow minor dims are poison here: any [.., n, ctr] shape tempts
        XLA into ctr(=4)-lane physical tiles (3% lane utilization — the
        tap/transpose fusions measured 81 ms/section at 11 GB/s, xprof).
        So the units axis is folded into LANES once (transpose at the full
        padded lane width + ONE static lane permutation that makes every
        tap a contiguous [T, B, n*ctr] slice), and all FIR math runs on
        flat section-width tensors matching the spectrum slices."""
        P = coef_p.shape[-1]
        coef_tb = jnp.transpose(coef_p[:, :T], (1, 2, 0, 3)).reshape(T, B, n * P)
        # lane (c, d, u, fc)  <-  u * P + (c * df + d) * ctr + fc
        c_, d_, u_, fc_ = np.meshgrid(
            np.arange(2), np.arange(df), np.arange(n), np.arange(ctr),
            indexing="ij")
        perm = (u_ * P + (c_ * df + d_) * ctr + fc_).reshape(-1)
        cperm = jnp.take(coef_tb, jnp.asarray(perm), axis=-1)  # [T,B,2*df*n*ctr]
        w = n * ctr
        sr_ = re_t[:T, :, f0: f0 + w]
        si_ = im_t[:T, :, f0: f0 + w]
        if df > 1:
            zpad = jnp.zeros((df - 1,) + sr_.shape[1:], sr_.dtype)
            pr = jnp.concatenate([zpad, sr_], axis=0)
            pi = jnp.concatenate([zpad, si_], axis=0)
        er = ei = None
        for d in range(df):
            tr = pr[d: d + T] if df > 1 else sr_
            ti = pi[d: d + T] if df > 1 else si_
            cr = cperm[..., d * w: (d + 1) * w].astype(acc_dtype)
            ci = cperm[..., (df + d) * w: (df + d + 1) * w].astype(acc_dtype)
            t_re = tr * cr - ti * ci
            t_im = tr * ci + ti * cr
            er = t_re if er is None else er + t_re
            ei = t_im if ei is None else ei + t_im
        enh_re.append(er)
        enh_im.append(ei)

    # merged serving launch: gates + stacks + projection of ALL sections in
    # ONE Pallas kernel (gsu_pallas.gsu_sections_eval_pallas) — the xg0 and
    # spike HBM streams never exist. Activations must be identity (the
    # published configs' convention) and the synops spike tensors are not
    # produced (collect falls back to the per-section kernels).
    merged = (
        not train and use_pallas and not collect
        and all(not sb_cfgs[i].output_activate_function
                for i in range(cfg.num_sections))
    )
    m_spec: Dict[str, List[Any]] = {k: [] for k in (
        "p", "s", "wa", "wb", "uv", "wp", "bp", "sel", "span", "geom")}

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
        # input-scaling mode: every supported normalization is a per-unit
        # scalar stream alpha[T, B, n] applied AFTER the hoisted matmul
        # (scalars commute through it); pre-LN additionally needs the
        # mean-correction vectors u, v (see _fold_ln_weights).
        norm_mode = (
            "ln" if scfg.use_pre_layer_norm else
            "cum" if cfg.norm_type == "cumulative_laplace_norm" else
            "off" if cfg.norm_type == "offline_laplace_norm" else "raw")
        if norm_mode == "ln":
            wn, wfb, u, v = _fold_ln_weights(
                sb_params[i], w_noisy, H_sb, shared, g_sb, off_c_sb, compute_dtype)
        else:
            w_ih0 = sb_params[i]["stack"]["layers"][0]["weight_ih"].astype(compute_dtype)
            w_t0 = _place_cols(w_ih0.T, H_sb, shared, g_sb, off_c_sb)
            wn, wfb = w_t0[:w_noisy], w_t0[w_noisy:]
            u = v = None

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

        # projection with DF-friendly column order: permute the output
        # columns from the reference's (c, fc, df) lane order to (c, df, fc)
        # so each tap's coefficients are a CONTIGUOUS lane slice (consumed
        # by the in-kernel deep filter / the fallback DF below).
        # new row (c, d, fc) pulls old row (c, fc, d):
        # new_W[(c*df+d)*ctr+fc] = W[(c*ctr+fc)*df+d]
        df = cfg.df_orders[i]
        src = (np.arange(2)[:, None, None] * ctr * df
               + np.arange(ctr)[None, None, :] * df
               + np.arange(df)[None, :, None]).reshape(-1)
        w_proj = sb_params[i]["proj"]["weight"][src]
        b_proj = sb_params[i]["proj"]["bias"][src]

        if merged:
            # defer the normalization statistics: per-section dots emit
            # [T, B, n<=8]-lane tensors whose elementwise chains ran at
            # 10-40 GB/s (xprof: ~20 ms/batch); the post-loop combined pass
            # computes every section's stats in ONE [*, U] sweep.
            oh_nf = _one_hot_scatter(idx_noisy, full_f)  # full-width scatter
            fbp = _round_up(cfg.fb_proj_size, 128)
            wa_m = jnp.einsum("nwp,wj->npj", jnp.asarray(oh_nf, wn.dtype), wn)
            wb_m = jnp.einsum("nwp,wj->npj", jnp.asarray(oh_f, wfb.dtype), wfb)
            wb_m = jnp.pad(wb_m, ((0, 0), (0, fbp - wb_m.shape[1]), (0, 0)))
            m_spec["p"].append(sb_params[i]["stack"])
            m_spec["s"].append(state["sb"][i]["stack"])
            m_spec["wa"].append(wa_m)
            m_spec["wb"].append(wb_m)
            m_spec["uv"].append((u, v) if norm_mode == "ln" else None)
            m_spec["wp"].append(w_proj)
            m_spec["bp"].append(b_proj)
            m_spec["sel"].append((oh_nf.sum(axis=1).T, oh_f.sum(axis=1).T,
                                  w_tot, norm_mode))
            a0 = (a // 128) * 128
            m_spec["span"].append((a0, _round_up(b - a0, 128)))
            m_spec["geom"].append((n, ctr, df, num_filtered))
            num_filtered += n * ctr
            continue

        # under the bf16 policy the gate dots emit compute_dtype directly
        # (f32 MXU accumulation, converted on write) — f32 [T, ..., G]
        # temporaries are 7.5 GB for section 0 at serving batch and OOM.
        dot_out = compute_dtype if cfg.compute_dtype else acc_dtype
        mag_sec = mag_t[:, :, a:b]
        sec32 = mag_sec.astype(acc_dtype)
        fb32 = fb_act_c.astype(acc_dtype)
        mu = rstd = None
        alpha = beta = None  # xg = alpha * ck - beta * u + v
        if norm_mode == "ln":
            s1 = sec32 @ sel_n + fb32 @ sel_f  # [Tp, B, n]
            s2 = jnp.square(sec32) @ sel_n + jnp.square(fb32) @ sel_f
            mu = s1 / w_tot
            var = s2 / w_tot - jnp.square(mu)
            rstd = jax.lax.rsqrt(var + LN_EPS)
            alpha, beta = rstd, rstd * mu
        elif norm_mode == "cum":
            # cumulative_laplace_norm per flattened (b, n) over (w, t<=T)
            # (dsp/feature_norm.py:42-60 generalization of base_model.py:277)
            s1 = sec32 @ sel_n + fb32 @ sel_f
            cnt = jnp.arange(1, Tp + 1, dtype=acc_dtype)[:, None, None] * w_tot
            alpha = 1.0 / (jnp.cumsum(s1, axis=0) / cnt + EPSILON)
        elif norm_mode == "off":
            # offline_laplace_norm: ONE scalar per utterance per section
            # (mean over (N, w, T), base_model.py:252-274 applied to the
            # 5-D sub-band input) — real frames only
            s1 = sec32 @ sel_n + fb32 @ sel_f
            tot = jnp.sum(s1[:T], axis=(0, 2)) / (n * w_tot * T)  # [B]
            alpha = jnp.broadcast_to(
                (1.0 / (tot + EPSILON))[None, :, None], (Tp, B, n))
        u32 = u.astype(acc_dtype) if u is not None else None
        v32 = v.astype(acc_dtype) if v is not None else None
        units = []
        for k in range(n):
            ck = (
                jnp.matmul(mag_sec, wsc_n[:, k], preferred_element_type=dot_out)
                + jnp.matmul(fb_act_c, wsc_f[:, k], preferred_element_type=dot_out)
            )  # [Tp, B, g]
            if norm_mode == "raw":
                units.append(ck.astype(compute_dtype))
                continue
            al = alpha[:, :, k, None].astype(acc_dtype)
            xg_u = al * ck.astype(acc_dtype)
            if norm_mode == "ln":
                xg_u = xg_u - beta[:, :, k, None].astype(acc_dtype) * u32 + v32
            units.append(xg_u.astype(compute_dtype))
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
        hp_sb = _round_up(H_sb, 128) if padded else H_sb
        proj_p = (
            jnp.matmul(spikes[-1], _pad_w_rows(w_proj.T, hp_sb),
                       preferred_element_type=dot_out)
            + b_proj.astype(dot_out)
        )  # [n, Tp, B, 2*df*ctr] in (c, d, fc) lane order
        proj_p = output_activation(scfg.output_activate_function)(proj_p)

        _df_section(proj_p, n, ctr, df, num_filtered)
        num_filtered += n * ctr

        # synops contract: [ln_input, spikes..., proj] with (b n)-folded
        # rows. The LN'ed input is reconstructed only when consumed (the
        # serving jit DCEs this gather entirely). With
        # collect_layer_outputs=False the lists are empty (the kernel never
        # writes the non-final spike streams).
        if collect:
            # the gathered input is [Tp, B, n, w] — the contract's fold is
            # b-major (t (b n) w), matching fused.
            x_gather = jnp.concatenate(
                [mag_t[:, :, jnp.asarray(idx_noisy)],
                 fb_act_c[:, :, jnp.asarray(idx_fb)]],
                axis=-1).astype(acc_dtype)
            if norm_mode == "ln":
                ln_x = (x_gather - mu[..., None]) * rstd[..., None]
                ln_x = (
                    ln_x * sb_params[i]["pre_ln"]["weight"].astype(acc_dtype)
                    + sb_params[i]["pre_ln"]["bias"].astype(acc_dtype))
            elif norm_mode == "raw":
                ln_x = x_gather
            else:  # cum / off: the scalar division itself
                ln_x = x_gather * alpha[..., None].astype(acc_dtype)
            ln_x = ln_x.astype(compute_dtype).reshape(Tp, B * n, w_tot)
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

    if merged:
        U = sum(geo[0] for geo in m_spec["geom"])
        norm_mode = m_spec["sel"][0][3]  # uniform across sections

        # ---- whole-model MONOLITH launch (audio in -> audio out) ----
        # One kernel runs STFT, normalization statistics, fullband stack,
        # sub-band stacks, deep filter and iSTFT; HBM sees only audio and
        # weights. Causality requirement: "ln" stats are per-frame and
        # "cum" is a running sum (carried in scratch); offline_laplace_norm
        # needs the full sequence and stays on the two-launch path below.
        monolith_ok = (
            norm_mode in ("ln", "cum", "raw")
            and cfg.fdrc == 0.5
            and cfg.win_length == cfg.n_fft
            and cfg.n_fft == 4 * cfg.hop_length
            and Tp >= T + 3  # tail frames cover the COLA end edge
            and (norm_mode != "ln" or cfg.use_pre_layer_norm_fb)
            and (norm_mode == "ln" or not cfg.use_pre_layer_norm_fb)
            and ((norm_mode == "ln") == cfg.use_pre_layer_norm_sb)
            and not fb_cfg.output_activate_function
            and _DEBUG_STAGE is None
        )
        if monolith_ok:
            return _serve_monolith(
                cfg, params, state, noisy_y, m_spec, norm_mode, U, T, Tp,
                fb_params, compute_dtype)

        up = _round_up(U, 8)
        if norm_mode == "raw":
            alpha_all = beta_all = None
        else:
            # ONE combined stats sweep for every section's units: two wide
            # dots + one fused elementwise chain on [Tp, B, up]
            sel_mag = np.zeros((full_f, up), np.float32)
            sel_fb = np.zeros((cfg.fb_proj_size, up), np.float32)
            wt = np.ones((up,), np.float32)
            u0 = 0
            for (cols_m, cols_f, w_tot_s, _), geo in zip(m_spec["sel"], m_spec["geom"]):
                n_s = geo[0]
                sel_mag[:, u0:u0 + n_s] = cols_m
                sel_fb[:, u0:u0 + n_s] = cols_f
                wt[u0:u0 + n_s] = w_tot_s
                u0 += n_s
            mag32 = mag_t.astype(acc_dtype)
            fb32 = fb_act_c.astype(acc_dtype)
            s1 = mag32 @ jnp.asarray(sel_mag) + fb32 @ jnp.asarray(sel_fb)
            inv_wt = jnp.asarray(1.0 / wt)
            if norm_mode == "ln":
                s2 = (jnp.square(mag32) @ jnp.asarray(sel_mag)
                      + jnp.square(fb32) @ jnp.asarray(sel_fb))
                mu = s1 * inv_wt
                var = s2 * inv_wt - jnp.square(mu)
                rstd = jax.lax.rsqrt(var + LN_EPS)
                alpha_all = rstd.astype(jnp.float32)
                beta_all = (rstd * mu).astype(jnp.float32)
            elif norm_mode == "cum":
                cnt = jnp.arange(1, Tp + 1, dtype=acc_dtype)[:, None, None]
                alpha_all = (1.0 / (jnp.cumsum(s1, axis=0) * inv_wt / cnt
                                    + EPSILON)).astype(jnp.float32)
                beta_all = jnp.zeros_like(alpha_all)
            else:  # off: one scalar per (utterance, section), real frames only
                sec_sum = jnp.sum(s1[:T], axis=0)  # [B, up]
                al_cols = []
                for (_, _, w_tot_s, _), geo in zip(m_spec["sel"], m_spec["geom"]):
                    n_s = geo[0]
                    u0 = len(al_cols) and sum(x.shape[-1] for x in al_cols)
                    tot = jnp.sum(sec_sum[:, u0:u0 + n_s], axis=-1) / (
                        n_s * w_tot_s * T)
                    al_cols.append(jnp.broadcast_to(
                        (1.0 / (tot + EPSILON))[:, None], (B, n_s)))
                al = jnp.concatenate(al_cols, axis=-1)
                al = jnp.pad(al, ((0, 0), (0, up - U)))
                alpha_all = jnp.broadcast_to(al[None], (Tp, B, up)).astype(jnp.float32)
                beta_all = jnp.zeros_like(alpha_all)
        fbp = _round_up(cfg.fb_proj_size, 128)
        xb = fb_act_c
        if xb.shape[-1] != fbp:
            xb = jnp.pad(xb, ((0, 0), (0, 0), (0, fbp - xb.shape[-1])))
        if _DEBUG_STAGE == "alpha":
            return {"alpha": alpha_all, "beta": beta_all, "fb": fb_act_c,
                    "w": [m_spec["wa"], m_spec["wb"]]}
        sec_spec = []
        sec_geom = []
        for n, ctr, df, f0 in m_spec["geom"]:
            w = n * ctr
            sec_spec.append((re_t[:, :, f0: f0 + w], im_t[:, :, f0: f0 + w]))
            sec_geom.append((ctr, df))
        spans = [
            sp if sp[0] + sp[1] <= _round_up(full_f, 128) else None
            for sp in m_spec["span"]
        ]
        outs = gsu_pallas.gsu_sections_eval_pallas(
            m_spec["p"], m_spec["s"], m_spec["wa"], m_spec["wb"],
            m_spec["uv"], m_spec["wp"], m_spec["bp"],
            mag_t, xb, alpha_all, beta_all, H_sb, shared,
            sec_spec=sec_spec, sec_geom=sec_geom, sec_span=spans)
        for (er, ei) in outs:
            enh_re.append(er[:T])
            enh_im.append(ei[:T])

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
