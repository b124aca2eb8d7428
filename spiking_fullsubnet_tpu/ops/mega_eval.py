"""Whole-model Pallas eval kernel: fullband -> tile -> unfold -> sub-band.

The serving bottleneck is the recurrent pipeline: one fullband GSU stack
followed by per-section sub-band GSU stacks, strictly causal per STFT frame
(reference call graph modeling_spiking_fullsubnet.py:415-474). The fused XLA
scan (models/fused_forward.py) already collapses it to ONE scan, but every
timestep still round-trips carries + inter-stack activations through HBM and
re-fetches every weight matrix, so the model runs at ~10% of its roofline
(BENCH_r02). This kernel keeps the ENTIRE recurrent state machine resident:

- all weights of all stacks (≈2.7 MB bf16 at flagship-M) live in VMEM for
  the whole sequence;
- (h, c) carries of every layer of every stack live in VMEM scratch across
  grid steps;
- the fullband->sub-band hand-off (projection, activation, the tile-by-4
  spectrum broadcast, and the per-section fb unfolds) happens in-register:
  with fb_neighbor widths of 0 (the latest generation) the unfold indices
  are contiguous mod-proj_size lane slices of the fullband output
  (fused_forward._reflect_unfold_indices degenerates to `lo + n*ctr`);
- sub-band pre-LayerNorm runs in f32 inside the kernel (zero-padded lanes
  contribute nothing: var = E[x^2] - mu^2 over the real width).

Streamed through the grid pipeline per frame block, all at REAL (unpadded)
widths so HBM traffic is minimal: the hoisted fullband first-layer input
projections xg0 [T,B,{H|2H}] (f32, computed outside as one MXU-friendly
matmul; lane-padding to the gate width happens in-register), the per-section
noisy-magnitude unfolds [T,N,B,w_noisy] (io dtype), and the deep-filter
coefficient outputs [T,N,B,proj] (io dtype — under the bf16 policy the
coefficients are bf16 like every other recurrent activation; the complex
deep-filtering itself stays f32 outside).

Layout: sub-band rows fold n-major ([T, N, B, w] blocks, so a batch block
is contiguous in every dimension); the model-level wrapper
(models/mega_forward.py) rearranges to/from the reference's b-major fold.

Numerics match models/fused_forward.py op-for-op (same hoisted xg0, same
cell math, same eval-BN folded affine); only matmul summation order differs.
Parity: exact in f64 (interpret mode), quality-parity in f32/bf16 —
tests/test_mega_eval.py.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gsu_pallas import BN_EPS, _round_up, compiler_params, vmem_budget

LN_EPS = 1e-5  # torch.nn.LayerNorm default (nn/core.py:74)

_INTERPRET = False  # flipped by tests on CPU


@dataclass(frozen=True)
class _SectionPlan:
    n: int            # sub-band units in this section
    w_noisy: int      # noisy unfold width (ctr + 2*nbr)
    w_tot: int        # w_noisy + fb center width
    wf: int           # fb center width inserted per unit
    fb_cols: Tuple[int, ...]  # per-unit fullband lane offset (mod proj_size)
    hidden: int
    num_layers: int
    proj: int
    pre_ln: bool
    out_act: Optional[str]


@dataclass(frozen=True)
class _MegaPlan:
    fb_hidden: int
    fb_layers: int
    fb_proj: int
    fb_out_act: Optional[str]
    shared: bool
    sections: Tuple[_SectionPlan, ...]
    b_blk: int
    t_blk: int
    n_b: int
    n_t: int
    bp: int
    tp: int


def _act(name: Optional[str]):
    """In-kernel output activation (nn/core.py:112-130 vocabulary)."""
    if not name:
        return lambda x: x
    key = str(name).lower()
    return {
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "relu": jax.nn.relu,
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    }[key]


# ----------------------------------------------------------------- planning


def _divisor_at_most(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1)."""
    best = 1
    for d in range(1, cap + 1):
        if n % d == 0:
            best = d
    return best


def plan(cfg, T: int, B: int, io_bytes: int) -> _MegaPlan:
    """Choose (b_blk, t_blk) so weights + carries + streams fit in VMEM.

    Overridable for tuning sweeps via SFSN_MEGA_B_BLK / SFSN_MEGA_T_BLK.
    t_blk prefers divisors of T (no time padding copy); b_blk defaults to
    the measured sweet spot of 128 rows (bench_mega_sweep, v5e).
    """
    shared = cfg.shared_weights
    sections: List[_SectionPlan] = []
    for i in range(cfg.num_sections):
        sbc = cfg.sb_config(i)
        lo, hi = cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1]
        ctr = cfg.center_freq_sizes[i]
        n = (hi - lo) // ctr
        wf = cfg.fb_ctrs[i]
        sections.append(_SectionPlan(
            n=n,
            w_noisy=ctr + 2 * cfg.neighbor_freq_sizes[i],
            w_tot=sbc.input_size,
            wf=wf,
            fb_cols=tuple((lo + k * wf) % cfg.fb_proj_size for k in range(n)),
            hidden=sbc.hidden_size,
            num_layers=sbc.num_layers,
            proj=sbc.proj_size,
            pre_ln=sbc.use_pre_layer_norm,
            out_act=sbc.output_activate_function,
        ))

    hp_fb = _round_up(cfg.fb_hidden_size, 128)
    g_fb = hp_fb if shared else 2 * hp_fb
    pp_fb = _round_up(cfg.fb_proj_size, 128)

    def weights_bytes() -> int:
        wb = io_bytes * (max(cfg.fb_num_layers - 1, 1) * hp_fb * g_fb
                         + cfg.fb_num_layers * hp_fb * g_fb + hp_fb * pp_fb)
        wb += 4 * (cfg.fb_num_layers * 4 * hp_fb + pp_fb)
        for s in sections:
            hp = _round_up(s.hidden, 128)
            g = hp if shared else 2 * hp
            wp = _round_up(s.w_tot, 128)
            pp = _round_up(s.proj, 128)
            wb += io_bytes * (wp * g + max(s.num_layers - 1, 1) * hp * g
                              + s.num_layers * hp * g + hp * pp)
            wb += 4 * (s.num_layers * 4 * hp + 2 * wp + pp)
        return wb

    def carries_bytes(b_blk: int) -> int:
        cb = cfg.fb_num_layers * b_blk * hp_fb * (io_bytes + 4)
        for s in sections:
            hp = _round_up(s.hidden, 128)
            cb += s.num_layers * s.n * b_blk * hp * (io_bytes + 4)
        return cb

    def stream_bytes_per_t(b_blk: int) -> int:
        sb = 4 * b_blk * g_fb  # xg0 f32 at padded gate width
        for s in sections:
            sb += s.n * b_blk * io_bytes * (
                _round_up(s.w_noisy, 128) + _round_up(s.proj, 128))
        return sb

    budget = vmem_budget()
    wb = weights_bytes()
    # Total sequential steps = (B/b_blk)*T, so the largest batch block that
    # fits wins on step-count — but the kernel is bound per-row (VPU/layout
    # work scales with rows), so 256 only edges out 128 by ~0.5% at
    # flagship-M on v5e (measured; 512 fails to compile). Cap at 256.
    b_blk = min(_round_up(max(B, 8), 16), 256)
    if os.environ.get("SFSN_MEGA_B_BLK"):
        b_blk = int(os.environ["SFSN_MEGA_B_BLK"])
    while True:
        avail = budget - wb - carries_bytes(b_blk)
        t_blk = max(avail // (2 * stream_bytes_per_t(b_blk)), 0)  # double buffered
        t_blk = min(t_blk, 32, T)
        t_blk = _divisor_at_most(T, t_blk) if t_blk >= 1 else 0
        if t_blk >= 1:
            break
        if os.environ.get("SFSN_MEGA_B_BLK"):
            t_blk = 1
            break
        b_blk //= 2
        if b_blk < 16:
            raise ValueError("mega eval kernel: model exceeds VMEM budget")
    if os.environ.get("SFSN_MEGA_T_BLK"):
        t_blk = int(os.environ["SFSN_MEGA_T_BLK"])

    bp = _round_up(max(B, 8), b_blk)
    tp = _round_up(T, t_blk)
    return _MegaPlan(
        fb_hidden=cfg.fb_hidden_size,
        fb_layers=cfg.fb_num_layers,
        fb_proj=cfg.fb_proj_size,
        fb_out_act=cfg.fb_output_activate_function or None,
        shared=shared,
        sections=tuple(sections),
        b_blk=b_blk,
        t_blk=t_blk,
        n_b=bp // b_blk,
        n_t=tp // t_blk,
        bp=bp,
        tp=tp,
    )


# ------------------------------------------------------------------- kernel


def _cell(pre, c, coef_row, hp: int, shared: bool, io_dtype):
    """One GSU cell update from the summed projection `pre` [R, G].

    coef_row: [4, hp] = (b_f, b_c, bn_scale, bn_shift), f32/f64.
    Returns (spike [R, hp] io_dtype, membrane [R, hp] acc dtype).
    Math: efficient_spiking_neuron.py:132-153 with eval-BN folded affine.
    """
    b_f = coef_row[0:1, :]
    b_c = coef_row[1:2, :]
    scale = coef_row[2:3, :]
    shift = coef_row[3:4, :]
    if shared:
        f = jax.nn.sigmoid(pre + b_f)
        gcell = pre + b_c
    else:
        f = jax.nn.sigmoid(pre[:, :hp] + b_f)
        gcell = pre[:, hp:] + b_c
    cy = (f * c + (1.0 - f) * gcell) * scale + shift
    hy = (cy >= 0.0).astype(io_dtype)
    return hy, cy


def _mega_kernel(*refs, mp: _MegaPlan, io_dtype, acc_dtype):
    S = len(mp.sections)
    # ---- unpack refs (order mirrors the pallas_call argument lists) ----
    it = iter(refs)
    xg0_ref = next(it)
    noisy_refs = [next(it) for _ in range(S)]
    fb_wihr_ref = next(it)
    fb_whh_ref = next(it)
    fb_projw_ref = next(it)
    fb_coef_ref = next(it)
    fb_projb_ref = next(it)
    sb_wih0 = [next(it) for _ in range(S)]
    sb_wihr = [next(it) for _ in range(S)]
    sb_whh = [next(it) for _ in range(S)]
    sb_projw = [next(it) for _ in range(S)]
    sb_coef = [next(it) for _ in range(S)]
    sb_ln = [next(it) for _ in range(S)]
    sb_projb = [next(it) for _ in range(S)]
    out_refs = [next(it) for _ in range(S)]
    fb_h_scr = next(it)
    fb_c_scr = next(it)
    sb_h_scr = [next(it) for _ in range(S)]
    sb_c_scr = [next(it) for _ in range(S)]

    ti = pl.program_id(1)
    hp_fb = fb_h_scr.shape[-1]

    @pl.when(ti == 0)
    def _init():
        fb_h_scr[:] = jnp.zeros_like(fb_h_scr)
        fb_c_scr[:] = jnp.zeros_like(fb_c_scr)
        for i in range(S):
            sb_h_scr[i][:] = jnp.zeros_like(sb_h_scr[i])
            sb_c_scr[i][:] = jnp.zeros_like(sb_c_scr[i])

    fb_act_fn = _act(mp.fb_out_act)

    def body(t, _):
        # ---------------- fullband stack (hoisted xg0 for layer 0) --------
        h_in = None
        for k in range(mp.fb_layers):
            if k == 0:
                pre = xg0_ref[t].astype(acc_dtype)
            else:
                pre = jnp.dot(h_in, fb_wihr_ref[k - 1],
                              preferred_element_type=acc_dtype)
            pre = pre + jnp.dot(fb_h_scr[k], fb_whh_ref[k],
                                preferred_element_type=acc_dtype)
            hy, cy = _cell(pre, fb_c_scr[k], fb_coef_ref[k], hp_fb,
                           mp.shared, io_dtype)
            fb_h_scr[k] = hy
            fb_c_scr[k] = cy
            h_in = hy
        fbp = jnp.dot(h_in, fb_projw_ref[:, :],
                      preferred_element_type=acc_dtype) + fb_projb_ref[0:1, :]
        fb_act = fb_act_fn(fbp).astype(io_dtype)  # [b_blk, pp_fb]

        # ---------------- sub-band sections -------------------------------
        for i, s in enumerate(mp.sections):
            hp = sb_h_scr[i].shape[-1]
            rows = s.n * mp.b_blk
            x = noisy_refs[i][t]  # [N, b_blk, w_noisy] io
            if s.wf > 0:
                # fullband hand-off: per-unit contiguous lane slices of the
                # projection (tile-by-4 broadcast == mod-proj_size indexing)
                fbs = jnp.stack(
                    [fb_act[:, c0:c0 + s.wf] for c0 in s.fb_cols], axis=0)
                x = jnp.concatenate([x, fbs], axis=-1)  # [N, b_blk, w_tot]
            x = x.reshape(rows, s.w_tot)
            if s.pre_ln:
                xf = x.astype(acc_dtype)
                inv_w = 1.0 / s.w_tot
                mu = jnp.sum(xf, axis=-1, keepdims=True) * inv_w
                var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv_w - mu * mu
                xln = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
                xln = xln * sb_ln[i][0:1, :] + sb_ln[i][1:2, :]
                x = xln.astype(io_dtype)
            o = x
            for k in range(s.num_layers):
                w_in = sb_wih0[i] if k == 0 else sb_wihr[i][k - 1]
                pre = jnp.dot(o, w_in[:, :] if k == 0 else w_in,
                              preferred_element_type=acc_dtype)
                pre = pre + jnp.dot(sb_h_scr[i][k], sb_whh[i][k],
                                    preferred_element_type=acc_dtype)
                hy, cy = _cell(pre, sb_c_scr[i][k], sb_coef[i][k], hp,
                               mp.shared, io_dtype)
                sb_h_scr[i][k] = hy
                sb_c_scr[i][k] = cy
                o = hy
            dfp = jnp.dot(o, sb_projw[i][:, :],
                          preferred_element_type=acc_dtype) + sb_projb[i][0:1, :]
            dfp = _act(s.out_act)(dfp)
            pp = dfp.shape[-1]
            out_refs[i][t] = dfp.reshape(
                s.n, mp.b_blk, pp).astype(out_refs[i].dtype)
        return 0

    jax.lax.fori_loop(0, mp.t_blk, body, 0)


# ------------------------------------------------------------------ packing


def _pack_gate_w(w, rows_in: int, H: int, hp: int, g: int, in_p: int,
                 shared: bool, dtype):
    """torch layout [{H|2H}, rows_in] -> kernel layout [in_p, G]."""
    w = w.astype(jnp.float32)
    out = jnp.zeros((in_p, g), jnp.float32)
    if shared:
        out = out.at[:rows_in, :H].set(w.T)
    else:
        out = out.at[:rows_in, :H].set(w[:H].T).at[:rows_in, hp:hp + H].set(w[H:].T)
    return out.astype(dtype)


def _stack_tables(layers_params, layers_state, H: int, hp: int, g: int,
                  in0: int, in0_p: int, shared: bool, io_dtype, acc_dtype):
    """Pack one GSU stack: (wih0, wihr, whh, coef). coef[k] = [b_f; b_c;
    bn_scale; bn_shift] with eval-mode BN running stats folded to an affine
    (ops/gsu_pallas.gsu_stack_apply_pallas eval branch)."""
    L = len(layers_params)
    wih0 = None
    wihr = jnp.zeros((max(L - 1, 1), hp, g), io_dtype)
    whh = jnp.zeros((L, hp, g), io_dtype)
    coef = jnp.zeros((L, 4, hp), acc_dtype).at[:, 2, :].set(1.0)
    for k, (lp, ls) in enumerate(zip(layers_params, layers_state)):
        if k == 0:
            wih0 = _pack_gate_w(lp["weight_ih"], in0, H, hp, g, in0_p, shared, io_dtype)
        else:
            wihr = wihr.at[k - 1].set(
                _pack_gate_w(lp["weight_ih"], H, H, hp, g, hp, shared, io_dtype))
        whh = whh.at[k].set(
            _pack_gate_w(lp["weight_hh"], H, H, hp, g, hp, shared, io_dtype))
        bias = lp["bias_ih"].astype(acc_dtype)
        coef = coef.at[k, 0, :H].set(bias[:H]).at[k, 1, :H].set(bias[H:])
        if "bn" in lp:
            rv = ls["bn"]["running_var"].astype(acc_dtype)
            rm = ls["bn"]["running_mean"].astype(acc_dtype)
            w32 = lp["bn"]["weight"].astype(acc_dtype)
            b32 = lp["bn"]["bias"].astype(acc_dtype)
            scale = w32 * jax.lax.rsqrt(rv + BN_EPS)
            coef = coef.at[k, 2, :H].set(scale).at[k, 3, :H].set(b32 - rm * scale)
    return wih0, wihr, whh, coef


def _pad_to(x: jax.Array, shape: Tuple[int, ...], dtype) -> jax.Array:
    """Zero-pad x up to `shape` (per-axis), casting to dtype; no-op when
    already that shape and dtype (avoids whole-array packing copies)."""
    x = x.astype(dtype)
    if tuple(x.shape) == tuple(shape):
        return x
    pads = [(0, t - c) for c, t in zip(x.shape, shape)]
    return jnp.pad(x, pads)


# ------------------------------------------------------------------ wrapper


def mega_eval(
    cfg,
    params,
    state,
    xg0: jax.Array,          # [T, B, {H|2H}] hoisted fullband L0 projections
    noisy_secs: Sequence[jax.Array],  # per section [T, N_i, B, w_noisy_i]
) -> List[jax.Array]:
    """Run the whole recurrent pipeline; returns per-section deep-filter
    coefficient tensors [T, N_i, B, proj_i] (activation applied, io dtype).

    xg0 must be the PRE-LayerNormed, bias-free first-layer projection of the
    fullband input (fused_forward.py:149-156), at real width (H or 2H).
    noisy_secs are the n-major per-section noisy-magnitude unfolds in io
    dtype.
    """
    T, B, _ = xg0.shape
    io_dtype = noisy_secs[0].dtype
    # f64 rides through for interpret-mode exactness tests
    acc_dtype = jnp.float64 if io_dtype == jnp.float64 else jnp.float32
    io_bytes = 2 if io_dtype == jnp.bfloat16 else 4
    mp = plan(cfg, T, B, io_bytes)
    S = len(mp.sections)
    shared = mp.shared

    hp_fb = _round_up(mp.fb_hidden, 128)
    g_fb = hp_fb if shared else 2 * hp_fb
    pp_fb = _round_up(mp.fb_proj, 128)

    # ---- pack fullband tables ----
    fbp = params["fb"]
    _, fb_wihr, fb_whh, fb_coef = _stack_tables(
        fbp["stack"]["layers"], state["fb"]["stack"]["layers"],
        mp.fb_hidden, hp_fb, g_fb, cfg.fb_input_size,
        _round_up(cfg.fb_input_size, 128), shared, io_dtype, acc_dtype)
    fb_projw = jnp.zeros((hp_fb, pp_fb), jnp.float32).at[:mp.fb_hidden, :mp.fb_proj].set(
        fbp["proj"]["weight"].astype(jnp.float32).T).astype(io_dtype)
    fb_projb = jnp.zeros((1, pp_fb), acc_dtype).at[0, :mp.fb_proj].set(
        fbp["proj"]["bias"].astype(acc_dtype))

    # xg0 streams f32 at the padded gate width (halves at lanes 0 / hp for
    # non-shared weights) — unaligned in-kernel padding measured 100x slower
    if shared:
        xg0_p = _pad_to(xg0, (mp.tp, mp.bp, g_fb), acc_dtype)
    else:
        xg0_p = jnp.zeros((mp.tp, mp.bp, g_fb), acc_dtype)
        xg0_p = (xg0_p.at[:T, :B, :mp.fb_hidden].set(xg0[..., :mp.fb_hidden].astype(acc_dtype))
                 .at[:T, :B, hp_fb:hp_fb + mp.fb_hidden].set(xg0[..., mp.fb_hidden:].astype(acc_dtype)))

    # ---- pack per-section tables + pad streamed arrays ----
    noisy_p, tabs = [], []
    for i, s in enumerate(mp.sections):
        sp = params["sb"][i]
        hp = _round_up(s.hidden, 128)
        g = hp if shared else 2 * hp
        wih0, wihr, whh, coef = _stack_tables(
            sp["stack"]["layers"], state["sb"][i]["stack"]["layers"],
            s.hidden, hp, g, s.w_tot, s.w_tot, shared, io_dtype, acc_dtype)
        pp = _round_up(s.proj, 128)
        projw = jnp.zeros((hp, pp), jnp.float32).at[:s.hidden, :s.proj].set(
            sp["proj"]["weight"].astype(jnp.float32).T).astype(io_dtype)
        projb = jnp.zeros((1, pp), acc_dtype).at[0, :s.proj].set(
            sp["proj"]["bias"].astype(acc_dtype))
        ln = jnp.zeros((2, s.w_tot), acc_dtype)
        if s.pre_ln:
            ln = (ln.at[0].set(sp["pre_ln"]["weight"].astype(acc_dtype))
                    .at[1].set(sp["pre_ln"]["bias"].astype(acc_dtype)))
        tabs.append((wih0, wihr, whh, projw, coef, ln, projb))
        noisy_p.append(_pad_to(noisy_secs[i], (mp.tp, s.n, mp.bp, s.w_noisy), io_dtype))

    # ---- specs ----
    const2 = lambda bi, ti: (0, 0)
    const3 = lambda bi, ti: (0, 0, 0)
    tb3 = lambda bi, ti: (ti, bi, 0)
    tb4 = lambda bi, ti: (ti, 0, bi, 0)

    in_specs = [pl.BlockSpec((mp.t_blk, mp.b_blk, g_fb), tb3, memory_space=pltpu.VMEM)]
    in_specs += [
        pl.BlockSpec((mp.t_blk, s.n, mp.b_blk, s.w_noisy), tb4, memory_space=pltpu.VMEM)
        for s in mp.sections
    ]
    in_specs += [
        pl.BlockSpec(fb_wihr.shape, const3, memory_space=pltpu.VMEM),
        pl.BlockSpec(fb_whh.shape, const3, memory_space=pltpu.VMEM),
        pl.BlockSpec(fb_projw.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(fb_coef.shape, const3, memory_space=pltpu.VMEM),
        pl.BlockSpec(fb_projb.shape, const2, memory_space=pltpu.VMEM),
    ]
    inputs = [xg0_p, *noisy_p, fb_wihr, fb_whh, fb_projw, fb_coef, fb_projb]
    for j in range(7):  # wih0, wihr, whh, projw, coef, ln, projb per section
        for i in range(S):
            arr = tabs[i][j]
            idx = const2 if arr.ndim == 2 else const3
            in_specs.append(pl.BlockSpec(arr.shape, idx, memory_space=pltpu.VMEM))
            inputs.append(arr)

    # outputs at lane-padded proj widths: unaligned stores/reshapes in the
    # kernel measured ~100x slower than padded ones; the wrapper slices the
    # real proj columns back out
    out_shapes = [
        jax.ShapeDtypeStruct((mp.tp, s.n, mp.bp, _round_up(s.proj, 128)), io_dtype)
        for s in mp.sections
    ]
    out_specs = [
        pl.BlockSpec((mp.t_blk, s.n, mp.b_blk, _round_up(s.proj, 128)), tb4,
                     memory_space=pltpu.VMEM)
        for s in mp.sections
    ]

    scratch = [
        pltpu.VMEM((mp.fb_layers, mp.b_blk, hp_fb), io_dtype),
        pltpu.VMEM((mp.fb_layers, mp.b_blk, hp_fb), acc_dtype),
    ]
    for s in mp.sections:
        scratch.append(pltpu.VMEM(
            (s.num_layers, s.n * mp.b_blk, _round_up(s.hidden, 128)), io_dtype))
    for s in mp.sections:
        scratch.append(pltpu.VMEM(
            (s.num_layers, s.n * mp.b_blk, _round_up(s.hidden, 128)), acc_dtype))

    kernel = functools.partial(_mega_kernel, mp=mp, io_dtype=io_dtype,
                               acc_dtype=acc_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(mp.n_b, mp.n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else compiler_params(),
    )(*inputs)

    return [outs[i][:T, :, :B, :mp.sections[i].proj] for i in range(S)]


def supported(cfg) -> bool:
    """Static config gate for the mega kernel (latest generation only)."""
    P = cfg.fb_proj_size
    cols_ok = all(
        (cfg.freq_cutoffs[i] + k * cfg.fb_ctrs[i]) % P + cfg.fb_ctrs[i] <= P
        for i in range(cfg.num_sections)
        for k in range((cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i])
                       // cfg.center_freq_sizes[i])
    )
    return (
        cfg.norm_type is None
        and cfg.sequence_model == "GSN"
        and not cfg.sb_shared_bottleneck
        and all(n == 0 for n in cfg.fb_nbrs)
        and cols_ok
    )
