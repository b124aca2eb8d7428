"""Pallas TPU kernel for the GSU spiking recurrence (inference path).

The lax.scan implementation (ops/gsu.py) is the numerics reference and the
training path. This kernel accelerates the sequential recurrence by:

- keeping W_hh weight-stationary in VMEM for the whole sequence,
- carrying (h, c) in VMEM scratch that persists across grid steps,
- streaming the precomputed input projections xg[T, B, G] block-by-block
  through the Pallas grid pipeline (automatic HBM->VMEM double buffering),
- fusing gates + membrane update + (folded eval BatchNorm) + Heaviside spike
  into the same loop body as the recurrent matmul.

Layout: B is padded to the f32 sublane tile (8), H to the lane tile (128)
by the caller wrapper. The grid runs sequentially on TPU, which is exactly
what a time recurrence needs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gsu_layer_kernel(
    xg_ref,  # [T_BLK, B, G] VMEM (input projections block)
    whh_ref,  # [G, H] VMEM (transposed recurrent weights)
    bias_ref,  # [2, H] VMEM (b_f, b_c)
    bn_ref,  # [2, H] VMEM (scale, shift) — identity when BN disabled
    out_ref,  # [T_BLK, B, H] VMEM (spike outputs)
    h_scr,  # [B, H] VMEM scratch (persists across grid steps)
    c_scr,  # [B, H] VMEM scratch
    *,
    t_blk: int,
    hidden: int,
    shared: bool,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    b_f = bias_ref[0, :]
    b_c = bias_ref[1, :]
    bn_scale = bn_ref[0, :]
    bn_shift = bn_ref[1, :]

    def body(i, _):
        h = h_scr[:]
        c = c_scr[:]
        rg = jnp.dot(h, whh_ref[:, :], preferred_element_type=jnp.float32)
        xg_t = xg_ref[i]
        if shared:
            pre = xg_t + rg  # [B, H]
            f = jax.nn.sigmoid(pre + b_f)
            g = pre + b_c
        else:
            pre = xg_t + rg  # [B, 2H]
            f = jax.nn.sigmoid(pre[:, :hidden] + b_f)
            g = pre[:, hidden:] + b_c
        cy = f * c + (1.0 - f) * g
        cy = cy * bn_scale + bn_shift
        hy = (cy >= 0.0).astype(jnp.float32)
        h_scr[:] = hy
        c_scr[:] = cy
        out_ref[i] = hy
        return 0

    jax.lax.fori_loop(0, t_blk, body, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def gsu_layer_pallas_eval(
    xg: jax.Array,  # [T, B, G] precomputed input projections (+0 bias)
    w_hh: jax.Array,  # [G_rows, H] torch layout (rows = H if shared else 2H)
    bias: jax.Array,  # [2H]
    hidden: int,
    shared: bool,
    bn_scale: Optional[jax.Array] = None,
    bn_shift: Optional[jax.Array] = None,
    t_blk: int = 64,
) -> jax.Array:
    """Run one GSU layer (eval semantics) with the Pallas kernel.

    Returns spikes [T, B, H]. Handles padding of B to 8 and H to 128; the
    hidden padding is safe because padded W_hh columns/rows are zero, padded
    bias is -inf-free (zero), and padded spike outputs are discarded.
    """
    T, B, G = xg.shape
    H = hidden
    Bp = _round_up(max(B, 8), 8)
    Hp = _round_up(H, 128)
    Gp = Hp if shared else 2 * Hp

    # pad xg: [T, Bp, Gp] — layout for non-shared keeps (f, c) halves separate
    if shared:
        xg_p = jnp.zeros((T, Bp, Gp), xg.dtype).at[:, :B, :H].set(xg)
    else:
        xg_p = (
            jnp.zeros((T, Bp, Gp), xg.dtype)
            .at[:, :B, :H]
            .set(xg[..., :H])
            .at[:, :B, Hp : Hp + H]
            .set(xg[..., H:])
        )

    # w_hh torch layout [rows, H]; kernel needs [Hp, Gp] as h @ W -> gates
    if shared:
        w = jnp.zeros((Hp, Gp), w_hh.dtype).at[:H, :H].set(w_hh.T)
    else:
        w = (
            jnp.zeros((Hp, Gp), w_hh.dtype)
            .at[:H, :H]
            .set(w_hh[:H].T)
            .at[:H, Hp : Hp + H]
            .set(w_hh[H:].T)
        )

    b2 = jnp.zeros((2, Hp), bias.dtype).at[0, :H].set(bias[:H]).at[1, :H].set(bias[H:])
    if bn_scale is None:
        bn = jnp.zeros((2, Hp), xg.dtype).at[0].set(1.0)
        # keep padded lanes' membrane at 0 -> spike(0) = 1... mask instead:
        # set padded scale to 1, shift to -1 so cy_pad = -1 -> spike 0.
        bn = bn.at[1, H:].set(-1.0)
    else:
        bn = (
            jnp.zeros((2, Hp), xg.dtype)
            .at[0, :H]
            .set(bn_scale)
            .at[1, :H]
            .set(bn_shift)
            .at[1, H:]
            .set(-1.0)
        )

    Tp = _round_up(T, t_blk)
    if Tp != T:
        xg_p = jnp.pad(xg_p, ((0, Tp - T), (0, 0), (0, 0)))

    grid = (Tp // t_blk,)
    kernel = functools.partial(
        _gsu_layer_kernel, t_blk=t_blk, hidden=Hp, shared=shared
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_blk, Bp, Gp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_blk, Bp, Hp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, Hp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
        ],
    )(xg_p, w, b2, bn)
    return out[:T, :B, :H]


def gsu_stack_apply_pallas_eval(params, state, x, hidden_size: int, shared_weights: bool):
    """Eval-mode stacked GSU using the Pallas layer kernel.

    Mirrors ops/gsu.gsu_stack_apply(train=False); BN running stats fold into
    a per-layer affine. Returns (out, all_layer_outputs, state).
    """
    out = x
    all_layer_outputs = [x]
    for layer_params, layer_state in zip(params["layers"], state["layers"]):
        T, B, F = out.shape
        w_ih = layer_params["weight_ih"]
        xg = (out.reshape(T * B, F) @ w_ih.T).reshape(T, B, -1)
        bn_scale = bn_shift = None
        if "bn" in layer_params:
            rv = layer_state["bn"]["running_var"]
            rm = layer_state["bn"]["running_mean"]
            bn_scale = layer_params["bn"]["weight"] * jax.lax.rsqrt(rv + 1e-5)
            bn_shift = layer_params["bn"]["bias"] - rm * bn_scale
        out = gsu_layer_pallas_eval(
            xg,
            layer_params["weight_hh"],
            layer_params["bias_ih"],
            hidden_size,
            shared_weights,
            bn_scale,
            bn_shift,
        )
        all_layer_outputs.append(out)
    return out, all_layer_outputs, state
