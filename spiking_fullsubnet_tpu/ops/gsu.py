"""Gated Spiking Unit (GSU) recurrence — the framework's core op.

Re-designs the reference GSU (audiozen/models/spiking_fullsubnet/
efficient_spiking_neuron.py:12-153) TPU-first:

- The reference runs a Python loop over timesteps with two small matmuls per
  step.  Here the *input* projection for all timesteps is hoisted out of the
  recurrence into one large MXU matmul ([T*B, F] @ [F, G]); only the
  recurrent projection ([B, H] @ [H, G]) stays inside a `lax.scan`.
- Spike firing is a Heaviside step with the reference's triangle surrogate
  gradient (Triangle, efficient_spiking_neuron.py:84-101), implemented as a
  `jax.custom_vjp` so it is correct under jit/scan/remat.
- Optional BatchNorm on the membrane potential replicates torch BatchNorm1d
  semantics exactly: training normalizes each timestep by that timestep's
  batch statistics (biased variance) and updates running stats sequentially
  (momentum 0.1, unbiased variance); eval uses the running stats, which
  reduces to a precomputed affine transform outside the scan math.

Cell math (efficient_spiking_neuron.py:132-153):
    gates = x @ W_ih^T + b_ih + h @ W_hh^T          # b_hh absent in reference
    f, g  = split(gates); f = sigmoid(f)
    c'    = f * c + (1 - f) * g
    c''   = BN(c')                                   (optional)
    h'    = spike(c'')                               (binary)
With shared_weights=True the gate and cell halves share W (torch `.repeat`),
so the matmuls shrink to H outputs and only the bias differs per half.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import uniform
from ..nn.module_tracer import tracing_active as _tracing

Array = jax.Array


# --------------------------------------------------------------- spike (surrogate)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def spike(x: Array, gamma: float = 1.0) -> Array:
    """Heaviside(x >= 0) with triangle surrogate gradient.

    Forward: 1.0 where x >= 0 else 0.0 (efficient_spiking_neuron.py:89).
    Backward: grad * (1/gamma^2) * max(gamma - |x|, 0) (ibid.:95-101).
    """
    return (x >= 0.0).astype(x.dtype)


def _spike_fwd(x, gamma):
    return (x >= 0.0).astype(x.dtype), x


def _spike_bwd(gamma, x, g):
    surr = (1.0 / (gamma * gamma)) * jnp.maximum(gamma - jnp.abs(x), 0.0)
    return (g * surr,)


spike.defvjp(_spike_fwd, _spike_bwd)


# --------------------------------------------------------------- params / state


def gsu_cell_init(
    rng,
    input_size: int,
    hidden_size: int,
    shared_weights: bool = False,
    bn: bool = False,
    dtype=jnp.float32,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Initialize one GSU cell; matches reference reset_parameters
    (uniform ±1/sqrt(H) on W_ih/W_hh/b_ih; BN affine at defaults)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    stdv = 1.0 / math.sqrt(hidden_size) if hidden_size > 0 else 0.0
    gate_rows = hidden_size if shared_weights else 2 * hidden_size
    params = {
        "weight_ih": uniform(k1, (gate_rows, input_size), stdv, dtype),
        "weight_hh": uniform(k2, (gate_rows, hidden_size), stdv, dtype),
        "bias_ih": uniform(k3, (2 * hidden_size,), stdv, dtype),
    }
    state: Dict[str, Any] = {}
    if bn:
        params["bn"] = {
            "weight": jnp.ones((hidden_size,), dtype),
            "bias": jnp.zeros((hidden_size,), dtype),
        }
        state["bn"] = {
            "running_mean": jnp.zeros((hidden_size,), dtype),
            "running_var": jnp.ones((hidden_size,), dtype),
        }
    return params, state


def gsu_stack_init(
    rng,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    shared_weights: bool = False,
    bn: bool = False,
    dtype=jnp.float32,
):
    """Stack of GSU layers (reference efficient_spiking_neuron():12-40)."""
    keys = jax.random.split(rng, num_layers)
    layers = []
    states = []
    for i, k in enumerate(keys):
        in_size = input_size if i == 0 else hidden_size
        p, s = gsu_cell_init(k, in_size, hidden_size, shared_weights, bn, dtype)
        layers.append(p)
        states.append(s)
    return {"layers": layers}, {"layers": states}


# --------------------------------------------------------------- forward


def _gsu_layer_apply(
    params: Dict[str, Any],
    bn_state: Dict[str, Any],
    x: Array,  # [T, B, F] time-major
    hidden_size: int,
    shared_weights: bool,
    train: bool,
    bn_momentum: float = 0.1,
    bn_eps: float = 1e-5,
    init_state: Optional[Tuple[Array, Array]] = None,
    precomputed_xg: Optional[Array] = None,
):
    """One GSU layer over a full sequence. Returns (spikes [T,B,H], new_bn_state).

    Mixed precision: when x/params arrive as bfloat16, the two matmuls run in
    bf16 with float32 accumulation (the MXU's native mode) and all gate/
    membrane/BN elementwise math stays float32 — spike thresholding on a bf16
    membrane flips near-threshold neurons and wrecks parity, so only the
    matmul *inputs* are low-precision. Spikes are exact in either dtype; the
    recurrent carry h is kept in x.dtype to feed the next matmul directly.
    """
    if x is None:  # serve path: only the precomputed gates exist
        T, B, _ = precomputed_xg.shape
        io_dtype = precomputed_xg.dtype
    else:
        T, B, F = x.shape
        io_dtype = x.dtype
    H = hidden_size
    # low-precision inputs (bf16/f16) accumulate in f32; f32/f64 stay as-is
    mixed = io_dtype in (jnp.bfloat16, jnp.float16)
    acc_dtype = jnp.float32 if mixed else io_dtype
    w_ih = params["weight_ih"]
    w_hh_t = params["weight_hh"].T
    b = params["bias_ih"].astype(acc_dtype)
    b_f, b_c = b[:H], b[H:]

    if precomputed_xg is not None:
        # serve path (stream_forward): layer-0 input gates were computed
        # outside (pre-LN folded into the weights) — skip the projection.
        xg = precomputed_xg.astype(acc_dtype)
    else:
        # Hoisted input projection: one [T*B, F] @ [F, rows] MXU matmul.
        xg = jnp.matmul(x.reshape(T * B, F), w_ih.T, preferred_element_type=acc_dtype)
        xg = xg.reshape(T, B, -1)

    use_bn = "bn" in params
    if use_bn and not train:
        # Eval BN is a constant affine: scale/shift folded outside the scan,
        # in float32 (running stats are always f32).
        rm = bn_state["bn"]["running_mean"]
        rv = bn_state["bn"]["running_var"]
        w32 = params["bn"]["weight"].astype(rv.dtype)
        b32 = params["bn"]["bias"].astype(rv.dtype)
        bn_scale = (w32 * jax.lax.rsqrt(rv + bn_eps)).astype(acc_dtype)
        bn_shift = (b32 - rm * (w32 * jax.lax.rsqrt(rv + bn_eps))).astype(acc_dtype)
    if use_bn and train:
        bn_w = params["bn"]["weight"].astype(acc_dtype)
        bn_b = params["bn"]["bias"].astype(acc_dtype)

    if init_state is None:
        h0 = jnp.zeros((B, H), io_dtype)
        c0 = jnp.zeros((B, H), acc_dtype)
    else:
        h0, c0 = init_state
        h0 = h0.astype(io_dtype)
        c0 = c0.astype(acc_dtype)

    def step(carry, xg_t):
        h, c = carry
        rg = jnp.matmul(h, w_hh_t, preferred_element_type=acc_dtype)  # [B, H|2H]
        if shared_weights:
            f_in = xg_t + rg + b_f
            c_in = xg_t + rg + b_c
        else:
            f_in = xg_t[:, :H] + rg[:, :H] + b_f
            c_in = xg_t[:, H:] + rg[:, H:] + b_c
        f = jax.nn.sigmoid(f_in)
        cy = f * c + (1.0 - f) * c_in
        if use_bn:
            if train:
                mean = jnp.mean(cy, axis=0)
                var = jnp.mean(jnp.square(cy - mean), axis=0)
                cy = (cy - mean) * jax.lax.rsqrt(var + bn_eps)
                cy = cy * bn_w + bn_b
                stats = (mean, var)
            else:
                cy = cy * bn_scale + bn_shift
                stats = ()
        else:
            stats = ()
        hy = spike(cy)
        ys = (hy.astype(io_dtype), stats)
        if _tracing():
            # debug mode: also emit the membrane — the Heaviside maps a NaN
            # membrane to spike 0, so output-only tracing would miss it
            ys = ys + (cy,)
        return (hy.astype(io_dtype), cy), ys

    (_, _), scanned = jax.lax.scan(step, (h0, c0), xg)
    spikes, stats = scanned[0], scanned[1]
    if _tracing():
        from ..nn.module_tracer import trace_activation

        trace_activation("membrane", scanned[2])

    new_state = bn_state
    if use_bn and train:
        means, vars_ = stats  # [T, H] each (biased var)
        new_state = {"bn": bn_running_update(bn_state["bn"], means, vars_, B, bn_momentum)}

    return spikes, new_state


def bn_running_update(running: Dict[str, Array], means: Array, vars_: Array,
                      batch_rows: int, momentum: float = 0.1) -> Dict[str, Array]:
    """Fold T per-timestep BatchNorm batch stats into the running stats.

    torch updates once per step: r <- (1-m) r + m * stat (var uses the
    unbiased estimator); the closed form over T steps keeps the update out of
    the scan carry. Stats always accumulate in their own (float32) dtype even
    when the scan runs in bfloat16.
    """
    T = means.shape[0]
    stat_dtype = running["running_mean"].dtype
    means = means.astype(stat_dtype)
    vars_ = vars_.astype(stat_dtype)
    m = momentum
    decay = (1.0 - m) ** jnp.arange(T - 1, -1, -1, dtype=stat_dtype)  # [(1-m)^(T-1-t)]
    unbiased = vars_ * (batch_rows / max(batch_rows - 1, 1))
    new_mean = (1.0 - m) ** T * running["running_mean"] + m * jnp.einsum("t,th->h", decay, means)
    new_var = (1.0 - m) ** T * running["running_var"] + m * jnp.einsum("t,th->h", decay, unbiased)
    return {"running_mean": new_mean, "running_var": new_var}


def gsu_stack_apply(
    params: Dict[str, Any],
    state: Dict[str, Any],
    x: Array,  # [T, B, F]
    hidden_size: int,
    shared_weights: bool = False,
    train: bool = False,
    bn_momentum: float = 0.1,
    backend: str = "scan",
) -> Tuple[Array, List[Array], Dict[str, Any]]:
    """Run the stacked GSU over a time-major sequence.

    Returns (output [T,B,H], all_layer_outputs [input, layer1, ...], new_state),
    matching StackedGSU.forward (efficient_spiking_neuron.py:50-62); the
    all_layer_outputs feed the synops/neuronops energy proxies.

    backend: "scan" (lax.scan — numerics reference, runs everywhere),
    "pallas" (TPU kernels, ops/gsu_pallas.py), or "auto" (pallas on TPU
    when the shape fits VMEM, scan otherwise).
    """
    if backend != "scan":
        from . import gsu_pallas

        want = backend == "pallas" or (backend == "auto" and gsu_pallas.available())
        if want and x.ndim == 3 and x.shape[0] >= 8:
            try:
                return gsu_pallas.gsu_stack_apply_pallas(
                    params, state, x, hidden_size, shared_weights, train,
                    bn_momentum)
            except ValueError:
                if backend == "pallas":
                    raise  # explicit request: surface the VMEM-planning error
        elif backend == "pallas":
            raise ValueError(
                "backend='pallas' requires a [T>=8, B, F] input on a TPU backend")

    from ..nn.module_tracer import module_scope, trace_activation

    out = x
    all_layer_outputs = [x]
    new_states = []
    for i, (layer_params, layer_state) in enumerate(zip(params["layers"], state["layers"])):
        with module_scope(f"gsu_layer{i}"):
            out, ns = _gsu_layer_apply(
                layer_params,
                layer_state,
                out,
                hidden_size,
                shared_weights,
                train,
                bn_momentum,
            )
            out = trace_activation("spikes", out)
        new_states.append(ns)
        all_layer_outputs.append(out)
    return out, all_layer_outputs, {"layers": new_states}
