"""Streaming (frame-by-frame) enhancement for Spiking-FullSubNet.

The challenge's latency accounting (8.036 ms = one 128-sample hop at 16 kHz
+ enc/dec, BASELINE.md) presumes hop-synchronous streaming. The offline
forward is a single jitted graph over whole utterances; this module provides
the stateful equivalent: a jitted per-chunk step that consumes `hop` new
samples per frame and emits `hop` enhanced samples, carrying

- the STFT analysis buffer (last n_fft - hop input samples),
- every GSU layer's (h, c) for full-band and all sub-band stacks,
- the deep-filter tap history (df_order - 1 past complex frames / section),
- the iSTFT overlap-add tail (n_fft - hop samples) and the steady-state
  window-square normalizer,
- the cumulative-norm running sums when the config uses a causal norm.

Streaming output matches the offline forward exactly in the interior (the
offline graph uses center padding, so the first/last n_fft//2 samples
differ by construction); see tests/test_streaming.py.

TPU notes: one step processes `chunk_frames` frames per dispatch (scan over
frames inside the jit), so dispatch overhead amortizes while latency stays
chunk_frames * hop. All state lives on device between steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from .dsp.spectral import hann_window
from .models.sequence_model import SequenceModelConfig
from .models.spiking_fullsubnet import SpikingFullSubNetConfig
from .nn.core import layer_norm_apply, linear_apply, output_activation


@partial(jax.jit, static_argnums=0)
def _zeros_complex(shape: Tuple[int, ...]) -> jax.Array:
    return jnp.zeros(shape, jnp.complex64)
from .ops.freq_unfold import freq_unfold
from .ops.gsu import spike

Array = jax.Array


def _gsu_cell_step(layer_params, bn_affine, x_t, h, c, hidden, shared):
    """One GSU cell timestep in eval mode (BN folded to affine)."""
    w_ih, w_hh, b = layer_params["weight_ih"], layer_params["weight_hh"], layer_params["bias_ih"]
    b_f, b_c = b[:hidden], b[hidden:]
    xg = x_t @ w_ih.T
    rg = h @ w_hh.T
    if shared:
        f_in = xg + rg + b_f
        c_in = xg + rg + b_c
    else:
        f_in = xg[:, :hidden] + rg[:, :hidden] + b_f
        c_in = xg[:, hidden:] + rg[:, hidden:] + b_c
    f = jax.nn.sigmoid(f_in)
    cy = f * c + (1.0 - f) * c_in
    if bn_affine is not None:
        scale, shift = bn_affine
        cy = cy * scale + shift
    hy = spike(cy)
    return hy, cy


def _seq_model_step(cfg: SequenceModelConfig, params, bn_affines, x_t, states):
    """One timestep of SequenceModel (pre-LN + GSU stack + proj + act).

    x_t: [B, F]; states: list of (h, c). Returns (out [B, P], new_states).
    """
    if cfg.use_pre_layer_norm:
        x_t = layer_norm_apply(params["pre_ln"], x_t)
    out = x_t
    new_states = []
    for layer_params, bn_affine, (h, c) in zip(params["stack"]["layers"], bn_affines, states):
        out, cy = _gsu_cell_step(layer_params, bn_affine, out, h, c, cfg.hidden_size, cfg.shared_weights)
        new_states.append((out, cy))
    if cfg.proj_size > 0:
        out = linear_apply(params["proj"], out)
    out = output_activation(cfg.output_activate_function)(out)
    return out, new_states


def _bn_affines(cfg: SequenceModelConfig, params, state):
    out = []
    for lp, ls in zip(params["stack"]["layers"], state["stack"]["layers"]):
        if "bn" in lp:
            rv, rm = ls["bn"]["running_var"], ls["bn"]["running_mean"]
            scale = lp["bn"]["weight"] * jax.lax.rsqrt(rv + 1e-5)
            out.append((scale, lp["bn"]["bias"] - rm * scale))
        else:
            out.append(None)
    return out


class StreamingEnhancer:
    """Hop-synchronous streaming wrapper around SpikingFullSubNet weights.

    Limitations: num_spks == 1; norm_type None or cumulative_laplace_norm
    (causal); the frozen offline norms (offline_laplace) are by definition
    non-streaming.
    """

    def __init__(self, cfg: SpikingFullSubNetConfig, params, model_state, batch_size: int = 1, chunk_frames: int = 1):
        if cfg.num_spks != 1:
            raise NotImplementedError("Streaming supports single-speaker enhancement.")
        if cfg.norm_type not in (None, "cumulative_laplace_norm"):
            raise NotImplementedError(f"Non-causal norm {cfg.norm_type} cannot stream.")
        self.cfg = cfg
        self.params = params
        self.model_state = model_state
        self.batch_size = batch_size
        self.chunk_frames = chunk_frames
        self.window = hann_window(cfg.win_length)
        # steady-state OLA normalizer for one hop (COLA sum of squared windows)
        r = cfg.n_fft // cfg.hop_length
        wsq = np.asarray(self.window) ** 2
        env = np.zeros(cfg.hop_length)
        for k in range(r):
            env += wsq[k * cfg.hop_length : (k + 1) * cfg.hop_length]
        self._ola_env = jnp.asarray(env, jnp.float32)

        self._fb_affines = _bn_affines(cfg.fb_config(), params["fb"], model_state["fb"])
        self._sb_affines = [
            _bn_affines(cfg.sb_config(i), params["sb"][i], model_state["sb"][i])
            for i in range(cfg.num_sections)
        ]
        self._step = jax.jit(self._chunk_step)

    # ------------------------------------------------------------- state

    @property
    def prime_len(self) -> int:
        """Number of leading input samples init_state(prime_samples=...) takes
        to make the streamed frame sequence coincide exactly with the offline
        centered STFT: buf_len - n_fft//2 = n_fft//2 - hop."""
        return (self.cfg.n_fft - self.cfg.hop_length) - self.cfg.n_fft // 2

    def init_state(self, prime_samples=None) -> Dict[str, Any]:
        """Fresh stream state.

        prime_samples: optional [B, prime_len] leading input samples. The
            offline graph center-pads n_fft//2 zeros, so its frame 0 covers
            [zeros(n_fft//2), x[:n_fft//2]]. Pre-loading the analysis buffer
            with [zeros(n_fft//2), x[:prime_len]] and then streaming from
            x[prime_len:] reproduces the offline frame sequence exactly.
            Without priming the stream is still causal/correct, just offset
            from the offline framing in the first frames.
        """
        cfg, b = self.cfg, self.batch_size

        def zeros_states(seq_cfg: SequenceModelConfig, fold: int):
            return [
                (jnp.zeros((b * fold, seq_cfg.hidden_size), jnp.float32), jnp.zeros((b * fold, seq_cfg.hidden_size), jnp.float32))
                for _ in range(seq_cfg.num_layers)
            ]

        sb_states = []
        for i in range(cfg.num_sections):
            n = (cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i]) // cfg.center_freq_sizes[i]
            sb_states.append(zeros_states(cfg.sb_config(i), n))
        buf_len = cfg.n_fft - cfg.hop_length
        if prime_samples is not None:
            pad = cfg.n_fft // 2
            prime = jnp.asarray(prime_samples, jnp.float32)
            if prime.shape[-1] != self.prime_len:
                raise ValueError(f"prime_samples must be [B, {self.prime_len}]")
            in_buffer = jnp.concatenate([jnp.zeros((b, pad), jnp.float32), prime], axis=-1)
        else:
            in_buffer = jnp.zeros((b, buf_len), jnp.float32)
        return {
            "in_buffer": in_buffer,
            "ola_tail": jnp.zeros((b, cfg.n_fft - cfg.hop_length), jnp.float32),
            "fb": zeros_states(cfg.fb_config(), 1),
            "sb": sb_states,
            # complex zeros built under jit: some backends (remote-attached
            # dev tunnels) cannot materialize complex constants eagerly
            "df_taps": [
                _zeros_complex(
                    (b, 1, cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i], cfg.df_orders[i] - 1)
                )
                for i in range(cfg.num_sections)
            ],
            "norm_sum": jnp.zeros((b,), jnp.float32),
            "sb_norm_sums": [
                jnp.zeros(
                    (b * (cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i]) // cfg.center_freq_sizes[i],),
                    jnp.float32,
                )
                for i in range(cfg.num_sections)
            ],
            "norm_count": jnp.zeros((), jnp.float32),
        }

    # ------------------------------------------------------------- core

    def _frame_step(self, carry, new_samples):
        """Process ONE hop of samples -> one enhanced hop."""
        cfg = self.cfg
        state = carry
        buf = jnp.concatenate([state["in_buffer"], new_samples], axis=-1)  # [B, n_fft]
        spec = jnp.fft.rfft(buf * self.window, n=cfg.n_fft, axis=-1)  # [B, F]
        mag = jnp.abs(spec)[:, None, :] ** cfg.fdrc  # [B, 1, F+1]
        mag = mag[..., :-1]  # drop Nyquist -> [B, 1, F]

        use_cln = cfg.norm_type == "cumulative_laplace_norm"
        eps = 2.220446049250313e-16
        new_frames = state["norm_count"] + 1.0

        # ---- fullband (one timestep) ----
        # Offline applies the causal norm separately to the fb input slice
        # (model_low_freq.py:578) and to each sub-band section's concatenated
        # features (ibid.:475); the running sums stream per consumer.
        fb_in = mag[:, 0, : cfg.fb_input_size]
        if use_cln:
            new_fb_sum = state["norm_sum"] + jnp.sum(fb_in, axis=-1)
            mu = new_fb_sum / (cfg.fb_input_size * new_frames)
            fb_in = fb_in / (mu[:, None] + eps)
        else:
            new_fb_sum = state["norm_sum"]
        fb_out, new_fb = _seq_model_step(cfg.fb_config(), self.params["fb"], self._fb_affines, fb_in, state["fb"])
        num_repeats = (cfg.n_fft // 2 + 1) // cfg.fb_input_size
        fb_full = jnp.tile(fb_out, (1, num_repeats))[:, None, :, None]  # [B, 1, F, 1]

        mag_4d = mag[..., None]  # [B, 1, F, 1] (T=1)

        new_sb_states = []
        new_sb_sums = []
        new_taps = []
        enh_sections = []
        for i in range(cfg.num_sections):
            lo, hi = cfg.freq_cutoffs[i], cfg.freq_cutoffs[i + 1]
            ctr, nbr = cfg.center_freq_sizes[i], cfg.neighbor_freq_sizes[i]
            noisy_sub = freq_unfold(mag_4d, lo, hi, ctr, nbr)  # [B, N, 1, w, 1]
            fb_sub = freq_unfold(fb_full, lo, hi, cfg.fb_ctrs[i], cfg.fb_nbrs[i])
            sb_in = jnp.concatenate([noisy_sub, fb_sub], axis=-2)[..., 0]  # [B, N, 1, w']
            b, n = sb_in.shape[0], sb_in.shape[1]
            flat = sb_in.reshape(b * n, -1)
            if use_cln:
                w = flat.shape[-1]
                new_sum_i = state["sb_norm_sums"][i] + jnp.sum(flat, axis=-1)
                mu = new_sum_i / (w * new_frames)
                flat = flat / (mu[:, None] + eps)
                new_sb_sums.append(new_sum_i)
            else:
                new_sb_sums.append(state["sb_norm_sums"][i])
            scfg = cfg.sb_config(i)
            out, new_s = _seq_model_step(scfg, self.params["sb"][i], self._sb_affines[i], flat, state["sb"][i])
            new_sb_states.append(new_s)
            df = cfg.df_orders[i]
            coef = rearrange(out, "(b n) (c fc df s) -> b df s (n fc) c", b=b, s=1, c=2, df=df)
            coef_c = jax.lax.complex(coef[..., 0], coef[..., 1])  # [B, df, 1, F_i]

            sec_spec = spec[:, None, lo:hi]  # [B, 1, F_i]
            taps = jnp.concatenate([state["df_taps"][i], sec_spec[..., None]], axis=-1)  # [.., df]
            # enh[b, f] = sum_d taps[b, 1, f, d] * coef[b, d, 1, f]
            enh = jnp.einsum("bcfd,bdcf->bcf", taps, coef_c)
            enh_sections.append(enh[:, 0])  # [B, F_i]
            new_taps.append(taps[..., 1:] if df > 1 else taps[..., :0])

        enh_spec = jnp.concatenate(enh_sections, axis=-1)  # [B, F-1]
        enh_full = jnp.concatenate([enh_spec, spec[:, -1:]], axis=-1)  # Nyquist passthrough

        # ---- iSTFT one frame + OLA ----
        frame = jnp.fft.irfft(enh_full, n=cfg.n_fft, axis=-1) * self.window  # [B, n_fft]
        hop = cfg.hop_length
        out_samples = (state["ola_tail"][:, :hop] + frame[:, :hop]) / self._ola_env
        new_tail = jnp.concatenate(
            [state["ola_tail"][:, hop:], jnp.zeros((frame.shape[0], hop), frame.dtype)], axis=-1
        ) + frame[:, hop:]

        new_state = {
            "in_buffer": buf[:, hop:],
            "ola_tail": new_tail,
            "fb": new_fb,
            "sb": new_sb_states,
            "df_taps": new_taps,
            "norm_sum": new_fb_sum,
            "sb_norm_sums": new_sb_sums,
            "norm_count": new_frames,
        }
        return new_state, out_samples

    def _chunk_step(self, state, chunk):
        """chunk: [B, chunk_frames * hop] -> (new_state, enhanced [B, same])."""
        hop = self.cfg.hop_length
        frames = rearrange(chunk, "b (t h) -> t b h", h=hop)
        new_state, outs = jax.lax.scan(self._frame_step, state, frames)
        return new_state, rearrange(outs, "t b h -> b (t h)")

    # ------------------------------------------------------------- API

    def step(self, state, chunk):
        """Consume chunk_frames*hop new samples, return (state, enhanced hop samples)."""
        return self._step(state, chunk)

    def enhance_stream(self, audio: np.ndarray) -> np.ndarray:
        """Convenience: run a whole [B, T] signal through the streaming path."""
        hop = self.cfg.hop_length
        chunk = self.chunk_frames * hop
        b, t = audio.shape
        t_pad = -(-t // chunk) * chunk
        if t_pad != t:
            audio = np.pad(audio, ((0, 0), (0, t_pad - t)))
        state = self.init_state()
        outs = []
        for i in range(0, t_pad, chunk):
            state, y = self.step(state, jnp.asarray(audio[:, i : i + chunk]))
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)[:, :t]
