"""Spectral transforms: STFT / iSTFT / mag-phase, framed for TPU.

TPU-first design notes
----------------------
- The STFT is expressed as (pad -> frame-gather -> window -> rfft).  XLA lowers
  the rfft of the framed [B*T_frames, n_fft] matrix onto the TPU efficiently and
  fuses the windowing multiply into it; no per-frame Python looping exists.
- The iSTFT overlap-add uses a scatter-add (`.at[].add`) over statically known
  frame offsets, which XLA compiles to a single fused scatter. The window-square
  normalization envelope is a compile-time constant for a given (T, n_fft, hop)
  and is folded by XLA.
- All shapes are static: the number of frames is a pure function of the input
  length, so everything jits cleanly.

Numerical conventions follow the reference implementation exactly (reference:
audiozen/acoustics/audio_feature.py:236-347 wrapping torch.stft/istft with
center=True, periodic hann window, pad_mode="constant", onesided) so that
reference checkpoints produce allclose waveforms.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Literal, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def hann_window(n: int, dtype=jnp.float32) -> Array:
    """Periodic Hann window, identical to ``torch.hann_window(n)``."""
    return (0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n))).astype(dtype)


def _pad_center(y: Array, n_fft: int, pad_mode: str) -> Array:
    pad = n_fft // 2
    cfg = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    if pad_mode == "constant":
        return jnp.pad(y, cfg)
    elif pad_mode == "reflect":
        return jnp.pad(y, cfg, mode="reflect")
    else:
        raise ValueError(f"Unsupported pad_mode: {pad_mode}")


def num_frames(num_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames for a given signal length (static)."""
    t = num_samples + 2 * (n_fft // 2) if center else num_samples
    return 1 + (t - n_fft) // hop_length


def frame_signal(y: Array, frame_length: int, hop_length: int) -> Array:
    """Extract overlapping frames: [..., T] -> [..., n_frames, frame_length].

    Fast path when hop divides the frame length (every recipe: 512/128): view
    the signal as hop-sized chunks and stack frame_length/hop shifted slices —
    pure reshapes/slices that XLA lowers to copies, instead of a row gather
    that materializes a random-access index map.
    """
    t = y.shape[-1]
    n = 1 + (t - frame_length) // hop_length
    if frame_length % hop_length == 0:
        r = frame_length // hop_length
        n_chunks = t // hop_length
        chunks = y[..., : n_chunks * hop_length].reshape(y.shape[:-1] + (n_chunks, hop_length))
        parts = [chunks[..., k : k + n, :] for k in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    return y[..., idx]


# DFT lowering strategy. On TPU the MXU is ~20x faster than XLA's generic
# FFT lowering for STFT-sized transforms, so the rDFT is expressed as two
# matmuls against constant cos/-sin matrices ("matmul"). CPU/GPU keep the
# native FFT ("fft"). "auto" picks per-backend at trace time.
DFT_MODE = "auto"

_TPU_PLATFORMS = ("tpu", "axon")


def _use_matmul_dft(n_fft: int) -> bool:
    if DFT_MODE == "matmul":
        return True
    if DFT_MODE == "fft":
        return False
    return jax.default_backend() in _TPU_PLATFORMS and n_fft <= 4096


def _rdft_matrices(n_fft: int, dtype) -> Tuple[Array, Array]:
    """Constant forward-rDFT matrices: cos[n,k], -sin[n,k] of shape
    [n_fft, n_fft//2+1] so that rfft(x) == x @ cos + 1j * (x @ msin)."""
    import numpy as np

    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    return jnp.asarray(np.cos(ang), dtype=dtype), jnp.asarray(-np.sin(ang), dtype=dtype)


def _irdft_matrices(n_fft: int, dtype) -> Tuple[Array, Array]:
    """Constant inverse-rDFT matrices A, B of shape [n_fft//2+1, n_fft] so
    that irfft(X) == X.real @ A + X.imag @ B (Hermitian weights folded in)."""
    import numpy as np

    f = n_fft // 2 + 1
    k = np.arange(f)[:, None]
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((f, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0  # Nyquist bin counted once
    a = w * np.cos(ang) / n_fft
    b = -w * np.sin(ang) / n_fft
    return jnp.asarray(a, dtype=dtype), jnp.asarray(b, dtype=dtype)


def stft_complex(
    y: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    window: Optional[Array] = None,
    center: bool = True,
    pad_mode: str = "constant",
    normalized: bool = False,
) -> Array:
    """Complex STFT matching ``torch.stft`` conventions. Returns [..., F, T]."""
    if window is None:
        window = hann_window(win_length, dtype=y.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        y = _pad_center(y, n_fft, pad_mode)
    if _use_matmul_dft(n_fft):
        real_dtype = jnp.finfo(y.dtype).dtype
        cos_m, msin_m = _rdft_matrices(n_fft, real_dtype)
        if n_fft % hop_length == 0:
            # Fused framing+window+rDFT: view the signal as hop-sized chunks
            # and accumulate r = n_fft/hop chunk-matmuls against hop-tall
            # slices of the windowed DFT matrix. The [.., n_frames, n_fft]
            # frame tensor is never materialized (it is ~4x the signal and
            # dominates STFT time on TPU otherwise).
            r = n_fft // hop_length
            t = y.shape[-1]
            n = 1 + (t - n_fft) // hop_length
            m = n + r - 1  # chunks overlapped by the n frames
            chunks = y[..., : m * hop_length].reshape(y.shape[:-1] + (m, hop_length))
            w_cos = (window[:, None] * cos_m).reshape(r, hop_length, -1)
            w_msin = (window[:, None] * msin_m).reshape(r, hop_length, -1)
            re = im = 0.0
            for k in range(r):
                ck = chunks[..., k : k + n, :]
                re = re + jnp.matmul(ck, w_cos[k], preferred_element_type=real_dtype)
                im = im + jnp.matmul(ck, w_msin[k], preferred_element_type=real_dtype)
        else:
            frames = frame_signal(y, n_fft, hop_length) * window
            re = jnp.matmul(frames, cos_m, preferred_element_type=real_dtype)
            im = jnp.matmul(frames, msin_m, preferred_element_type=real_dtype)
        spec = jax.lax.complex(re, im)
    else:
        frames = frame_signal(y, n_fft, hop_length) * window
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., T_frames, F]
    if normalized:
        spec = spec * (1.0 / jnp.sqrt(jnp.asarray(n_fft, dtype=spec.real.dtype)))
    return jnp.swapaxes(spec, -1, -2)  # [..., F, T_frames]


def stft_real_imag_tmajor(
    y: Array,  # [B, T_samples]
    n_fft: int,
    hop_length: int,
    win_length: int,
    *,
    window: Optional[Array] = None,
    center: bool = True,
    pad_mode: str = "constant",
    n_frames_out: Optional[int] = None,
    matmul_dtype: Optional[Any] = None,
) -> Tuple[Array, Array]:
    """STFT in TIME-MAJOR layout as a (real, imag) pair: each [T_frames, B, F].

    Same numerics as ``stft_complex`` (torch.stft conventions), but:
    - frames are the LEADING axis, so a time-major model pipeline
      ([T, B, ...] streams into scan/Pallas kernels) needs no [B, F, T]
      transpose of the full spectrogram — the only layout change is one
      cheap transpose of the hop-chunked AUDIO (4x smaller);
    - real/imag stay SEPARATE arrays (complex packing costs a relayout pass
      on TPU and every consumer — magnitude, deep filter, iSTFT — wants the
      parts anyway);
    - the framing is a lane-concatenation of r = n_fft/hop shifted views of
      the hop-chunked signal feeding ONE windowed-DFT matmul — no frame
      gather, no per-slice accumulation round-trips through HBM.

    n_frames_out: optionally compute MORE frames than the signal needs (the
    extra frames read zero-padding) so downstream kernels get a
    block-aligned T without any pad-copy of [T, B, ...] tensors.

    matmul_dtype: run the DFT matmuls with inputs cast to this dtype (f32
    accumulation) — "bfloat16" on the serving path trades ~1e-3 relative
    spectral error (quality-parity verified on the competition checkpoints,
    tests/test_stream_forward.py) for the MXU's full bf16 rate.
    """
    if y.ndim != 2:
        raise ValueError(f"tmajor STFT expects [B, T], got ndim={y.ndim}")
    if _use_matmul_dft(n_fft) and n_fft % hop_length == 0:
        real_dtype = jnp.finfo(y.dtype).dtype
        if window is None:
            window = hann_window(win_length, dtype=y.dtype)
        if win_length < n_fft:
            lpad = (n_fft - win_length) // 2
            window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
        if center:
            y = _pad_center(y, n_fft, pad_mode)
        t = y.shape[-1]
        n = 1 + (t - n_fft) // hop_length
        if n_frames_out is not None:
            if n_frames_out < n:
                raise ValueError(f"n_frames_out={n_frames_out} < natural frames {n}")
            n = n_frames_out
        cos_m, msin_m = _rdft_matrices(n_fft, real_dtype)
        w_cos = window[:, None] * cos_m  # [n_fft, F]
        w_msin = window[:, None] * msin_m
        r = n_fft // hop_length
        m = n + r - 1
        if m * hop_length > t:
            y = jnp.pad(y, ((0, 0), (0, m * hop_length - t)))
        mm_dtype = jnp.dtype(matmul_dtype) if matmul_dtype else real_dtype
        chunks = y[..., : m * hop_length].reshape(y.shape[0], m, hop_length)
        chunks = jnp.swapaxes(chunks, 0, 1).astype(mm_dtype)  # [m, B, hop]
        frames = jnp.concatenate(
            [chunks[k : k + n] for k in range(r)], axis=-1)  # [n, B, n_fft]
        re = jnp.matmul(frames, w_cos.astype(mm_dtype),
                        preferred_element_type=real_dtype)
        im = jnp.matmul(frames, w_msin.astype(mm_dtype),
                        preferred_element_type=real_dtype)
        return re, im  # [T, B, F] each
    # generic fallback: standard path + transpose (CPU / exotic configs)
    spec = stft_complex(y, n_fft, hop_length, win_length, window=window,
                        center=center, pad_mode=pad_mode)
    spec_t = jnp.transpose(spec, (2, 0, 1))
    if n_frames_out is not None and n_frames_out > spec_t.shape[0]:
        spec_t = jnp.pad(
            spec_t, ((0, n_frames_out - spec_t.shape[0]), (0, 0), (0, 0)))
    return spec_t.real, spec_t.imag


def stft_complex_tmajor(
    y: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    **kwargs,
) -> Array:
    """Complex convenience wrapper over ``stft_real_imag_tmajor``."""
    re, im = stft_real_imag_tmajor(y, n_fft, hop_length, win_length, **kwargs)
    return jax.lax.complex(re, im)


def istft_real_imag_tmajor(
    re: Array,  # [T_frames, B, F]
    im: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: Optional[int] = None,
    *,
    window: Optional[Array] = None,
    center: bool = True,
    matmul_dtype: Optional[Any] = None,
) -> Array:
    """Inverse STFT from TIME-MAJOR (real, imag) spectra -> [B, T].

    Matches ``istft_complex`` numerics. The inverse-DFT matmul runs directly
    on the time-major layout (no input transpose of the complex spectrogram);
    the single layout change is one transpose of the real frames before
    overlap-add. matmul_dtype: see stft_real_imag_tmajor.
    """
    default_win = window is None and win_length == n_fft
    if window is None:
        window = hann_window(win_length, dtype=jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    n_frames = re.shape[0]
    real_dtype = jnp.finfo(jnp.result_type(re)).dtype
    t_full = n_fft + hop_length * (n_frames - 1)

    # COLA-constant fast path: for the production (hann, 75% overlap)
    # configuration the squared-window OLA envelope is exactly constant
    # (3/2) everywhere except the first/last (n_fft - hop) samples — fold
    # the constant into the WINDOW applied to the frames and divide only
    # the edge strips, instead of an envelope divide over the whole signal
    # (measured 3.4 ms at serving shapes). Only for the default hann window
    # (the envelope must be computed from the actual window, statically).
    edge = n_fft - hop_length
    env_np = None
    cola_const = False
    if default_win and t_full > 2 * edge:
        import numpy as _np

        # envelope in f64 numpy so the folded constant is exact to the
        # output dtype (an f32 envelope perturbs f64 parity at ~1e-7)
        w_np = 0.5 * (1.0 - _np.cos(2.0 * _np.pi * _np.arange(n_fft) / n_fft))
        env_np = _np.zeros(t_full)
        for k in range(n_frames):
            env_np[k * hop_length : k * hop_length + n_fft] += w_np**2
        interior = env_np[edge:t_full - edge]
        cola_const = bool(_np.allclose(interior, interior[0], rtol=1e-9))

    if _use_matmul_dft(n_fft):
        a, b = _irdft_matrices(n_fft, real_dtype)
        mm_dtype = jnp.dtype(matmul_dtype) if matmul_dtype else real_dtype
        frames = (
            jnp.matmul(re.astype(mm_dtype), a.astype(mm_dtype),
                       preferred_element_type=real_dtype)
            + jnp.matmul(im.astype(mm_dtype), b.astype(mm_dtype),
                         preferred_element_type=real_dtype)
        )
    else:
        frames = jnp.fft.irfft(jax.lax.complex(re, im), n=n_fft, axis=-1)

    if cola_const:
        c0 = float(interior[0])
        frames = frames * (window.astype(real_dtype) * (1.0 / c0))
        frames = jnp.swapaxes(frames, 0, 1)  # [B, T, n_fft]
        out = overlap_add(frames, hop_length)
        # edge correction vector: exactly 1.0 in the interior (folded),
        # c0/env on the first/last (n_fft - hop) samples — one fused
        # broadcast multiply instead of a whole-signal envelope divide
        import numpy as _np

        fix_np = _np.ones(t_full)
        safe = _np.where(env_np > 1e-11, env_np, 1.0)
        fix_np[:edge] = c0 / safe[:edge]
        fix_np[t_full - edge:] = c0 / safe[t_full - edge:]
        out = out * jnp.asarray(fix_np, out.dtype)
    else:
        frames = frames * window
        frames = jnp.swapaxes(frames, 0, 1)  # [B, T, n_fft]
        out = overlap_add(frames, hop_length)
        env = _ola_envelope(window, n_frames, hop_length, frames.dtype)
        env = jnp.where(env > 1e-11, env, 1.0)
        out = out / env

    pad = n_fft // 2 if center else 0
    if length is not None:
        end = pad + length
        if end > t_full:
            out = jnp.pad(out, [(0, 0), (0, end - t_full)])
        out = out[:, pad:end]
    else:
        out = out[:, pad : t_full - pad]
    return out


def mag_phase(complex_spec: Array) -> Tuple[Array, Array]:
    """Magnitude and phase of a complex spectrogram (reference audio_feature.py:223)."""
    return jnp.abs(complex_spec), jnp.angle(complex_spec)


def stft(
    y: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    output_type: Optional[Literal["mag_phase", "real_imag", "complex"]] = None,
    **kwargs,
):
    """STFT wrapper with the reference's output_type surface.

    Mirrors reference audio_feature.py:236-294: accepts [B, T] or [B, C, T],
    hann window, pad_mode="constant", center=True; returns (mag, phase),
    (real, imag), complex, or (mag, phase, real, imag).
    """
    if y.ndim not in (2, 3):
        raise ValueError(f"Only single-/multi-channel signals supported, got ndim={y.ndim}")
    spec = stft_complex(y, n_fft, hop_length, win_length, **kwargs)
    if output_type == "mag_phase":
        return mag_phase(spec)
    elif output_type == "real_imag":
        return spec.real, spec.imag
    elif output_type == "complex":
        return spec
    else:
        m, p = mag_phase(spec)
        return m, p, spec.real, spec.imag


# OLA lowering strategy: "reshape" (default; scatter-free, best on TPU/CPU)
# or "scatter" (compatibility fallback for backends where the reshape graph
# hits unimplemented fusions — seen on remote-attached dev TPU tunnels).
OLA_MODE = "reshape"


def overlap_add(frames: Array, hop_length: int) -> Array:
    """Overlap-add [..., T_frames, frame_len] -> [..., frame_len + hop*(T-1)].

    TPU-fast path: when hop divides frame_len (the COLA case used by every
    recipe, e.g. 512/128), frames k, k+r, k+2r, ... (r = frame_len/hop) are
    mutually non-overlapping, so OLA is r shifted reshapes summed — pure
    vectorized adds, no scatter. Falls back to a scatter-add otherwise
    (or when OLA_MODE == "scatter").
    """
    *lead, n_frames, frame_len = frames.shape
    t_full = frame_len + hop_length * (n_frames - 1)
    flat = frames.reshape((-1, n_frames, frame_len))
    B = flat.shape[0]

    if frame_len % hop_length == 0 and OLA_MODE == "reshape":
        # frames k, k+r, k+2r, ... are mutually non-overlapping; each group
        # reshapes to a flat segment and pads (fused into the add) to the
        # full span. Groups keep their natural ragged lengths — padding the
        # frame COUNT first costs a full copy of the frame tensor (measured
        # 6 ms at serving shapes for ONE extra frame).
        r = frame_len // hop_length
        total = jnp.zeros((B, t_full), dtype=frames.dtype)
        for k in range(r):
            m_k = -(-(n_frames - k) // r)  # frames in this group
            if m_k <= 0:
                continue
            g = flat[:, k::r, :].reshape(B, m_k * frame_len)
            start = k * hop_length
            g = g[:, : max(t_full - start, 0)]
            total = total + jnp.pad(
                g, ((0, 0), (start, t_full - start - g.shape[1])))
        out = total
    else:
        idx = (
            jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(frame_len)[None, :]
        ).reshape(-1)
        out = jnp.zeros((B, t_full), dtype=frames.dtype)
        out = out.at[:, idx].add(flat.reshape(B, -1))
    return out.reshape(tuple(lead) + (t_full,))


def _ola_envelope(window: Array, n_frames: int, hop_length: int, dtype) -> Array:
    """Overlap-added squared-window normalization envelope (length = full OLA span)."""
    wsq = (window.astype(dtype)) ** 2
    return overlap_add(jnp.broadcast_to(wsq, (n_frames, wsq.shape[0])), hop_length)


def istft_complex(
    spec: Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: Optional[int] = None,
    *,
    window: Optional[Array] = None,
    center: bool = True,
) -> Array:
    """Inverse STFT matching ``torch.istft``. spec: [..., F, T] complex -> [..., T]."""
    if window is None:
        window = hann_window(win_length, dtype=jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    spec = jnp.swapaxes(spec, -1, -2)  # [..., T_frames, F]
    n_frames = spec.shape[-2]
    if _use_matmul_dft(n_fft):
        real_dtype = jnp.finfo(jnp.result_type(spec.real)).dtype
        a, b = _irdft_matrices(n_fft, real_dtype)
        frames = (
            jnp.matmul(spec.real, a, preferred_element_type=real_dtype)
            + jnp.matmul(spec.imag, b, preferred_element_type=real_dtype)
        )
    else:
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [..., T_frames, n_fft]
    frames = frames * window

    t_full = n_fft + hop_length * (n_frames - 1)
    lead_shape = frames.shape[:-2]
    out = overlap_add(frames, hop_length).reshape((-1, t_full))

    env = _ola_envelope(window, n_frames, hop_length, frames.dtype)
    # Guard only against exact zeros at the trimmed borders; interior envelope is
    # bounded away from 0 for COLA-satisfying (window, hop).
    env = jnp.where(env > 1e-11, env, 1.0)
    out = out / env

    pad = n_fft // 2 if center else 0
    if length is not None:
        # torch.istft semantics: take `length` samples starting at the center
        # pad, using the full OLA span (recovers the tail past the last hop).
        end = pad + length
        if end > t_full:
            out = jnp.pad(out, [(0, 0), (0, end - t_full)])
        out = out[:, pad:end]
    else:
        out = out[:, pad : t_full - pad]
    return out.reshape(lead_shape + (out.shape[-1],))


def istft_complex_tmajor(
    spec_t: Array,  # [T_frames, B, F] complex
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: Optional[int] = None,
    **kwargs,
) -> Array:
    """Complex convenience wrapper over ``istft_real_imag_tmajor``."""
    return istft_real_imag_tmajor(
        spec_t.real, spec_t.imag, n_fft, hop_length, win_length, length, **kwargs)


def istft(
    feature: Union[Array, Tuple[Array, Array], Sequence[Array]],
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: Optional[int] = None,
    input_type: Literal["mag_phase", "real_imag", "complex"] = "complex",
) -> Array:
    """iSTFT with the reference's input_type surface (audio_feature.py:297-347)."""
    if input_type == "real_imag":
        real, imag = feature
        spec = jax.lax.complex(real, imag)
    elif input_type == "complex":
        spec = feature
    elif input_type == "mag_phase":
        mag, phase = feature
        spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    else:
        raise ValueError(f"Unsupported input_type: {input_type}")
    return istft_complex(spec, n_fft, hop_length, win_length, length=length)


def make_stft_pair(n_fft: int, hop_length: int, win_length: int):
    """Partial-applied (stft, istft) closures, the reference's functools.partial idiom
    (modeling_spiking_fullsubnet.py:404-405)."""
    return (
        partial(stft, n_fft=n_fft, hop_length=hop_length, win_length=win_length),
        partial(istft, n_fft=n_fft, hop_length=hop_length, win_length=win_length),
    )
