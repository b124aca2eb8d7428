"""Numerical parity of the JAX STFT/iSTFT with torch.stft/istft conventions.

The reference wraps torch.stft with center=True, periodic hann, and
pad_mode="constant" (audio_feature.py:236-295); checkpoint-compatible
enhancement requires bit-level-close agreement.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from spiking_fullsubnet_tpu.dsp import spectral


def _torch_stft(y, n_fft, hop, win, pad_mode="constant", normalized=False):
    return torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop,
        win,
        window=torch.hann_window(win),
        return_complex=True,
        pad_mode=pad_mode,
        normalized=normalized,
    ).numpy()


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (256, 64), (2048, 512)])
def test_stft_matches_torch(n_fft, hop):
    y = np.random.randn(3, 16000).astype(np.float32)
    ours = np.asarray(spectral.stft_complex(jnp.asarray(y), n_fft, hop, n_fft))
    ref = _torch_stft(y, n_fft, hop, n_fft)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_stft_reflect_and_normalized():
    y = np.random.randn(2, 9000).astype(np.float32)
    ours = np.asarray(
        spectral.stft_complex(jnp.asarray(y), 512, 256, 512, pad_mode="reflect", normalized=True)
    )
    ref = _torch_stft(y, 512, 256, 512, pad_mode="reflect", normalized=True)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_stft_output_types():
    y = jnp.asarray(np.random.randn(2, 8000).astype(np.float32))
    mag, phase, real, imag = spectral.stft(y, 512, 128, 512)
    m2, p2 = spectral.stft(y, 512, 128, 512, output_type="mag_phase")
    c = spectral.stft(y, 512, 128, 512, output_type="complex")
    np.testing.assert_allclose(np.asarray(mag), np.abs(np.asarray(c)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mag))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(phase))
    np.testing.assert_allclose(np.asarray(real) + 1j * np.asarray(imag), np.asarray(c))


@pytest.mark.parametrize("n_fft,hop,length", [(512, 128, 16000), (256, 64, 8000)])
def test_istft_matches_torch(n_fft, hop, length):
    y = np.random.randn(2, length).astype(np.float32)
    spec = _torch_stft(y, n_fft, hop, n_fft)
    ref = torch.istft(
        torch.from_numpy(spec), n_fft, hop, n_fft, window=torch.hann_window(n_fft), length=length
    ).numpy()
    ours = np.asarray(
        spectral.istft(jnp.asarray(spec), n_fft, hop, n_fft, length=length, input_type="complex")
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_istft_roundtrip_and_types():
    y = np.random.randn(1, 12345).astype(np.float32)
    spec = spectral.stft_complex(jnp.asarray(y), 512, 128, 512)
    out = spectral.istft(spec, 512, 128, 512, length=12345)
    np.testing.assert_allclose(np.asarray(out), y, atol=1e-4)

    out_ri = spectral.istft((spec.real, spec.imag), 512, 128, 512, length=12345, input_type="real_imag")
    np.testing.assert_allclose(np.asarray(out_ri), y, atol=1e-4)

    mag, phase = spectral.mag_phase(spec)
    out_mp = spectral.istft((mag, phase), 512, 128, 512, length=12345, input_type="mag_phase")
    np.testing.assert_allclose(np.asarray(out_mp), y, atol=1e-4)


def test_istft_length_pad():
    y = np.random.randn(1, 8000).astype(np.float32)
    spec = spectral.stft_complex(jnp.asarray(y), 512, 128, 512)
    out = spectral.istft(spec, 512, 128, 512, length=9000)
    assert out.shape == (1, 9000)
    # beyond the signal, reconstruction sees only the stft zero padding
    np.testing.assert_allclose(np.asarray(out)[:, 8000:], 0.0, atol=1e-2)
    ref = torch.istft(
        torch.from_numpy(np.asarray(spec)), 512, 128, 512, window=torch.hann_window(512), length=9000
    ).numpy()
    # the last OLA samples divide by a vanishing window envelope; tolerance is
    # loose there (content is zero padding anyway)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3)


def test_istft_non_hop_multiple_length():
    # torch recovers the tail past the last full hop via the OLA span
    y = np.random.randn(1, 12345).astype(np.float32)
    spec = spectral.stft_complex(jnp.asarray(y), 512, 128, 512)
    out = spectral.istft(spec, 512, 128, 512, length=12345)
    np.testing.assert_allclose(np.asarray(out), y, atol=1e-4)


class TestMatmulDFT:
    """The TPU lowering expresses the rDFT as constant-matrix matmuls
    (spectral.DFT_MODE == "matmul"); it must agree with the FFT path."""

    @pytest.fixture(autouse=True)
    def _force_matmul(self, monkeypatch):
        monkeypatch.setattr(spectral, "DFT_MODE", "matmul")

    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (256, 64), (512, 100)])
    def test_stft_matches_torch(self, n_fft, hop):
        # hop=100 does not divide n_fft -> exercises the non-fused branch
        y = np.random.randn(3, 16000).astype(np.float32)
        ours = np.asarray(spectral.stft_complex(jnp.asarray(y), n_fft, hop, n_fft))
        ref = _torch_stft(y, n_fft, hop, n_fft)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_stft_normalized_fused(self):
        # normalized=True on the fused chunk-matmul branch (no frames tensor)
        y = np.random.randn(2, 9000).astype(np.float32)
        ours = np.asarray(
            spectral.stft_complex(jnp.asarray(y), 512, 128, 512, normalized=True)
        )
        ref = _torch_stft(y, 512, 128, 512, normalized=True)
        np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-3)

    def test_istft_roundtrip(self):
        y = np.random.randn(1, 12345).astype(np.float32)
        spec = spectral.stft_complex(jnp.asarray(y), 512, 128, 512)
        out = spectral.istft(spec, 512, 128, 512, length=12345)
        np.testing.assert_allclose(np.asarray(out), y, atol=2e-4)


def test_multichannel_stft():
    y = np.random.randn(2, 3, 8000).astype(np.float32)
    spec = np.asarray(spectral.stft_complex(jnp.asarray(y), 512, 128, 512))
    ref = _torch_stft(y.reshape(-1, 8000), 512, 128, 512).reshape(spec.shape)
    np.testing.assert_allclose(spec, ref, atol=2e-4, rtol=1e-4)
