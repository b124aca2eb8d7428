"""Native C++ WAV codec vs the scipy reference path.

Builds native/wavio.cpp on first use (g++, cached by source hash). If no
toolchain is present the whole module skips — the framework's IO falls back
to scipy automatically (dsp/io.py).
"""

import numpy as np
import pytest
from scipy.io import wavfile

from spiking_fullsubnet_tpu.native import wavio

pytestmark = pytest.mark.skipif(
    not wavio.native_available(), reason="no C++ toolchain for native wavio"
)


@pytest.fixture()
def tone():
    t = np.arange(16000, dtype=np.float32) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def test_pcm16_roundtrip_matches_scipy(tmp_path, tone):
    p = tmp_path / "a.wav"
    wavfile.write(str(p), 16000, (tone * 32767.0).astype(np.int16))

    y, sr = wavio.wav_read(p)
    assert sr == 16000
    ref = wavfile.read(str(p))[1] / 32768.0
    np.testing.assert_allclose(y, ref.astype(np.float32), atol=0)

    sr2, frames, ch, bits, fmt = wavio.wav_info(p)
    assert (sr2, frames, ch, bits, fmt) == (16000, 16000, 1, 16, 1)


def test_float32_and_int32_formats(tmp_path, tone):
    pf = tmp_path / "f32.wav"
    wavfile.write(str(pf), 8000, tone)
    y, sr = wavio.wav_read(pf)
    np.testing.assert_array_equal(y, tone)

    pi = tmp_path / "i32.wav"
    wavfile.write(str(pi), 8000, (tone * 2147483647.0).astype(np.int32))
    y, _ = wavio.wav_read(pi)
    ref = wavfile.read(str(pi))[1] / 2147483648.0
    np.testing.assert_allclose(y, ref.astype(np.float32), atol=0)


def test_pcm24(tmp_path, tone):
    # scipy can't write 24-bit; craft the data chunk by hand
    s32 = (tone[:1000] * 2147483647.0).astype(np.int32)
    b24 = bytearray()
    for v in s32:
        u = int(v) & 0xFFFFFFFF
        b24 += bytes(((u >> 8) & 0xFF, (u >> 16) & 0xFF, (u >> 24) & 0xFF))
    import struct

    p = tmp_path / "p24.wav"
    data = bytes(b24)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24
    ) + b"data" + struct.pack("<I", len(data))
    p.write_bytes(hdr + data)

    y, sr = wavio.wav_read(p)
    assert sr == 16000
    ref = ((s32 >> 8) << 8).astype(np.float64) / 2147483648.0
    np.testing.assert_allclose(y, ref.astype(np.float32), atol=0)


def test_window_reads_and_padding(tmp_path, tone):
    p = tmp_path / "w.wav"
    wavfile.write(str(p), 16000, (tone * 32767.0).astype(np.int16))
    full, _ = wavio.wav_read(p)

    y, _ = wavio.wav_read(p, offset=1000, frames=500)
    np.testing.assert_array_equal(y, full[1000:1500])

    # window past EOF zero-pads (pre-zeroed buffer contract)
    y, _ = wavio.wav_read(p, offset=15900, frames=500)
    np.testing.assert_array_equal(y[:100], full[15900:])
    assert (y[100:] == 0).all()


def test_read_batch_threaded(tmp_path, tone):
    paths, offsets = [], []
    for i in range(6):
        p = tmp_path / f"b{i}.wav"
        sig = np.roll(tone, i * 17)
        wavfile.write(str(p), 16000, (sig * 32767.0).astype(np.int16))
        paths.append(p)
        offsets.append(i * 100)
    out = wavio.read_batch(paths, offsets, frames=4000, num_threads=4)
    assert out.shape == (6, 4000)
    for i, p in enumerate(paths):
        ref, _ = wavio.wav_read(p, offset=offsets[i], frames=4000, pad_to=4000)
        np.testing.assert_array_equal(out[i], ref)


def test_write_pcm16_and_float(tmp_path, tone):
    p16 = tmp_path / "o16.wav"
    wavio.wav_write(p16, tone, 16000)
    sr, y = wavfile.read(str(p16))
    assert sr == 16000 and y.dtype == np.int16
    np.testing.assert_allclose(y / 32767.0, tone, atol=1 / 32767.0)

    pf = tmp_path / "of.wav"
    wavio.wav_write(pf, tone, 16000, as_float=True)
    sr, y = wavfile.read(str(pf))
    np.testing.assert_array_equal(y, tone)

    # our own reader reads our own writer
    y2, sr2 = wavio.wav_read(pf)
    assert sr2 == 16000
    np.testing.assert_array_equal(y2, tone)


def test_dsp_io_uses_native_consistently(tmp_path, tone):
    """dsp.io.load_wav / save_wav produce the same values on both paths."""
    from spiking_fullsubnet_tpu.dsp import io as dsp_io

    p = tmp_path / "c.wav"
    wavfile.write(str(p), 16000, (tone * 32767.0).astype(np.int16))
    y_native = dsp_io.load_wav(p)

    ref = wavfile.read(str(p))[1] / 32768.0
    np.testing.assert_allclose(y_native, ref.astype(np.float32), atol=0)

    out = tmp_path / "d.wav"
    dsp_io.save_wav(tone, out, 16000)
    sr, y = wavfile.read(str(out))
    assert sr == 16000
    np.testing.assert_allclose(y / 32767.0, tone, atol=1 / 32767.0)


def test_error_reporting(tmp_path):
    with pytest.raises(IOError, match="cannot open"):
        wavio.wav_read(tmp_path / "missing.wav")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    with pytest.raises(IOError, match="unsupported|malformed"):
        wavio.wav_read(bad)
