"""DNSAudio native window-read fast path == the decode-all-then-crop path."""

import numpy as np
import pytest
from scipy.io import wavfile

from spiking_fullsubnet_tpu.data.dns_audio import DNSAudio
from spiking_fullsubnet_tpu.native import wavio

pytestmark = pytest.mark.skipif(
    not wavio.native_available(), reason="no C++ toolchain for native wavio"
)


@pytest.fixture()
def dns_root(tmp_path):
    sr = 16000
    (tmp_path / "noisy").mkdir()
    (tmp_path / "clean").mkdir()
    rng = np.random.default_rng(5)
    # one file shorter than 30 s (zero-pad branch), one longer (truncate branch)
    for fid, secs in [(1, 8.0), (2, 33.0)]:
        t = int(secs * sr)
        clean = (rng.standard_normal(t) * 0.1).astype(np.float32)
        noisy = clean + (rng.standard_normal(t) * 0.05).astype(np.float32)
        wavfile.write(
            str(tmp_path / "noisy" / f"book_snr10_tl-25_fileid_{fid}.wav"),
            sr,
            (noisy * 32767).astype(np.int16),
        )
        wavfile.write(
            str(tmp_path / "clean" / f"clean_fileid_{fid}.wav"),
            sr,
            (clean * 32767).astype(np.int16),
        )
    return tmp_path


@pytest.mark.parametrize("train", [True, False])
def test_native_path_matches_slow_path(dns_root, train):
    ds_fast = DNSAudio(root=str(dns_root), train=train, sublen=6)
    ds_slow = DNSAudio(root=str(dns_root), train=train, sublen=6)
    ds_slow.use_native = False
    assert ds_fast.use_native

    for n in range(len(ds_fast)):
        np.random.seed(1234 + n)
        noisy_f, clean_f, path_f = ds_fast[n]
        np.random.seed(1234 + n)
        noisy_s, clean_s, path_s = ds_slow[n]
        assert path_f == path_s
        assert noisy_f.shape == noisy_s.shape == ((96000,) if train else (480000,))
        np.testing.assert_array_equal(noisy_f, noisy_s)
        np.testing.assert_array_equal(clean_f, clean_s)
        assert noisy_f.dtype == np.float32
