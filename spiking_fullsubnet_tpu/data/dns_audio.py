"""Intel N-DNS dataset: the DNSAudio contract.

Re-design of recipes/intel_ndns/spiking_fullsubnet/dataloader.py:12-101:
glob `root/noisy/**.wav`, derive clean paths via the fileid regex, pad/crop
to 30 s, draw a random aligned `sublen`-second crop during training. Returns
(noisy_f32[T], clean_f32[T], noisy_path).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np

from ..dsp.io import load_wav, subsample
from ..native import wavio as _native
from .base_dataset import BaseDataset


class DNSAudio(BaseDataset):
    def __init__(self, root: str = "./", limit=None, offset: int = 0, sublen: int = 6, train: bool = True):
        super().__init__()
        self.root = root
        self.noisy_files = sorted(glob.glob(os.path.join(root, "noisy", "*.wav")))
        if offset > 0:
            self.noisy_files = self.noisy_files[offset:]
        if limit:
            self.noisy_files = self.noisy_files[:limit]

        self.file_id_from_name = re.compile(r"fileid_(\d+)")
        self.snr_from_name = re.compile(r"snr(-?\d+)")
        self.target_level_from_name = re.compile(r"tl(-?\d+)")
        self.source_info_from_name = re.compile("^(.*?)_snr")

        self.train = train
        self.sublen = sublen
        self.length = len(self.noisy_files)
        # Native fast path: read ONLY the crop window (fseek + decode sublen
        # seconds) instead of decoding the whole 30 s file and cropping in
        # numpy. Value-identical to the slow path (same RNG draw, zero-pad
        # past EOF == fix()'s zero-pad, 30 s truncation == never reading past
        # the 30 s window).
        self.use_native = _native.native_available()

    def __len__(self) -> int:
        return self.length

    def _get_filenames(self, n: int):
        noisy_file = self.noisy_files[n % self.length]
        filename = os.path.basename(noisy_file)
        file_id = int(self.file_id_from_name.findall(filename)[0])
        clean_file = os.path.join(self.root, "clean", f"clean_fileid_{file_id}.wav")
        noise_file = os.path.join(self.root, "noise", f"noise_fileid_{file_id}.wav")
        metadata = {}
        for key, pat in [("snr", self.snr_from_name), ("target_level", self.target_level_from_name)]:
            found = pat.findall(filename)
            if found:
                metadata[key] = int(found[0])
        src = self.source_info_from_name.findall(filename)
        if src:
            metadata["source_info"] = src[0]
        return noisy_file, clean_file, noise_file, metadata

    def __getitem__(self, n: int):
        noisy_file, clean_file, _, metadata = self._get_filenames(n)
        sr = 16000
        num_samples = 30 * sr
        train_num_samples = self.sublen * sr

        if self.use_native:
            if self.train:
                # same RNG stream as subsample(): one randint for the pair
                start = int(np.random.randint(num_samples - train_num_samples))
                noisy_audio, _ = _native.wav_read(
                    noisy_file, offset=start, frames=train_num_samples, pad_to=train_num_samples
                )
                clean_audio, _ = _native.wav_read(
                    clean_file, offset=start, frames=train_num_samples, pad_to=train_num_samples
                )
            else:
                noisy_audio, _ = _native.wav_read(noisy_file, frames=num_samples, pad_to=num_samples)
                clean_audio, _ = _native.wav_read(clean_file, frames=num_samples, pad_to=num_samples)
            return noisy_audio, clean_audio, noisy_file

        noisy_audio = load_wav(noisy_file)
        clean_audio = load_wav(clean_file)

        def fix(y):
            if len(y) > num_samples:
                return y[:num_samples]
            return np.concatenate([y, np.zeros(num_samples - len(y), dtype=y.dtype)])

        noisy_audio = fix(noisy_audio).astype(np.float32)
        clean_audio = fix(clean_audio).astype(np.float32)

        if self.train:
            noisy_audio, start = subsample(noisy_audio, train_num_samples, return_start_idx=True)
            clean_audio = subsample(clean_audio, train_num_samples, start_idx=start)

        return noisy_audio, clean_audio, noisy_file
