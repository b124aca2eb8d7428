#!/usr/bin/env python
"""Pack a noise corpus into one HDF5 file for fast training-time access.

Equivalent of reference tools/convert_dns_noise_to_hdf5.py: load every wav
under a directory at 16 kHz, store as float16 datasets keyed by file stem.
Reading thousands of small noise files per epoch thrashes the filesystem;
one HDF5 with per-clip datasets keeps the noise bank memory-mappable.

Usage:
    python tools/noise_to_hdf5.py /data/noise /data/noise_fp16.hdf5 --sr 16000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("noise_dir")
    p.add_argument("output", help="output .hdf5 path")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--dtype", default="float16", choices=["float16", "float32"])
    args = p.parse_args()

    try:
        import h5py
    except ImportError:
        sys.exit("h5py is not installed; `pip install h5py`.")

    paths = find_files(args.noise_dir)
    if not paths:
        sys.exit(f"No wav files found under {args.noise_dir}")

    with h5py.File(args.output, "w") as hf:
        hf.attrs["sr"] = args.sr
        for fpath in paths:
            y = load_wav(fpath, sr=args.sr)
            if y.ndim == 2:
                y = y.mean(axis=0)
            stem = Path(fpath).stem
            hf.create_dataset(stem, data=y.astype(args.dtype))
    print(f"Wrote {len(paths)} clips to {args.output}")


if __name__ == "__main__":
    main()
