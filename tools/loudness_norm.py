#!/usr/bin/env python
"""Batch loudness normalization (re-design of reference tools/loudness_norm.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav, save_wav
from spiking_fullsubnet_tpu.dsp.norms import loudness_rms_norm


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-I", "--input_dir", required=True)
    p.add_argument("-O", "--output_dir", required=True)
    p.add_argument("--lvl", type=float, default=-25, help="target dBFS")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args()

    for f in find_files(args.input_dir):
        y = load_wav(f, sr=args.sr)
        y, _ = loudness_rms_norm(y, lvl=args.lvl)
        dst = Path(args.output_dir) / Path(f).relative_to(args.input_dir)
        dst.parent.mkdir(parents=True, exist_ok=True)
        save_wav(y, dst, args.sr)
    print("done")


if __name__ == "__main__":
    main()
