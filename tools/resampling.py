#!/usr/bin/env python
"""Batch resampling of wav trees (re-design of reference tools/resampling.py)."""

from __future__ import annotations

import argparse
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav, save_wav


def resample_one(args):
    src, src_root, dst_root, sr = args
    y = load_wav(src, sr=sr)
    dst = Path(dst_root) / Path(src).relative_to(src_root)
    dst.parent.mkdir(parents=True, exist_ok=True)
    save_wav(y, dst, sr)
    return str(dst)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-I", "--input_dir", required=True)
    p.add_argument("-O", "--output_dir", required=True)
    p.add_argument("--sr", type=int, required=True)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    files = find_files(args.input_dir)
    jobs = [(f, args.input_dir, args.output_dir, args.sr) for f in files]
    if args.num_workers > 1:
        with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
            done = list(pool.map(resample_one, jobs))
    else:
        done = [resample_one(j) for j in jobs]
    print(f"Resampled {len(done)} files to {args.sr} Hz under {args.output_dir}")


if __name__ == "__main__":
    main()
