#!/usr/bin/env python
"""DNSMOS CLI: score a directory of wavs with the P.835/P.808 ONNX models.

Re-design of reference tools/dns_mos_2023_01_10.py. Requires onnxruntime and
the Microsoft DNSMOS onnx files (default: the in-tree bundle at
model_zoo/external/DNSMOS/; override with --model_dir or DNSMOS_MODEL_DIR).
"""

from __future__ import annotations

import argparse

import pandas as pd

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav
from spiking_fullsubnet_tpu.metrics import DNSMOS


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-D", "--dir", required=True, help="directory of wavs to score")
    p.add_argument("-O", "--output", default="dnsmos.csv")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--no_p808", action="store_true")
    args = p.parse_args()

    mos = DNSMOS(input_sr=args.sr, model_dir=args.model_dir)
    rows = []
    for f in find_files(args.dir):
        y = load_wav(f, sr=args.sr)
        rows.append({"file": f} | mos(y, return_p808=not args.no_p808))
    df = pd.DataFrame(rows)
    df.to_csv(args.output, index=False)
    print(df.mean(numeric_only=True).to_frame().T.to_markdown(index=False))


if __name__ == "__main__":
    main()
