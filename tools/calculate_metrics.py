#!/usr/bin/env python
"""Offline metric computation: reference vs estimated wav dirs/lists.

Re-design of reference tools/calculate_metrics.py (which imports a
now-missing IntelSISNR; this build implements the intent): parallel scoring
of SI-SDR / STOI (+ DNSMOS/PESQ when their backends are present), CSV output.

Usage:
    python tools/calculate_metrics.py -E est_dir -R ref_dir -M si_sdr stoi \
        -O metrics.csv [--sr 16000]
"""

from __future__ import annotations

import argparse
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np
import pandas as pd

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav
from spiking_fullsubnet_tpu.metrics import SISDR, STOI


def build_metrics(names, sr):
    metrics = {}
    for n in names:
        if n == "si_sdr":
            metrics[n] = SISDR()
        elif n == "stoi":
            metrics[n] = STOI(sr=sr)
        elif n == "dnsmos":
            from spiking_fullsubnet_tpu.metrics import DNSMOS

            metrics[n] = DNSMOS(input_sr=sr)
        elif n == "pesq_wb":
            from spiking_fullsubnet_tpu.metrics import PESQ

            metrics[n] = PESQ(sr=sr, mode="wb")
        else:
            raise ValueError(f"Unknown metric {n}")
    return metrics


def score_pair(args):
    est_path, ref_path, names, sr = args
    est = load_wav(est_path, sr=sr)
    row = {"file": Path(est_path).name}
    metrics = build_metrics(names, sr)
    for n, m in metrics.items():
        if n == "dnsmos":
            row |= m(est)
        else:
            ref = load_wav(ref_path, sr=sr)
            t = min(len(est), len(ref))
            row |= m(est[:t], ref[:t])
    return row


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-E", "--estimated", required=True, help="dir or scp of estimated wavs")
    p.add_argument("-R", "--reference", required=True, help="dir or scp of reference wavs")
    p.add_argument("-M", "--metrics", nargs="+", default=["si_sdr", "stoi"])
    p.add_argument("-O", "--output", default="metrics.csv")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    est_files = sorted(find_files(args.estimated))
    ref_files = sorted(find_files(args.reference))
    if len(est_files) != len(ref_files):
        raise ValueError(f"count mismatch: {len(est_files)} est vs {len(ref_files)} ref")

    jobs = [(e, r, args.metrics, args.sr) for e, r in zip(est_files, ref_files)]
    if args.num_workers > 1:
        with ProcessPoolExecutor(max_workers=args.num_workers) as pool:
            rows = list(pool.map(score_pair, jobs))
    else:
        rows = [score_pair(j) for j in jobs]

    df = pd.DataFrame(rows)
    df.to_csv(args.output, index=False)
    mean = df.mean(numeric_only=True)
    print(mean.to_frame().T.to_markdown(index=False))
    print(f"\nWrote {len(df)} rows to {args.output}")


if __name__ == "__main__":
    main()
