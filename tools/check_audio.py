#!/usr/bin/env python
"""Dataset hygiene checks: clipping, activity, existence, mono, non-signal.

Consolidates reference tools/check_{clip_activity,existence,missing_pair,
mono,non_signal}.py into one CLI with subcommands.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from spiking_fullsubnet_tpu.dsp.io import find_files, load_wav
from spiking_fullsubnet_tpu.dsp.norms import activity_detector, is_clipped


def cmd_clip_activity(args):
    for f in find_files(args.dir):
        y = load_wav(f)
        clipped = is_clipped(y, args.clip_threshold)
        activity = activity_detector(y, fs=args.sr)
        if clipped or activity < args.min_activity:
            print(f"{f}\tclipped={clipped}\tactivity={activity:.3f}")


def cmd_existence(args):
    missing = [line for line in open(args.scp) if not Path(line.split()[-1].strip()).exists()]
    print(f"{len(missing)} missing files")
    for m in missing[:50]:
        print(m.strip())


def cmd_missing_pair(args):
    a = {Path(f).stem for f in find_files(args.dir_a)}
    b = {Path(f).stem for f in find_files(args.dir_b)}
    print("only in A:", sorted(a - b)[:50])
    print("only in B:", sorted(b - a)[:50])


def cmd_mono(args):
    for f in find_files(args.dir):
        y = load_wav(f)
        if y.ndim != 1:
            print(f"{f}\tchannels={y.shape[0]}")


def cmd_non_signal(args):
    for f in find_files(args.dir):
        y = load_wav(f)
        rms = float(np.sqrt(np.mean(y**2)))
        if rms < args.min_rms:
            print(f"{f}\trms={rms:.2e}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("clip_activity")
    s.add_argument("dir")
    s.add_argument("--clip_threshold", type=float, default=0.999)
    s.add_argument("--min_activity", type=float, default=0.6)
    s.add_argument("--sr", type=int, default=16000)
    s.set_defaults(func=cmd_clip_activity)

    s = sub.add_parser("existence")
    s.add_argument("scp")
    s.set_defaults(func=cmd_existence)

    s = sub.add_parser("missing_pair")
    s.add_argument("dir_a")
    s.add_argument("dir_b")
    s.set_defaults(func=cmd_missing_pair)

    s = sub.add_parser("mono")
    s.add_argument("dir")
    s.set_defaults(func=cmd_mono)

    s = sub.add_parser("non_signal")
    s.add_argument("dir")
    s.add_argument("--min_rms", type=float, default=1e-4)
    s.set_defaults(func=cmd_non_signal)

    args = p.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
