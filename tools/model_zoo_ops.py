#!/usr/bin/env python
"""Model-zoo / experiment-artifact operations.

Covers the reference's experiment-utility scripts:
- `collect`      <- tools/collect_model.py: copy an experiment's checkpoint,
                    tb_log, logfile and latest config snapshot into the
                    model_zoo/<dataset>/<model>/<exp_id> layout.
- `strip-prefix` <- tools/enhancementpass_model_to_audiozen_model.py: strip a
                    key prefix (e.g. DDP's "module.") from a torch state
                    dict, or from this framework's .npz checkpoints.
- `upload-hf`    <- tools/upload_model_hf.py: push a collected model folder
                    to the HuggingFace Hub. Repo id is derived from the
                    folder path the same way (<dataset>_<model>); the token
                    comes from HF_TOKEN / the HF cli login, NEVER from code.

Usage:
    python tools/model_zoo_ops.py collect intel_ndns spiking_fullsubnet my_exp
    python tools/model_zoo_ops.py strip-prefix in.npz out.npz --prefix module.
    python tools/model_zoo_ops.py upload-hf model_zoo/intel_ndns/spiking_fullsubnet
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path


def cmd_collect(args):
    exp_dir = Path("recipes", args.dataset, args.model_name) / "exp" / args.exp_id
    ckpt_path = exp_dir / "checkpoints" / args.ckpt_id
    if not ckpt_path.exists():
        sys.exit(f"Checkpoint {ckpt_path} does not exist.")
    dest = Path(args.model_zoo_path) / args.dataset / args.model_name / args.exp_id
    (dest / "checkpoints").mkdir(parents=True, exist_ok=True)
    shutil.copytree(ckpt_path, dest / "checkpoints" / args.ckpt_id, dirs_exist_ok=True)

    tb = exp_dir / "tb_log"
    if tb.exists():
        shutil.copytree(tb, dest / "tb_log", dirs_exist_ok=True)
    for log in exp_dir.glob("*.log"):
        shutil.copy(log, dest / log.name)
    configs = sorted(exp_dir.glob("*.toml"))
    if configs:
        shutil.copy(configs[-1], dest / f"{args.exp_id}.toml")
    print(f"Collected {exp_dir} -> {dest}")


def cmd_strip_prefix(args):
    src, out, prefix = args.input, args.output, args.prefix
    if src.endswith((".npz",)):
        import numpy as np

        data = dict(np.load(src, allow_pickle=False))
        renamed = {
            (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in data.items()
        }
        np.savez(out, **renamed)
    else:  # torch checkpoint
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        renamed = {
            (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
        }
        torch.save(renamed, out)
    n = sum(1 for k in renamed)
    print(f"Wrote {out} ({n} tensors, prefix {prefix!r} stripped)")


def cmd_upload_hf(args):
    try:
        from huggingface_hub import HfApi
    except ImportError:
        sys.exit("huggingface_hub is not installed; `pip install huggingface_hub`.")
    folder = Path(args.model_folder_path).absolute()
    if not folder.exists():
        sys.exit(f"{folder} does not exist")
    repo_id = args.repo_id or f"{folder.parent.name}_{folder.name}"
    if args.namespace:
        repo_id = f"{args.namespace}/{repo_id}"
    token = os.environ.get("HF_TOKEN")  # falls back to cached CLI login
    api = HfApi(token=token)
    url = api.create_repo(repo_id=repo_id, exist_ok=True, private=args.private)
    api.upload_folder(folder_path=str(folder), repo_id=repo_id)
    print(f"Uploaded {folder} -> {url}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("collect", help="copy exp artifacts into the model zoo")
    s.add_argument("dataset")
    s.add_argument("model_name")
    s.add_argument("exp_id")
    s.add_argument("--ckpt_id", default="best")
    s.add_argument("--model_zoo_path", default="model_zoo")
    s.set_defaults(fn=cmd_collect)

    s = sub.add_parser("strip-prefix", help="strip a key prefix from a checkpoint")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--prefix", default="module.")
    s.set_defaults(fn=cmd_strip_prefix)

    s = sub.add_parser("upload-hf", help="upload a model folder to HuggingFace Hub")
    s.add_argument("model_folder_path")
    s.add_argument("--repo_id", default=None)
    s.add_argument("--namespace", default=None)
    s.add_argument("--private", action="store_true")
    s.set_defaults(fn=cmd_upload_hf)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
