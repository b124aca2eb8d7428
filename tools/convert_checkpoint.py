#!/usr/bin/env python
"""Convert a reference torch checkpoint to the framework's torch-free .npz.

One-shot conversion (torch required only here, never in the runtime):
    python tools/convert_checkpoint.py \
        --torch_ckpt model_zoo/.../pytorch_model.bin \
        --config recipes/intel_ndns/spiking_fullsubnet_freeze_phase/baseline_m.toml \
        --output baseline_m.npz
"""

from __future__ import annotations

import argparse

from spiking_fullsubnet_tpu.runtime import toml_load
from spiking_fullsubnet_tpu.runtime.convert import (
    import_spiking_fullsubnet,
    load_torch_state_dict,
    save_npz,
)
from spiking_fullsubnet_tpu.runtime.registry import instantiate


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--config", required=True, help="experiment TOML providing [model]")
    p.add_argument("--output", required=True, help="output .npz path")
    args = p.parse_args()

    cfg = toml_load(args.config)
    bundle = instantiate(cfg["model"]["path"], args={"seed": 0} | cfg["model"]["args"])
    sd = load_torch_state_dict(args.torch_ckpt)
    params, state = import_spiking_fullsubnet(sd, bundle["config"])
    save_npz(args.output, {"params": params, "state": state})
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
