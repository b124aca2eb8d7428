"""Freeze-phase experiment CLI.

Shared surface plus `--torch_ckpt <pytorch_model.bin>`: the reference's
shipped model-zoo competition weights load directly into the JAX Separator
for validation/test (waveform-allclose verified in
tests/test_spiking_fullsubnet.py::test_frozen_zoo_checkpoint_parity).
"""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent)


if __name__ == "__main__":
    main()
