"""Freeze-phase experiment CLI.

Shared surface plus `--torch_ckpt <pytorch_model.bin>`: the reference's
shipped model-zoo competition weights load directly into the JAX Separator
for validation/test (waveform-allclose verified in
tests/test_spiking_fullsubnet.py::test_frozen_zoo_checkpoint_parity).

When the config has a `[model_d]` section a discriminator bundle is built
and the trainer runs the MetricGAN loop (reference freeze run.py builds
model_g + model_d with dual optimizers/schedulers).
"""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main
from spiking_fullsubnet_tpu.recipes.gan import build_discriminator_bundles


def main(argv=None):
    return _main(
        argv, recipe_dir=Path(__file__).parent, extra_trainer_kwargs=build_discriminator_bundles
    )


if __name__ == "__main__":
    main()
