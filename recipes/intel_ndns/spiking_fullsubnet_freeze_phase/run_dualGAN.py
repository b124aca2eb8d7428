"""Dual-GAN freeze-phase CLI (reference run_dualGAN.py: model_g +
model_d_sig + model_d_bak with per-model optimizers/schedulers)."""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main
from spiking_fullsubnet_tpu.recipes.gan import build_discriminator_bundles


def main(argv=None):
    return _main(
        argv, recipe_dir=Path(__file__).parent, extra_trainer_kwargs=build_discriminator_bundles
    )


if __name__ == "__main__":
    main()
