"""GAN variant CLI: adds a discriminator bundle (reference run_GAN.py)."""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main
from spiking_fullsubnet_tpu.models.discriminator import build as build_discriminator


def _extra(config, seed):
    disc_args = config.get("model_d", {}).get("args", {}) or {}
    return {"discriminator": build_discriminator(seed=seed + 1, **disc_args)}


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent, extra_trainer_kwargs=_extra)


if __name__ == "__main__":
    main()
