"""Experiment CLI (shared implementation in spiking_fullsubnet_tpu.runtime.cli)."""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent)


if __name__ == "__main__":
    main()
