"""REVERB dereverberation CLI (mirrors reference recipes/reverb/
spiking_fullsubnet/run.py surface)."""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent)


if __name__ == "__main__":
    main()
