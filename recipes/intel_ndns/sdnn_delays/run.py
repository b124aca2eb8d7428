"""Intel baseline SDNN CLI (mirrors reference sdnn_delays/run.py surface)."""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent)


if __name__ == "__main__":
    main()
