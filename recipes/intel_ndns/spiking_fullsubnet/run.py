"""Intel N-DNS Spiking-FullSubNet experiment CLI.

Same surface as the reference (recipes/intel_ndns/spiking_fullsubnet/
run.py:106-151): `python run.py -C cfg.toml -M train|validate|test|predict
[-R] [--ckpt_path ...]`. Single-host multi-chip runs need no launcher (one
process drives all local chips through the mesh); multi-host pods launch one
process per host with JAX distributed env set.
"""

from pathlib import Path

from spiking_fullsubnet_tpu.runtime.cli import main as _main


def main(argv=None):
    return _main(argv, recipe_dir=Path(__file__).parent)


if __name__ == "__main__":
    main()
