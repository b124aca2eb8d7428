"""Intel N-DNS Spiking-FullSubNet experiment CLI.

Same surface as the reference (recipes/intel_ndns/spiking_fullsubnet/
run.py:106-151): `python run.py -C cfg.toml -M train|validate|test|predict
[-R] [--ckpt_path ...]`. Single-host multi-chip runs need no launcher (one
process drives all local chips through the mesh); multi-host pods launch one
process per host with JAX distributed env set.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from spiking_fullsubnet_tpu.data import DataLoader
from spiking_fullsubnet_tpu.parallel.dist import (
    device_specific_seed,
    initialize_distributed,
    scale_lr,
)
from spiking_fullsubnet_tpu.runtime import (
    build_optimizer_factory,
    init_logging_logger,
    instantiate,
    toml_load,
)


def run(config, resume, modes, ckpt_path=None):
    initialize_distributed()
    init_logging_logger(config)

    seed = device_specific_seed(config["meta"].get("seed", 0))

    model = instantiate(config["model"]["path"], args={"seed": seed} | config["model"]["args"])
    optimizer_factory, base_lr = build_optimizer_factory(
        config["optimizer"]["path"], config["optimizer"]["args"]
    )
    base_lr = scale_lr(base_lr)  # LR x sqrt(world) rule (reference run.py:31)

    loss_function = None
    if "loss_function" in config and config["loss_function"].get("path"):
        loss_function = instantiate(
            config["loss_function"]["path"], args=config["loss_function"].get("args") or {}
        )

    train_dataloader = None
    validate_dataloaders = None
    test_dataloaders = None

    if "train" in modes:
        train_dataset = instantiate(config["train_dataset"]["path"], args=config["train_dataset"]["args"])
        train_dataloader = DataLoader(
            dataset=train_dataset, shuffle=True, seed=seed, **config["train_dataset"]["dataloader"]
        )

    if "train" in modes or "validate" in modes:
        val_cfgs = config["validate_dataset"]
        if not isinstance(val_cfgs, list):
            val_cfgs = [val_cfgs]
        validate_dataloaders = [
            DataLoader(
                dataset=instantiate(c["path"], args=c["args"]),
                **c.get("dataloader", {}),
            )
            for c in val_cfgs
        ]

    if "test" in modes or "predict" in modes:
        test_cfgs = config["test_dataset"]
        if not isinstance(test_cfgs, list):
            test_cfgs = [test_cfgs]
        test_dataloaders = [
            DataLoader(dataset=instantiate(c["path"], args=c["args"]), **c.get("dataloader", {}))
            for c in test_cfgs
        ]

    trainer = instantiate(config["trainer"]["path"], initialize=False)(
        config=config,
        resume=resume,
        model=model,
        optimizer_factory=optimizer_factory,
        base_lr=base_lr,
        loss_function=loss_function,
    )

    for flag in modes:
        if flag == "train":
            trainer.train(train_dataloader, validate_dataloaders)
        elif flag == "validate":
            trainer.validate(validate_dataloaders)
        elif flag == "test":
            trainer.test(test_dataloaders, ckpt_path or config["meta"].get("ckpt_path", "best"))
        elif flag == "predict":
            trainer.predict(test_dataloaders, ckpt_path or config["meta"].get("ckpt_path", "best"))
        else:
            raise ValueError(f"Unknown mode: {flag}.")
    return trainer


def main(argv=None):
    parser = argparse.ArgumentParser(description="Spiking-FullSubNet TPU")
    parser.add_argument("-C", "--configuration", required=True, type=str, help="Configuration (*.toml).")
    parser.add_argument(
        "-M",
        "--mode",
        nargs="+",
        type=str,
        default=["train"],
        choices=["train", "validate", "test", "predict", "finetune"],
        help="Mode of the experiment.",
    )
    parser.add_argument("-R", "--resume", action="store_true", help="Resume from the latest checkpoint.")
    parser.add_argument(
        "--ckpt_path",
        type=str,
        default=None,
        help="Checkpoint for test/predict: 'best', 'latest', or a path.",
    )
    args = parser.parse_args(argv)

    config_path = Path(args.configuration).expanduser().absolute()
    config = toml_load(config_path)
    config["meta"]["exp_id"] = config_path.stem
    config["meta"]["config_path"] = config_path.as_posix()

    if "test" in args.mode and args.ckpt_path is None:
        raise ValueError("checkpoint path is required for test. Use '--ckpt_path'.")
    if args.ckpt_path:
        config["meta"]["ckpt_path"] = args.ckpt_path

    return run(config, args.resume, args.mode, args.ckpt_path)


if __name__ == "__main__":
    main()
