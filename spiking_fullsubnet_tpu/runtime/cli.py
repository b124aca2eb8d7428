"""Shared experiment CLI (the reference duplicates this per recipe run.py;
here it is one implementation each recipe shims into).

Surface: `python run.py -C cfg.toml -M train|validate|test|predict [-R]
[--ckpt_path ...]` (reference recipes/*/run.py:106-151).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from ..data import DataLoader
from ..parallel.dist import device_specific_seed, initialize_distributed, scale_lr
from .config import toml_load
from .logging_ import init_logging_logger
from .registry import build_optimizer_factory, instantiate


def run(config, resume, modes, ckpt_path=None, extra_trainer_kwargs=None):
    initialize_distributed()
    init_logging_logger(config)

    # Two seeds with distinct jobs (found by the 2-process trainer e2e):
    # - base_seed is PROCESS-IDENTICAL: model/discriminator init (replicated
    #   params are asserted bitwise-equal across processes at device_put;
    #   the reference gets this from DDP's rank-0 broadcast) and the
    #   loader's shuffle permutation (disjoint shard cover requires every
    #   rank to draw the SAME permutation — DistributedSampler semantics).
    # - seed is PER-RANK (reference set_seed(device_specific=True)): for
    #   runtime augmentation RNGs so ranks draw different noise/crops.
    base_seed = config["meta"].get("seed", 0)
    seed = device_specific_seed(base_seed)

    # The freeze-phase reference names its sections [model_g]/[optimizer_g]
    # (run.py builds model_g + model_d); accept both spellings.
    model_cfg = config.get("model") or config["model_g"]
    optim_cfg = config.get("optimizer") or config["optimizer_g"]
    model = instantiate(model_cfg["path"], args={"seed": base_seed} | model_cfg["args"])
    optimizer_factory, base_lr = build_optimizer_factory(optim_cfg["path"], optim_cfg["args"])
    base_lr = scale_lr(base_lr)  # LR x sqrt(world) rule (reference run.py:31)

    loss_function = None
    if "loss_function" in config and config["loss_function"].get("path"):
        loss_function = instantiate(
            config["loss_function"]["path"], args=config["loss_function"].get("args") or {}
        )

    train_dataloader = validate_dataloaders = test_dataloaders = None

    if "train" in modes or "finetune" in modes:
        train_dataset = instantiate(config["train_dataset"]["path"], args=config["train_dataset"]["args"])
        train_dataloader = DataLoader(
            dataset=train_dataset, shuffle=True, seed=base_seed, **config["train_dataset"]["dataloader"]
        )

    if "train" in modes or "finetune" in modes or "validate" in modes:
        val_cfgs = config["validate_dataset"]
        if not isinstance(val_cfgs, list):
            val_cfgs = [val_cfgs]
        validate_dataloaders = [
            DataLoader(dataset=instantiate(c["path"], args=c["args"]), **c.get("dataloader", {}))
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

    trainer_kwargs = dict(
        config=config,
        resume=resume,
        model=model,
        optimizer_factory=optimizer_factory,
        base_lr=base_lr,
        loss_function=loss_function,
    )
    if extra_trainer_kwargs:
        trainer_kwargs.update(extra_trainer_kwargs(config, base_seed))
    trainer = instantiate(config["trainer"]["path"], initialize=False)(**trainer_kwargs)

    # Optional: import reference torch weights (model-zoo checkpoints) before
    # running any mode. Activated by --torch_ckpt / [meta] torch_ckpt.
    torch_ckpt = config["meta"].get("torch_ckpt")
    if torch_ckpt:
        from .convert import import_spiking_fullsubnet, load_torch_state_dict

        sd = load_torch_state_dict(torch_ckpt)
        trainer.params, trainer.model_state = import_spiking_fullsubnet(sd, trainer.model_config)
        trainer._ckpt_preloaded = True

    for flag in modes:
        if flag == "train":
            trainer.train(train_dataloader, validate_dataloaders)
        elif flag == "validate":
            trainer.validate(validate_dataloaders)
        elif flag == "test":
            trainer.test(test_dataloaders, ckpt_path or config["meta"].get("ckpt_path", "best"))
        elif flag == "predict":
            trainer.predict(test_dataloaders, ckpt_path or config["meta"].get("ckpt_path", "best"))
        elif flag == "finetune":
            trainer.finetune(
                train_dataloader, validate_dataloaders, ckpt_path or config["meta"].get("ckpt_path", "best")
            )
        else:
            raise ValueError(f"Unknown mode: {flag}.")
    return trainer


def main(argv=None, recipe_dir=None, extra_trainer_kwargs=None):
    if recipe_dir is not None and str(recipe_dir) not in sys.path:
        sys.path.insert(0, str(recipe_dir))

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
    parser.add_argument(
        "--torch_ckpt",
        type=str,
        default=None,
        help="Import a reference torch checkpoint (pytorch_model.bin) before running.",
    )
    args = parser.parse_args(argv)

    config_path = Path(args.configuration).expanduser().absolute()
    config = toml_load(config_path)
    config["meta"]["exp_id"] = config_path.stem
    config["meta"]["config_path"] = config_path.as_posix()

    if "test" in args.mode and args.ckpt_path is None and args.torch_ckpt is None:
        raise ValueError(
            "checkpoint path is required for test. Use '--ckpt_path' "
            "(best | latest | init | a path)."
        )
    if args.ckpt_path:
        config["meta"]["ckpt_path"] = args.ckpt_path
    if args.torch_ckpt:
        config["meta"]["torch_ckpt"] = args.torch_ckpt

    return run(config, args.resume, args.mode, args.ckpt_path, extra_trainer_kwargs)
