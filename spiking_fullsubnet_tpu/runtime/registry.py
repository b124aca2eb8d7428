"""Dynamic instantiation from dotted paths (reference audiozen/utils.py:75-130).

Every pluggable component in the TOML config is a {path, args} pair. Paths
resolve against installed packages and, like the reference, against modules
in the current working directory (recipe-local `dataloader.DNSAudio` etc.).

torch.optim paths are transparently mapped onto optax factories so reference
experiment TOMLs run unmodified on the JAX runtime.
"""

from __future__ import annotations

import importlib
import sys
from typing import Any, Callable, Dict, Optional

import optax


def _optax_adamw(lr_or_schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **_):
    return optax.adamw(lr_or_schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _optax_adam(lr_or_schedule, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adam(lr_or_schedule, b1=betas[0], b2=betas[1], eps=eps)


def _optax_sgd(lr_or_schedule, momentum=0.0, **_):
    return optax.sgd(lr_or_schedule, momentum=momentum)


# Optimizer factories: called as f(schedule_or_lr, **toml_args_minus_lr).
OPTIMIZER_ALIASES: Dict[str, Callable] = {
    "torch.optim.AdamW": _optax_adamw,
    "torch.optim.Adam": _optax_adam,
    "torch.optim.SGD": _optax_sgd,
    "optax.adamw": _optax_adamw,
    "optax.adam": _optax_adam,
    "optax.sgd": _optax_sgd,
}

# Loss-function aliases for reference TOML compatibility.
LOSS_ALIASES: Dict[str, str] = {
    "torch.nn.MSELoss": "spiking_fullsubnet_tpu.losses.mse_loss",
    "torch.nn.L1Loss": "spiking_fullsubnet_tpu.losses.l1_loss",
    "audiozen.loss.SISNRLoss": "spiking_fullsubnet_tpu.losses.si_snr_loss",
}


def resolve(path: str):
    """Import `pkg.module.Attr` — also from CWD modules, like the reference."""
    if "" not in sys.path and "." not in sys.path:
        sys.path.insert(0, "")
    module_path, _, attr = path.rpartition(".")
    if not module_path:
        raise ImportError(f"Cannot resolve bare name {path!r}")
    module = importlib.import_module(module_path)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise ImportError(f"Module {module_path!r} has no attribute {attr!r}") from e


def instantiate(path: str, args: Optional[Dict[str, Any]] = None, initialize: bool = True):
    """Reference-compatible instantiate (utils.py:75-130)."""
    if path in LOSS_ALIASES:
        path = LOSS_ALIASES[path]
    obj = resolve(path)
    if initialize:
        return obj(**(args or {}))
    return obj


def build_optimizer_factory(path: str, args: Dict[str, Any]):
    """Returns (factory(schedule) -> optax.GradientTransformation, base_lr).

    The trainer injects the LR schedule at train() time (warmup needs
    max_steps), mirroring create_schedulers (trainer.py:270-291).
    """
    args = dict(args or {})
    lr = args.pop("lr", args.pop("learning_rate", 1e-3))
    if path in OPTIMIZER_ALIASES:
        f = OPTIMIZER_ALIASES[path]
    else:
        f = resolve(path)

    def factory(schedule):
        return f(schedule, **args)

    return factory, lr
