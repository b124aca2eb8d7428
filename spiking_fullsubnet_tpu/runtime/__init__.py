"""Trainer runtime (maps reference layer 4: trainer, config, logging, ckpt)."""

from .config import toml_load, toml_loads, toml_dump
from .registry import instantiate, resolve, build_optimizer_factory
from .optimization import (
    get_constant_schedule_with_warmup,
    get_linear_schedule_with_warmup,
    get_exponential_schedule,
    create_warmup_schedule,
    get_warmup_steps,
)
from .trainer_state import TrainerState
from .logging_ import TensorboardLogger, init_logging_logger
from .checkpoint import CheckpointManager
from .trainer import Trainer
from .convert import (
    load_torch_state_dict,
    import_spiking_fullsubnet,
    save_npz,
)
from .debug import enable_debug_nans, detect_overflow, clamp_inf_value
