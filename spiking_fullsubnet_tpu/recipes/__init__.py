"""Reusable recipe trainer bases (denoise / dereverb / separation).

The reference duplicates ~100-line trainer subclasses per recipe
(SURVEY.md §2b); here the shared logic lives in the framework and each
recipe's trainer.py subclasses (and can override hooks)."""

from .denoise import DenoiseTrainer
from .separation import SeparationTrainer
from .dereverb import DereverbTrainer
from .gan import (
    DualGanDenoiseTrainer,
    GanDenoiseTrainer,
    OnlyGenTrainer,
    build_discriminator_bundles,
)
