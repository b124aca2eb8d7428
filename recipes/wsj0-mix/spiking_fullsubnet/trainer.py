"""wsj0-mix separation recipe trainer (PIT SI-SDR; see SeparationTrainer)."""

from spiking_fullsubnet_tpu.recipes import SeparationTrainer


class Trainer(SeparationTrainer):
    pass
