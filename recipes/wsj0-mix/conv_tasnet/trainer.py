"""Conv-TasNet separation trainer (PIT SI-SDR, reference recipes/wsj0-mix/conv_tasnet)."""

from spiking_fullsubnet_tpu.recipes import SeparationTrainer


class Trainer(SeparationTrainer):
    pass
