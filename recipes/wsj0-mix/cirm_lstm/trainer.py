"""cIRM-LSTM separation trainer (PIT SI-SDR, reference recipes/wsj0-mix/cirm_lstm)."""

from spiking_fullsubnet_tpu.recipes import SeparationTrainer


class Trainer(SeparationTrainer):
    pass
