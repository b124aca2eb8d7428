"""Freeze-phase (competition) denoising trainer — the reference's frozen
trainers import modules that no longer exist (SURVEY.md §1); this build
implements the intent with the standard denoise loop."""

from spiking_fullsubnet_tpu.recipes import DenoiseTrainer


class Trainer(DenoiseTrainer):
    pass
