"""cIRM-GSN denoising trainer (reference recipes/intel_ndns/cirm_gsn/trainer.py
uses the same pattern as the spiking_fullsubnet recipe)."""

from spiking_fullsubnet_tpu.recipes import DenoiseTrainer


class Trainer(DenoiseTrainer):
    pass
