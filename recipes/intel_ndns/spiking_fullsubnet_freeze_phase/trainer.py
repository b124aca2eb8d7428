"""Freeze-phase (competition) denoising trainer.

The reference's freeze-phase trainer.py:46-99 is a MetricGAN trainer
(model_g + model_d, DNSMOS-regressing discriminator); its base class
imports a module that no longer exists (SURVEY.md §1). This build
implements the intent: a GAN denoise loop when `[model_d]` is configured,
degrading to the plain denoise loop for discriminator-free configs
(S/M/L/XL evaluation against model-zoo checkpoints)."""

from spiking_fullsubnet_tpu.recipes.gan import GanDenoiseTrainer


class Trainer(GanDenoiseTrainer):
    pass
