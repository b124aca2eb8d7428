"""MetricGAN-style trainer for Intel N-DNS (see framework GanDenoiseTrainer).

Mirrors reference recipes/intel_ndns/spiking_fullsubnet/trainer_GAN.py:
- generator loss = freq_MAE + mag_MAE + 0.05*MSE(D(clean, enh), 1)
  + 0.001*(100 - SISNR)                                     (ibid.:110-129)
- discriminator regresses D(clean, clean) -> 1 and
  D(clean, enh.detach()) -> normalized DNSMOS (x-1)/4       (ibid.:131-143)
"""

from spiking_fullsubnet_tpu.recipes.gan import GanDenoiseTrainer


class Trainer(GanDenoiseTrainer):
    pass
