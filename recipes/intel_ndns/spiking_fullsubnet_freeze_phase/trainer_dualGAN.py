"""Dual-discriminator MetricGAN trainer (see framework DualGanDenoiseTrainer).

Mirrors reference freeze-phase trainer_dualGAN.py:50-110: generator loss =
freq_MAE + mag_MAE + 0.001*(100-SISNR) + 1.0*MSE(D_sig(clean,enh),1)
+ 0.5*MSE(D_bak(clean,enh),1); D_sig regresses normalized DNSMOS SIG,
D_bak normalized BAK.
"""

from spiking_fullsubnet_tpu.recipes.gan import DualGanDenoiseTrainer


class Trainer(DualGanDenoiseTrainer):
    pass
