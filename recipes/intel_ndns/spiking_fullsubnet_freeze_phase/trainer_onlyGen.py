"""Generator-only ablation trainer (see framework OnlyGenTrainer).

Mirrors reference freeze-phase trainer_onlyGen.py:41-65:
loss = freq_MAE + mag_MAE (adversarial terms disabled).
"""

from spiking_fullsubnet_tpu.recipes.gan import OnlyGenTrainer


class Trainer(OnlyGenTrainer):
    pass
