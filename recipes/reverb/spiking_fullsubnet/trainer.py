"""REVERB dereverberation recipe trainer (see framework DereverbTrainer)."""

from spiking_fullsubnet_tpu.recipes import DereverbTrainer


class Trainer(DereverbTrainer):
    pass
