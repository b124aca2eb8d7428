"""wsj0-mix 2-speaker separation recipe trainer (PIT SI-SDR).

Mirrors reference recipes/wsj0-mix/spiking_fullsubnet/trainer.py: PIT loss
(ibid.:33), metrics after best-permutation reorder (:45-57), north star si_sdr.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
import pandas as pd

from spiking_fullsubnet_tpu.losses import pairwise_neg_sisdr, pit_wrapper
from spiking_fullsubnet_tpu.metrics import SISDR
from spiking_fullsubnet_tpu.runtime import Trainer as BaseTrainer

logger = logging.getLogger(__name__)


class SeparationTrainer(BaseTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.si_sdr = SISDR()
        try:
            from spiking_fullsubnet_tpu.metrics import DNSMOS

            self.dns_mos = DNSMOS(input_sr=self.sr)
        except ImportError:
            self.dns_mos = None
        self.north_star_metric = "si_sdr"

        cfg, apply_fn = self.model_config, self.model_apply
        self._eval_forward = jax.jit(
            lambda params, state, mix: apply_fn(cfg, params, state, mix, train=False)["enhanced_y"]
        )

    def training_step_fn(self, params, model_state, batch):
        mix_y, ref_y = batch[0], batch[1]
        out = self.model_apply(self.model_config, params, model_state, mix_y, train=True)
        loss, _ = pit_wrapper(pairwise_neg_sisdr, out["enhanced_y"], ref_y)
        return loss, {"loss": loss}, out["state"]

    def validation_step(self, batch, batch_idx, dataloader_idx=0):
        mix_y, ref_y = batch[0], batch[1]
        est_raw = self._eval_forward(self.params, self.model_state, mix_y)
        import jax.numpy as jnp

        _, est_dev = pit_wrapper(pairwise_neg_sisdr, est_raw, jnp.asarray(ref_y))
        ref_np = np.asarray(ref_y)

        # host scoring overlaps the device forward of later batches (the
        # base trainer resolves the Future — runtime/trainer.py validate())
        def score_on_host():
            est_y = np.asarray(est_dev)
            outs = []
            for i in range(est_y.shape[0]):
                row = self.si_sdr(est_y[i], ref_np[i])
                if self.dns_mos is not None:
                    row = row | self.dns_mos(est_y[i])
                outs.append(row)
            return outs

        return self.metric_pool.submit(score_on_host)

    def validation_epoch_end(self, outputs, log_to_tensorboard=True):
        score = 0.0
        for dataloader_idx, dataloader_outputs in enumerate(outputs):
            rows = []
            for step_out in dataloader_outputs:
                rows.extend(step_out)
            df = pd.DataFrame(rows)
            mean = df.mean(numeric_only=True)
            time_now = self._get_time_now()
            epoch = self.state.epochs_trained
            df.to_csv(self.metrics_dir / f"dl_{dataloader_idx}_epoch_{epoch}_{time_now}.csv", index=False)
            mean.to_frame().T.to_csv(
                self.metrics_dir / f"dl_{dataloader_idx}_epoch_{epoch}_{time_now}_mean.csv", index=False
            )
            logger.info(f"\n{mean.to_frame().T.to_markdown()}")
            score += mean[self.north_star_metric]
            if log_to_tensorboard:
                for metric, value in mean.items():
                    self.writer.add_scalar(f"metrics_{dataloader_idx}/{metric}", value, epoch)
        return score

    def test_step(self, *args, **kwargs):
        return self.validation_step(*args, **kwargs)

    def test_epoch_end(self, outputs):
        return self.validation_epoch_end(outputs)
