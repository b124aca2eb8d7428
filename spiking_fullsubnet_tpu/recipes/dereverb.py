"""REVERB dereverberation recipe trainer.

Mirrors reference recipes/reverb/spiking_fullsubnet/trainer.py:
loss = freq_MAE + mag_MAE + time L1 (ibid.:34-37), north star OVRL (DNSMOS);
predict writes enhanced wavs mirroring the input directory tree for
downstream ASR scoring (ibid.:102-115).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from spiking_fullsubnet_tpu.dsp.io import save_wav
from spiking_fullsubnet_tpu.losses import freq_mae, l1_loss, mag_mae
from spiking_fullsubnet_tpu.metrics import SISDR
from spiking_fullsubnet_tpu.runtime import Trainer as BaseTrainer

logger = logging.getLogger(__name__)


class DereverbTrainer(BaseTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.si_sdr = SISDR()
        try:
            from spiking_fullsubnet_tpu.metrics import DNSMOS

            self.dns_mos = DNSMOS(input_sr=self.sr)
            self.north_star_metric = "OVRL"
        except ImportError:
            self.dns_mos = None
            self.north_star_metric = "si_sdr"
            logger.warning("onnxruntime unavailable — falling back to si_sdr north star.")

        cfg, apply_fn = self.model_config, self.model_apply
        self._eval_forward = jax.jit(
            lambda params, state, mix: apply_fn(cfg, params, state, mix, train=False)["enhanced_y"]
        )

    def training_step_fn(self, params, model_state, batch):
        mix_y, ref_y = batch[0], batch[1]
        out = self.model_apply(self.model_config, params, model_state, mix_y, train=True)
        est_y = out["enhanced_y"]
        loss_freq_mae = freq_mae(est_y, ref_y)
        loss_mag_mae = mag_mae(est_y, ref_y)
        loss_time_mae = l1_loss(est_y, ref_y)
        loss = loss_freq_mae + loss_mag_mae + loss_time_mae
        return loss, {
            "loss": loss,
            "loss_freq_mae": loss_freq_mae,
            "loss_mag_mae": loss_mag_mae,
            "loss_time_mae": loss_time_mae,
        }, out["state"]

    def validation_step(self, batch, batch_idx, dataloader_idx=0):
        mix_y, ref_y = batch[0], batch[1]
        est_dev = self._eval_forward(self.params, self.model_state, mix_y)
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
        return self.validation_epoch_end(outputs, log_to_tensorboard=False)

    def predict_step(self, batch, batch_idx, dataloader_idx=0):
        """Write enhanced wavs, mirroring the input tree under enhanced_dir
        (reference keeps the REVERB relative layout for Kaldi ASR scoring)."""
        mix_y = batch[0]
        paths = batch[-1] if isinstance(batch[-1], list) else [f"b{batch_idx}_{i}.wav" for i in range(len(mix_y))]
        mix_root = self.config.get("predict", {}).get("mix_root")
        est_y = np.asarray(self._eval_forward(self.params, self.model_state, mix_y))
        for i in range(est_y.shape[0]):
            p = Path(str(paths[i]))
            if mix_root and str(p).startswith(str(mix_root)):
                rel = p.relative_to(mix_root)
            else:
                rel = Path(p.name)
            out_path = self.enhanced_dir / f"dataloader_{dataloader_idx}" / rel
            out_path.parent.mkdir(parents=True, exist_ok=True)
            save_wav(est_y[i], out_path, self.sr)
