"""Intel N-DNS denoising recipe trainer.

Mirrors reference recipes/intel_ndns/spiking_fullsubnet/trainer.py:
loss = freq_MAE + mag_MAE + 0.001*(100 - SISNR) (ibid.:33-37), validation
metrics SI-SDR (+ DNSMOS when onnxruntime is available), north star si_sdr.
The training step here is a pure jitted function; validation runs the jitted
eval forward and host-side metrics.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from spiking_fullsubnet_tpu.losses import freq_mae, mag_mae, si_snr
from spiking_fullsubnet_tpu.metrics import SISDR, STOI, compute_neuronops, synops_device
from spiking_fullsubnet_tpu.runtime import Trainer as BaseTrainer
from spiking_fullsubnet_tpu.parallel.dist import is_main_process

logger = logging.getLogger(__name__)


class DenoiseTrainer(BaseTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.si_sdr = SISDR()
        self.stoi = STOI(sr=self.sr)
        try:
            from spiking_fullsubnet_tpu.metrics import DNSMOS

            self.dns_mos = DNSMOS(input_sr=self.sr)
        except ImportError:
            self.dns_mos = None
            logger.warning("onnxruntime unavailable — DNSMOS disabled for validation.")
        self.north_star_metric = "si_sdr"

        cfg, apply_fn = self.model_config, self.model_apply
        shared = bool(getattr(cfg, "shared_weights", True)) if cfg is not None else True

        def eval_forward(params, state, noisy):
            out = apply_fn(cfg, params, state, noisy, train=False)
            enh = out["enhanced_y"]
            if "fb_all_layer_outputs" in out:
                # neuromorphic cost proxies reduce on device (leaderboard
                # power_proxy/PDP columns; reference dualGAN trainer:117-137)
                synops = synops_device(
                    out["fb_all_layer_outputs"], out["sb_all_layer_outputs"], shared
                )
                neuronops = jnp.float32(
                    compute_neuronops(out["fb_all_layer_outputs"], out["sb_all_layer_outputs"])
                )
                return enh, synops, neuronops
            return enh, None, None

        self._eval_forward = jax.jit(eval_forward)

    # pure jitted training step
    def training_step_fn(self, params, model_state, batch):
        noisy_y, clean_y = batch[0], batch[1]
        out = self.model_apply(self.model_config, params, model_state, noisy_y, train=True)
        enhanced_y = out["enhanced_y"]
        loss_freq_mae = freq_mae(enhanced_y, clean_y)
        loss_mag_mae = mag_mae(enhanced_y, clean_y)
        loss_sdr = si_snr(enhanced_y, clean_y)
        loss_sdr_norm = 0.001 * (100.0 - loss_sdr)
        loss = loss_freq_mae + loss_mag_mae + loss_sdr_norm
        loss_dict = {
            "loss": loss,
            "loss_freq_mae": loss_freq_mae,
            "loss_mag_mae": loss_mag_mae,
            "loss_sdr": loss_sdr,
            "loss_sdr_norm": loss_sdr_norm,
        }
        return loss, loss_dict, out["state"]

    def enhance(self, noisy_np: np.ndarray) -> np.ndarray:
        """Enhance a [B, T] batch with the current weights (eval mode)."""
        return np.asarray(self._eval_forward(self.params, self.model_state, noisy_np)[0])

    def validation_step(self, batch, batch_idx, dataloader_idx=0):
        mix_y, ref_y = batch[0], batch[1]
        # jit dispatch is async: the device starts on this batch while the
        # host thread pool is still scoring earlier batches (the base trainer
        # resolves the returned Future, keeping at most `metric_inflight`
        # outstanding — see runtime/trainer.py validate()).
        est_y, synops, neuronops = self._eval_forward(self.params, self.model_state, mix_y)
        ref_np = np.asarray(ref_y)

        def score_on_host():
            est = np.asarray(est_y)  # blocks on the device inside the worker
            outs = []
            for i in range(est.shape[0]):
                row = self.si_sdr(est[i], ref_np[i])
                if self.dns_mos is not None:
                    row = row | self.dns_mos(est[i])
                if synops is not None:
                    # per-batch cost proxies, repeated per utterance (reference
                    # freeze trainer validation_step:117-137 does the same)
                    row = row | {"synops": float(synops), "neuron_ops": float(neuronops)}
                outs.append(row)
            return outs

        return self.metric_pool.submit(score_on_host)

    # host-side metric scoring overlaps the device forward via the base
    # trainer's shared metric_pool (runtime/trainer.py)

    def validation_epoch_end(self, outputs, log_to_tensorboard=True):
        """pandas mean + CSV + TB (reference recipe trainer.py:68-99)."""
        score = 0.0
        for dataloader_idx, dataloader_outputs in enumerate(outputs):
            rows = []
            for step_out in dataloader_outputs:
                rows.extend(step_out)
            df_metrics = pd.DataFrame(rows)
            df_mean = df_metrics.mean(numeric_only=True)
            time_now = self._get_time_now()
            epoch = self.state.epochs_trained
            df_metrics.to_csv(
                self.metrics_dir / f"dl_{dataloader_idx}_epoch_{epoch}_{time_now}.csv", index=False
            )
            df_mean.to_frame().T.to_csv(
                self.metrics_dir / f"dl_{dataloader_idx}_epoch_{epoch}_{time_now}_mean.csv", index=False
            )
            logger.info(f"\n{df_mean.to_frame().T.to_markdown()}")
            score += df_mean[self.north_star_metric]
            if log_to_tensorboard:
                for metric, value in df_mean.items():
                    self.writer.add_scalar(f"metrics_{dataloader_idx}/{metric}", value, epoch)
        return score

    def test_step(self, batch, batch_idx, dataloader_idx=0):
        return self.validation_step(batch, batch_idx, dataloader_idx)

    def test_epoch_end(self, outputs):
        return self.validation_epoch_end(outputs, log_to_tensorboard=False)

    def predict_step(self, batch, batch_idx, dataloader_idx=0):
        from spiking_fullsubnet_tpu.dsp.io import save_wav

        mix_y = batch[0]
        names = batch[-1] if isinstance(batch[-1], list) else [f"b{batch_idx}_{i}" for i in range(len(mix_y))]
        est_y = self.enhance(mix_y)
        out_dir = self.enhanced_dir / f"dataloader_{dataloader_idx}"
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(est_y.shape[0]):
            stem = str(names[i]).split("/")[-1]
            save_wav(est_y[i], out_dir / stem, self.sr)
