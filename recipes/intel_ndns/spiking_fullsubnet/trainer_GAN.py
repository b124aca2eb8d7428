"""MetricGAN-style trainer for Intel N-DNS.

Mirrors reference recipes/intel_ndns/spiking_fullsubnet/trainer_GAN.py:
- generator loss = freq_MAE + mag_MAE + 0.05*MSE(D(clean, enh), 1)
  + 0.001*(100 - SISNR)                                     (ibid.:110-129)
- discriminator regresses D(clean, clean) -> 1 and
  D(clean, enh.detach()) -> normalized DNSMOS (x-1)/4       (ibid.:131-143)

TPU structure: two jitted steps (G update, D update) with the host-side
DNSMOS scoring of the enhanced batch between them — the same host hop the
reference takes (DNSMOS is an ONNX CPU model). When onnxruntime is absent
the MOS target degrades to a clamped SI-SDR proxy (documented deviation).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spiking_fullsubnet_tpu.losses import freq_mae, mag_mae, mse_loss, si_snr
from spiking_fullsubnet_tpu.metrics import si_sdr_value
from spiking_fullsubnet_tpu.models.discriminator import discriminator_apply
from spiking_fullsubnet_tpu.runtime.optimization import create_warmup_schedule, get_warmup_steps

from trainer import Trainer as PlainTrainer

logger = logging.getLogger(__name__)


class Trainer(PlainTrainer):
    def __init__(self, *args, discriminator=None, **kwargs):
        super().__init__(*args, **kwargs)
        assert discriminator is not None, "GAN trainer needs a discriminator bundle"
        self.disc_params = discriminator["params"]
        self.disc_opt_state = None

    # ---- checkpoint pytree includes the discriminator ----
    def _train_pytree(self):
        tree = super()._train_pytree()
        tree["disc_params"] = self.disc_params
        if self.disc_opt_state is not None:
            tree["disc_opt_state"] = self.disc_opt_state
        return tree

    def _load_checkpoint(self, ckpt_path):
        restored = self.ckpt_manager.load(ckpt_path, self._train_pytree(), self.state)
        self.params = restored["params"]
        self.model_state = restored["model_state"]
        if self.opt_state is not None:
            self.opt_state = restored["opt_state"]
        self.disc_params = restored["disc_params"]
        if "disc_opt_state" in restored:
            self.disc_opt_state = restored["disc_opt_state"]
        self._place_replicated()
        logger.info(f"Checkpoint on epoch {self.state.epochs_trained} is loaded.")

    def _build_optimizer(self, max_steps: int):
        super()._build_optimizer(max_steps)
        num_warmup = get_warmup_steps(self.warmup_steps, max_steps, self.warmup_ratio)
        schedule = create_warmup_schedule(self.scheduler_name, self.base_lr, max_steps, num_warmup)
        self.disc_tx = optax.adamw(schedule)
        if self.disc_opt_state is None:
            self.disc_opt_state = self.disc_tx.init(self.disc_params)
        self._build_gan_steps()

    def _build_gan_steps(self):
        cfg, apply_fn = self.model_config, self.model_apply

        def g_step(params, model_state, opt_state, disc_params, noisy_y, clean_y):
            clean_mag = jnp.abs(self.stft(clean_y, output_type="complex"))

            def loss_fn(p):
                out = apply_fn(cfg, p, model_state, noisy_y, train=True)
                enh_y, enh_mag = out["enhanced_y"], out["enhanced_mag"]
                pred_fake, _ = discriminator_apply(disc_params, clean_mag, enh_mag, train=False)
                loss_g_fake = 0.05 * mse_loss(pred_fake, jnp.ones_like(pred_fake))
                loss_freq = freq_mae(enh_y, clean_y)
                loss_mag = mag_mae(enh_y, clean_y)
                loss_sdr = 0.001 * (100.0 - si_snr(enh_y, clean_y))
                loss = loss_freq + loss_mag + loss_g_fake + loss_sdr
                aux = {
                    "loss_g": loss,
                    "loss_freq_mae": loss_freq,
                    "loss_mag_mae": loss_mag,
                    "loss_sdr": loss_sdr,
                    "loss_g_fake": loss_g_fake,
                }
                return loss, (aux, out["state"], enh_y, enh_mag, clean_mag)

            (loss, (aux, new_state, enh_y, enh_mag, clean_mag)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grad_norm = optax.global_norm(grads)
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, new_opt, aux, grad_norm, enh_y, enh_mag, clean_mag

        def d_step(disc_params, disc_opt, clean_mag, enh_mag, mos_score):
            def loss_fn(dp):
                pred_real, dp2 = discriminator_apply(dp, clean_mag, clean_mag, train=True)
                pred_fake, dp2 = discriminator_apply(dp2, clean_mag, enh_mag, train=True)
                loss_d_real = mse_loss(pred_real, jnp.ones_like(pred_real))
                loss_d_fake = mse_loss(pred_fake, mos_score)
                loss = loss_d_real + loss_d_fake
                return loss, (loss_d_real, loss_d_fake, dp2)

            (loss_d, (ldr, ldf, dp2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(disc_params)
            updates, new_opt = self.disc_tx.update(grads, disc_opt, disc_params)
            new_dp = optax.apply_updates(disc_params, updates)
            # carry over the power-iteration buffer updates (u, v)
            for path in (["fc1"], ["fc2"]):
                new_dp[path[0]]["u"] = dp2[path[0]]["u"]
                new_dp[path[0]]["v"] = dp2[path[0]]["v"]
            for i in range(len(new_dp["convs"])):
                new_dp["convs"][i]["u"] = dp2["convs"][i]["u"]
                new_dp["convs"][i]["v"] = dp2["convs"][i]["v"]
            return new_dp, new_opt, {"loss_d": loss_d, "loss_d_real": ldr, "loss_d_fake": ldf}

        self._g_step = jax.jit(g_step, donate_argnums=(0, 1, 2))
        self._d_step = jax.jit(d_step, donate_argnums=(0, 1))

    def batch_mos(self, enh_np: np.ndarray, clean_np: np.ndarray) -> np.ndarray:
        """Normalized quality score per utterance (trainer_GAN.py:81-97)."""
        scores = []
        for i in range(enh_np.shape[0]):
            if self.dns_mos is not None:
                s = self.dns_mos(enh_np[i], return_p808=False)["OVRL"]
                scores.append((s - 1.0) / 4.0)
            else:
                # fallback proxy: clamp SI-SDR dB into [0, 1]
                s = si_sdr_value(enh_np[i], clean_np[i])
                scores.append(float(np.clip((s + 10.0) / 40.0, 0.0, 1.0)))
        return np.asarray(scores, np.float32)[:, None]

    def train(self, train_dataloader, validation_dataloaders):
        """Epoch loop with the dual G/D update (reference trainer_GAN)."""
        early_stop_mark = 0.0
        steps_per_epoch = len(train_dataloader)
        max_steps = (self.max_epochs * steps_per_epoch) if self.max_steps <= 0 else self.max_steps
        max_epochs = self.max_epochs if self.max_steps <= 0 else -(-self.max_steps // steps_per_epoch)

        self._build_optimizer(max_steps)
        if self.resume:
            self._load_checkpoint("latest")
        self._place_replicated()

        from spiking_fullsubnet_tpu.parallel.dist import is_main_process, reduce_scalar_sum, wait_for_everyone

        for epoch in range(self.state.epochs_trained + 1, max_epochs + 1):
            logger.info(f"{'=' * 9} Epoch {epoch} out of {max_epochs} {'=' * 9}")
            training_epoch_output = []
            for batch in train_dataloader:
                arrays = self._place_batch(batch)
                noisy_y, clean_y = arrays[0], arrays[1]
                (
                    self.params,
                    self.model_state,
                    self.opt_state,
                    aux_g,
                    grad_norm,
                    enh_y,
                    enh_mag,
                    clean_mag,
                ) = self._g_step(self.params, self.model_state, self.opt_state, self.disc_params, noisy_y, clean_y)

                mos = self.batch_mos(np.asarray(enh_y), np.asarray(clean_y))
                self.disc_params, self.disc_opt_state, aux_d = self._d_step(
                    self.disc_params, self.disc_opt_state, clean_mag, enh_mag, jnp.asarray(mos)
                )

                loss_dict = {k: float(v) for k, v in (aux_g | aux_d).items()}
                training_epoch_output.append(loss_dict)
                self._log_step(loss_dict, grad_norm)
                self.state.steps_trained += 1

            self.state.epochs_trained += 1
            self.training_epoch_end(training_epoch_output)

            if epoch % self.save_ckpt_interval == 0:
                self._save_checkpoint(epoch, is_best_epoch=False)
            if epoch % self.validation_interval == 0:
                score = self.validate(validation_dataloaders)
                if is_main_process() and self._run_early_stop_check(score):
                    early_stop_mark += 1
            if hasattr(train_dataloader, "set_epoch"):
                train_dataloader.set_epoch(epoch)
            wait_for_everyone()
            if reduce_scalar_sum(early_stop_mark) != 0:
                break
