"""MetricGAN trainer family: single-D, dual-D (SIG/BAK), and generator-only.

Reference behaviors reproduced:
- recipes/intel_ndns/spiking_fullsubnet/trainer_GAN.py:110-143 (single D):
  loss_g = freq_MAE + mag_MAE + 0.05*MSE(D(clean,enh),1) + 0.001*(100-SISNR);
  D regresses (clean,clean)->1 and (clean,enh.detach())->normalized DNSMOS
  OVRL score (x-1)/4.
- recipes/intel_ndns/spiking_fullsubnet_freeze_phase/trainer_dualGAN.py:50-110:
  two discriminators; generator adds 1.0*MSE(D_sig,1) + 0.5*MSE(D_bak,1);
  D_sig regresses normalized DNSMOS SIG, D_bak normalized BAK.
- recipes/intel_ndns/spiking_fullsubnet_freeze_phase/trainer_onlyGen.py:41-90:
  generator-only training, loss = freq_MAE + mag_MAE.

TPU structure: one jitted generator step and ONE shared jitted discriminator
step reused for every discriminator (identical pytree structure -> one XLA
executable). The DNSMOS target scoring runs on host between the two device
steps — the same host hop the reference takes (DNSMOS is an ONNX CPU model).
When onnxruntime is unavailable the MOS target degrades to a clamped SI-SDR
proxy (documented deviation; hermetic CI has no ONNX runtime).

When no discriminator is configured, `GanDenoiseTrainer` degrades to the
plain denoise loop (the freeze-phase trainer surface accepts both).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import freq_mae, mag_mae, mse_loss, si_snr
from ..metrics import si_sdr_value
from ..models.discriminator import discriminator_apply
from ..models.discriminator import build as build_discriminator
from ..parallel.dist import is_main_process, reduce_scalar_sum, wait_for_everyone
from ..parallel.mesh import replicated_sharding
from ..runtime.optimization import create_warmup_schedule, get_exponential_schedule, get_warmup_steps
from .denoise import DenoiseTrainer

logger = logging.getLogger(__name__)


def build_discriminator_bundles(config, seed):
    """Build {name: bundle} for every `[model_d*]` section in the TOML.

    Mirrors the reference's run.py which instantiates model_d
    (freeze run.py) or model_d_sig/model_d_bak (run_dualGAN.py:40-57).
    Returns {} when the config has no discriminator section, letting the
    same CLI serve plain and GAN configs.
    """
    bundles = {}
    for i, key in enumerate(k for k in config if k == "model_d" or k.startswith("model_d_")):
        args = config[key].get("args") or {}
        name = "d" if key == "model_d" else key[len("model_") :]
        bundles[name] = build_discriminator(seed=seed + 1 + i, **args)
    return {"discriminators": bundles} if bundles else {}


class GanDenoiseTrainer(DenoiseTrainer):
    """Denoise trainer with 0..N MetricGAN discriminators.

    disc_specs: tuple of (name, DNSMOS target key, generator-loss weight).
    """

    disc_specs = (("d", "OVRL", 0.05),)
    include_sdr_loss = True

    def __init__(self, *args, discriminator=None, discriminators=None, **kwargs):
        super().__init__(*args, **kwargs)
        if discriminators is None:
            discriminators = {}
        if discriminator is not None:  # single-bundle convenience kwarg
            discriminators = {self.disc_specs[0][0]: discriminator}
        self.disc_params = {name: b["params"] for name, b in discriminators.items()}
        if self.disc_params:
            missing = [s[0] for s in self.disc_specs if s[0] not in self.disc_params]
            assert not missing, f"disc_specs expect discriminators {missing}; got {list(self.disc_params)}"
        self.disc_opt_states = None
        self._steps_per_epoch = None

    @property
    def gan_enabled(self):
        return bool(self.disc_params)

    # ---- checkpoint pytree includes every discriminator ----
    def _train_pytree(self):
        tree = super()._train_pytree()
        if self.gan_enabled:
            tree["disc_params"] = self.disc_params
            if self.disc_opt_states is not None:
                tree["disc_opt_states"] = self.disc_opt_states
        return tree

    def _load_checkpoint(self, ckpt_path):
        restored = self.ckpt_manager.load(ckpt_path, self._train_pytree(), self.state)
        self.params = restored["params"]
        self.model_state = restored["model_state"]
        if self.opt_state is not None:
            self.opt_state = restored["opt_state"]
        if self.gan_enabled:
            self.disc_params = restored["disc_params"]
            if "disc_opt_states" in restored:
                self.disc_opt_states = restored["disc_opt_states"]
        self._place_replicated()
        logger.info(f"Checkpoint on epoch {self.state.epochs_trained} is loaded.")

    def _place_replicated(self):
        super()._place_replicated()
        if self.mesh is not None and self.gan_enabled:
            rs = replicated_sharding(self.mesh)
            self.disc_params = jax.device_put(self.disc_params, rs)
            if self.disc_opt_states is not None:
                self.disc_opt_states = jax.device_put(self.disc_opt_states, rs)

    # ---- optimizers -----------------------------------------------------
    def _disc_schedule(self, name, max_steps):
        """Per-discriminator LR schedule from `[optimizer_<name>]` /
        `[lr_scheduler_<name>]` TOML sections (reference freeze run.py builds
        AdamW + ExponentialLR per model; run_dualGAN.py:59-92)."""
        opt_cfg = self.config.get(f"optimizer_{name}", {}).get("args", {}) or {}
        lr = float(opt_cfg.get("lr", self.base_lr))
        sched_cfg = self.config.get(f"lr_scheduler_{name}", {}).get("args", {}) or {}
        gamma = sched_cfg.get("gamma")
        if gamma is not None and self._steps_per_epoch:
            # torch ExponentialLR steps once per epoch
            return get_exponential_schedule(lr, float(gamma), self._steps_per_epoch)
        num_warmup = get_warmup_steps(self.warmup_steps, max_steps, self.warmup_ratio)
        return create_warmup_schedule(self.scheduler_name, lr, max_steps, num_warmup)

    def _generator_schedule(self, max_steps: int):
        """`[lr_scheduler_g] gamma` selects torch-ExponentialLR semantics for
        the generator (freeze-phase run.py builds ExponentialLR for model_g)."""
        sched_cfg = self.config.get("lr_scheduler_g", {}).get("args", {}) or {}
        gamma = sched_cfg.get("gamma")
        if self.gan_enabled and gamma is not None and self._steps_per_epoch:
            return get_exponential_schedule(self.base_lr, float(gamma), self._steps_per_epoch)
        return super()._generator_schedule(max_steps)

    def _build_optimizer(self, max_steps: int):
        super()._build_optimizer(max_steps)
        if not self.gan_enabled:
            return
        self.disc_txs = {
            name: optax.adamw(self._disc_schedule(name, max_steps)) for name in self.disc_params
        }
        if self.disc_opt_states is None:
            self.disc_opt_states = {
                name: self.disc_txs[name].init(p) for name, p in self.disc_params.items()
            }
        self._build_gan_steps()

    # ---- jitted steps ----------------------------------------------------
    def _build_gan_steps(self):
        cfg, apply_fn = self.model_config, self.model_apply
        names = [s[0] for s in self.disc_specs]
        weights = {s[0]: s[2] for s in self.disc_specs}

        def g_step(params, model_state, opt_state, disc_params, noisy_y, clean_y):
            clean_mag = jnp.abs(self.stft(clean_y, output_type="complex"))

            def loss_fn(p):
                out = apply_fn(cfg, p, model_state, noisy_y, train=True)
                enh_y, enh_mag = out["enhanced_y"], out["enhanced_mag"]
                loss_freq = freq_mae(enh_y, clean_y)
                loss_mag = mag_mae(enh_y, clean_y)
                loss = loss_freq + loss_mag
                aux = {"loss_freq_mae": loss_freq, "loss_mag_mae": loss_mag}
                if self.include_sdr_loss:
                    loss_sdr = 0.001 * (100.0 - si_snr(enh_y, clean_y))
                    loss = loss + loss_sdr
                    aux["loss_sdr"] = loss_sdr
                for name in names:
                    pred_fake, _ = discriminator_apply(disc_params[name], clean_mag, enh_mag, train=False)
                    l_fake = weights[name] * mse_loss(pred_fake, jnp.ones_like(pred_fake))
                    loss = loss + l_fake
                    aux[f"loss_g_fake_{name}"] = l_fake
                aux["loss_g"] = loss
                return loss, (aux, out["state"], enh_y, enh_mag, clean_mag)

            (loss, (aux, new_state, enh_y, enh_mag, clean_mag)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grad_norm = optax.global_norm(grads)
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, new_opt, aux, grad_norm, enh_y, enh_mag, clean_mag

        def d_step(disc_params, disc_opt, tx, clean_mag, enh_mag, mos_score):
            def loss_fn(dp):
                pred_real, dp2 = discriminator_apply(dp, clean_mag, clean_mag, train=True)
                pred_fake, dp2 = discriminator_apply(dp2, clean_mag, enh_mag, train=True)
                loss_d_real = mse_loss(pred_real, jnp.ones_like(pred_real))
                loss_d_fake = mse_loss(pred_fake, mos_score)
                return loss_d_real + loss_d_fake, (loss_d_real, loss_d_fake, dp2)

            (loss_d, (ldr, ldf, dp2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(disc_params)
            updates, new_opt = tx.update(grads, disc_opt, disc_params)
            new_dp = optax.apply_updates(disc_params, updates)
            # carry over the spectral-norm power-iteration buffers (u, v)
            for key in ("fc1", "fc2"):
                new_dp[key]["u"] = dp2[key]["u"]
                new_dp[key]["v"] = dp2[key]["v"]
            for i in range(len(new_dp["convs"])):
                new_dp["convs"][i]["u"] = dp2["convs"][i]["u"]
                new_dp["convs"][i]["v"] = dp2["convs"][i]["v"]
            return new_dp, new_opt, {"loss_d": loss_d, "loss_d_real": ldr, "loss_d_fake": ldf}

        self._g_step = jax.jit(g_step, donate_argnums=(0, 1, 2))
        # one executable shared by all discriminators (same pytree structure)
        self._d_step = jax.jit(d_step, static_argnums=(2,), donate_argnums=(0, 1))

    # ---- host-side MOS targets -------------------------------------------
    def batch_mos(self, enh_np: np.ndarray, clean_np: np.ndarray, targets) -> dict:
        """Normalized per-utterance quality targets, one column per DNSMOS
        key (trainer_GAN.py:81-97; dualGAN batch_dns_mos :26-48)."""
        cols = {t: [] for t in targets}
        for i in range(enh_np.shape[0]):
            if self.dns_mos is not None:
                scores = self.dns_mos(enh_np[i], return_p808=False)
                for t in targets:
                    cols[t].append((scores[t] - 1.0) / 4.0)
            else:
                # fallback proxy: clamp SI-SDR dB into [0, 1]
                s = si_sdr_value(enh_np[i], clean_np[i])
                v = float(np.clip((s + 10.0) / 40.0, 0.0, 1.0))
                for t in targets:
                    cols[t].append(v)
        return {t: np.asarray(v, np.float32)[:, None] for t, v in cols.items()}

    # ---- train loop --------------------------------------------------------
    def train(self, train_dataloader, validation_dataloaders):
        if not self.gan_enabled:
            return super().train(train_dataloader, validation_dataloaders)

        early_stop_mark = 0.0
        steps_per_epoch = len(train_dataloader)
        self._steps_per_epoch = steps_per_epoch
        max_steps = (self.max_epochs * steps_per_epoch) if self.max_steps <= 0 else self.max_steps
        max_epochs = self.max_epochs if self.max_steps <= 0 else -(-self.max_steps // steps_per_epoch)

        self._build_optimizer(max_steps)
        if self.resume:
            self._load_checkpoint("latest")
        self._place_replicated()

        targets = [s[1] for s in self.disc_specs]
        target_of = {s[0]: s[1] for s in self.disc_specs}

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
                ) = self._g_step(
                    self.params, self.model_state, self.opt_state, self.disc_params, noisy_y, clean_y
                )

                mos = self.batch_mos(np.asarray(enh_y), np.asarray(clean_y), targets)
                aux_d = {}
                for name in list(self.disc_params):
                    self.disc_params[name], self.disc_opt_states[name], aux = self._d_step(
                        self.disc_params[name],
                        self.disc_opt_states[name],
                        self.disc_txs[name],
                        clean_mag,
                        enh_mag,
                        jnp.asarray(mos[target_of[name]]),
                    )
                    aux_d.update({f"{k}_{name}": v for k, v in aux.items()})

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
        self.ckpt_manager.wait()  # commit any in-flight async save


class DualGanDenoiseTrainer(GanDenoiseTrainer):
    """Two-discriminator MetricGAN (freeze-phase trainer_dualGAN.py:50-110):
    D_sig regresses normalized DNSMOS SIG (generator weight 1.0),
    D_bak regresses normalized DNSMOS BAK (generator weight 0.5)."""

    disc_specs = (("d_sig", "SIG", 1.0), ("d_bak", "BAK", 0.5))


class OnlyGenTrainer(DenoiseTrainer):
    """Generator-only ablation (freeze-phase trainer_onlyGen.py:41-65):
    loss = freq_MAE + mag_MAE (no SDR term, no adversarial term)."""

    def training_step_fn(self, params, model_state, batch):
        noisy_y, clean_y = batch[0], batch[1]
        out = self.model_apply(self.model_config, params, model_state, noisy_y, train=True)
        enhanced_y = out["enhanced_y"]
        loss_freq_mae = freq_mae(enhanced_y, clean_y)
        loss_mag_mae = mag_mae(enhanced_y, clean_y)
        loss = loss_freq_mae + loss_mag_mae
        loss_dict = {"loss_g": loss, "loss_freq_mae": loss_freq_mae, "loss_mag_mae": loss_mag_mae}
        return loss, loss_dict, out["state"]
