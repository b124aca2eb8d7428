"""Intel baseline SDNN recipe trainer.

Mirrors reference recipes/intel_ndns/sdnn_delays/trainer.py:25-50: the model
masks the magnitude spectrum; reconstruction uses the noisy phase; loss is
lam * MSE(mag) + (100 - SISNR) (loss.py:8-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spiking_fullsubnet_tpu.dsp.spectral import istft, stft_complex
from spiking_fullsubnet_tpu.losses import mse_loss, si_snr
from spiking_fullsubnet_tpu.recipes import DenoiseTrainer


class Trainer(DenoiseTrainer):
    def __init__(self, *args, lam: float = 0.001, **kwargs):
        super().__init__(*args, **kwargs)
        self.lam = lam
        cfg, apply_fn = self.model_config, self.model_apply
        n_fft, hop, win = self.n_fft, self.hop_length, self.win_length

        def eval_forward(params, state, noisy):
            spec = stft_complex(noisy, n_fft, hop, win)
            mag, phase = jnp.abs(spec), jnp.angle(spec)
            enh_mag = apply_fn(cfg, params, state, mag, train=False)["enhanced_mag"]
            wave = istft((enh_mag, phase), n_fft, hop, win, length=noisy.shape[-1], input_type="mag_phase")
            # match the DenoiseTrainer eval contract (wave, synops, neuronops)
            return wave, None, None

        self._eval_forward = jax.jit(eval_forward)

    def training_step_fn(self, params, model_state, batch):
        noisy, clean = batch[0], batch[1]
        spec = stft_complex(noisy, self.n_fft, self.hop_length, self.win_length)
        noisy_mag, noisy_phase = jnp.abs(spec), jnp.angle(spec)
        clean_mag = jnp.abs(stft_complex(clean, self.n_fft, self.hop_length, self.win_length))

        out = self.model_apply(self.model_config, params, model_state, noisy_mag, train=True)
        enh_mag = out["enhanced_mag"]
        clean_rec = istft(
            (enh_mag, noisy_phase), self.n_fft, self.hop_length, self.win_length,
            length=noisy.shape[-1], input_type="mag_phase",
        )
        score = si_snr(clean_rec, clean)
        loss = self.lam * mse_loss(enh_mag, clean_mag) + (100.0 - score)
        return loss, {"loss": loss, "si_snr": score}, out["state"]
