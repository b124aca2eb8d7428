"""Intel N-DNS denoising recipe trainer (see framework DenoiseTrainer).

Mirrors reference recipes/intel_ndns/spiking_fullsubnet/trainer.py:
loss = freq_MAE + mag_MAE + 0.001*(100 - SISNR) (ibid.:33-37), validation
metrics SI-SDR (+ DNSMOS when onnxruntime is available), north star si_sdr.
"""

from spiking_fullsubnet_tpu.recipes import DenoiseTrainer


class Trainer(DenoiseTrainer):
    pass
