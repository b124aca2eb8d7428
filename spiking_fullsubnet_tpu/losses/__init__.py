"""Training losses (maps reference layer 3, audiozen/loss.py + pit.py).

All losses are pure jnp functions, differentiable and jittable; the STFT
losses share the framework's spectral ops so the whole training step fuses
into one XLA graph.
"""

from .losses import (
    si_snr,
    si_snr_loss,
    freq_mae,
    mag_mae,
    multi_res_spec_loss,
    combine_loss,
    l1_loss,
    mse_loss,
)
from .pit import pairwise_neg_sisdr, pit_wrapper, find_best_perm, reorder_source
