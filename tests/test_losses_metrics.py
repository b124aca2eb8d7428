"""Parity of losses / PIT / metrics with the reference torch implementations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from spiking_fullsubnet_tpu import losses
from spiking_fullsubnet_tpu.metrics import SISDR, STOI, compute_neuronops, compute_synops

from reference_oracle import add_reference_to_path

add_reference_to_path()
import audiozen.loss as ref_loss  # noqa: E402
import audiozen.pit as ref_pit  # noqa: E402


def test_si_snr_loss():
    x = np.random.randn(3, 16000).astype(np.float32)
    y = (x + 0.3 * np.random.randn(3, 16000)).astype(np.float32)
    ref = ref_loss.SISNRLoss()(torch.from_numpy(x), torch.from_numpy(y)).item()
    ours = float(losses.si_snr(jnp.asarray(x), jnp.asarray(y)))
    assert abs(ours - ref) < 1e-3
    assert abs(float(losses.si_snr_loss(jnp.asarray(x), jnp.asarray(y))) + ref) < 1e-3


def test_freq_mag_mae():
    x = np.random.randn(2, 16000).astype(np.float32)
    y = np.random.randn(2, 16000).astype(np.float32)
    ref_f = ref_loss.freq_MAE(torch.from_numpy(x), torch.from_numpy(y)).item()
    ref_m = ref_loss.mag_MAE(torch.from_numpy(x), torch.from_numpy(y)).item()
    ours_f = float(losses.freq_mae(jnp.asarray(x), jnp.asarray(y)))
    ours_m = float(losses.mag_mae(jnp.asarray(x), jnp.asarray(y)))
    assert abs(ours_f - ref_f) < 2e-4 * max(1, abs(ref_f))
    assert abs(ours_m - ref_m) < 2e-4 * max(1, abs(ref_m))


@pytest.mark.parametrize("gamma,f_complex", [(1.0, None), (0.3, 1.0)])
def test_multires_spec_loss(gamma, f_complex):
    x = np.random.rand(2, 16000).astype(np.float32)
    y = np.random.rand(2, 16000).astype(np.float32)
    ref = ref_loss.MultiResSpecLoss([240, 480, 960], gamma, 1.0, f_complex)(
        torch.from_numpy(x), torch.from_numpy(y)
    ).item()
    ours = float(
        losses.multi_res_spec_loss(jnp.asarray(x), jnp.asarray(y), [240, 480, 960], gamma, 1.0, f_complex)
    )
    assert abs(ours - ref) < 2e-4 * max(1.0, abs(ref))


def test_pit():
    est = np.random.randn(4, 3, 8000).astype(np.float32)
    ref = np.random.randn(4, 3, 8000).astype(np.float32)
    t_loss, t_reordered = ref_pit.PITWrapper(ref_pit.PairwiseNegSDR())(
        torch.from_numpy(est), torch.from_numpy(ref)
    )
    ours_loss, ours_reordered = losses.pit_wrapper(
        losses.pairwise_neg_sisdr, jnp.asarray(est), jnp.asarray(ref)
    )
    assert abs(float(ours_loss) - t_loss.item()) < 1e-3
    np.testing.assert_allclose(np.asarray(ours_reordered), t_reordered.numpy(), atol=1e-6)


def test_sisdr_metric():
    est = np.random.randn(2, 16000).astype(np.float32)
    ref = np.random.randn(2, 16000).astype(np.float32)
    ours = SISDR()(est, ref)["si_sdr"]
    # reference formula transcribed (metric.py:67-101)
    eps = np.finfo(np.float32).eps
    s_t = ref - ref.mean(-1, keepdims=True)
    s_e = est - est.mean(-1, keepdims=True)
    dot = np.sum(s_t * s_e, -1, keepdims=True)
    norm = np.sum(s_t**2, -1, keepdims=True)
    proj = (dot * s_t + eps) / (norm + eps)
    e = s_e - proj
    val = 10 * np.log10((np.sum(proj**2, -1) + eps) / (np.sum(e**2, -1) + eps) + eps)
    assert abs(ours - val.mean()) < 1e-4


def test_stoi_sane():
    """Self-consistency checks for the numpy STOI (no pystoi oracle here):
    identical signals ≈ 1, noisier → lower, clean vs noise-only low."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(0)
    n = 48000
    # broadband speech-shaped: lowpassed noise with slow envelope modulation
    clean = lfilter(np.ones(8) / 8, [1.0], rng.standard_normal(n))
    clean = clean * (1 + 0.8 * np.sin(2 * np.pi * 3 * np.arange(n) / 16000))
    m = STOI(sr=16000)
    perfect = m(clean, clean)["stoi"]
    slight = m(clean + 0.2 * rng.standard_normal(n), clean)["stoi"]
    heavy = m(clean + 3.0 * rng.standard_normal(n), clean)["stoi"]
    assert perfect > 0.99
    assert perfect >= slight >= heavy
    assert heavy < 0.5


def test_synops_neuronops():
    fb = [np.random.rand(10, 2, 64), (np.random.rand(10, 2, 32) > 0.5).astype(np.float32),
          (np.random.rand(10, 2, 32) > 0.7).astype(np.float32), np.random.rand(10, 2, 64)]
    sb = [[np.random.rand(10, 6, 36), (np.random.rand(10, 6, 16) > 0.4).astype(np.float32),
           (np.random.rand(10, 6, 16) > 0.6).astype(np.float32), np.random.rand(10, 6, 24)]]
    ours = compute_synops(fb, sb, shared_weights=True)
    # reference formula (metric.py:303-327)
    ref = 0.0
    for i in range(1, len(fb) - 1):
        ref += (np.asarray(fb[i]) > 0).mean() * fb[i].shape[-1] * (fb[i + 1].shape[-1] + fb[i].shape[-1])
    for sec in sb:
        for j in range(1, len(sec) - 1):
            ref += (np.asarray(sec[j]) > 0).mean() * sec[j].shape[-1] * (sec[j + 1].shape[-1] + sec[j].shape[-1])
    assert abs(ours - ref) < 1e-6
    assert compute_synops(fb, sb, shared_weights=False) == pytest.approx(2 * ours)
    assert compute_neuronops(fb, sb) == sum(x.shape[-1] for x in fb) + sum(x.shape[-1] for x in sb[0])


def test_synops_device_matches_host():
    """jitted on-device synops (validation path) == host compute_synops."""
    import jax
    import jax.numpy as jnp

    from spiking_fullsubnet_tpu.metrics import synops_device

    rng = np.random.default_rng(1)
    fb = [(rng.random((4, 2, d)) > 0.6).astype(np.float32) for d in (64, 32, 32, 64)]
    sb = [[(rng.random((4, 6, d)) > 0.5).astype(np.float32) for d in (36, 16, 16, 24)]]
    host = compute_synops(fb, sb, shared_weights=True)
    dev = float(
        jax.jit(lambda f, s: synops_device(f, s, shared_weights=True))(
            [jnp.asarray(x) for x in fb], [[jnp.asarray(x) for x in s] for s in sb]
        )
    )
    assert dev == pytest.approx(host, rel=1e-5)
