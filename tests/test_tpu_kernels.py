"""Real-TPU Pallas kernel parity — compiled, on hardware, in-tree.

The rest of the suite pins the Pallas kernels in interpret mode on CPU
(tests/test_gsu_pallas.py, test_stream_forward.py); Mosaic lowering bugs can
hide from interpret mode, so this module re-runs the parity comparisons
COMPILED on the real chip. The suite's conftest forces the CPU backend
in-process, so each check runs in a subprocess with a clean JAX config;
tests skip (with the reason) only when no TPU is attached.

Run: the default `pytest tests/` on a TPU host executes these compiled.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_PROBE = """
import jax
print("BACKEND", jax.default_backend())
"""


def _run_child(code: str, timeout: int = 900) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin register
    # keep any compilation cache settings so repeat runs are fast
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=str(REPO),
    )


def _tpu_available() -> bool:
    try:
        out = _run_child(_PROBE, timeout=300)
    except subprocess.TimeoutExpired:
        return False
    return any(b in out.stdout for b in ("BACKEND tpu", "BACKEND axon"))


tpu = pytest.mark.skipif(not _tpu_available(), reason="no TPU attached")


@tpu
def test_gsu_stack_kernels_compiled_parity():
    """Layer + fused-stack eval kernels vs the lax.scan oracle, compiled."""
    code = """
    import numpy as np, jax, jax.numpy as jnp
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from spiking_fullsubnet_tpu.ops.gsu import gsu_stack_apply, gsu_stack_init
    from spiking_fullsubnet_tpu.ops.gsu_pallas import (
        gsu_stack_apply_pallas, gsu_stack_eval_pallas)

    T, B, H, F = 50, 16, 64, 48
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, F), dtype=np.float32))
    for shared in (False, True):
        params, state = gsu_stack_init(
            jax.random.PRNGKey(1), input_size=F, hidden_size=H,
            num_layers=2, shared_weights=shared, bn=True)
        ref, ref_alo, _ = jax.jit(
            lambda p, s, x: gsu_stack_apply(p, s, x, H, shared, False, backend="scan")
        )(params, state, x)
        got, got_alo, _ = jax.jit(
            lambda p, s, x: gsu_stack_apply_pallas(p, s, x, H, shared, False)
        )(params, state, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0, rtol=0)
        fus, _, _ = jax.jit(
            lambda p, s, x: gsu_stack_eval_pallas(p, s, x, H, shared)
        )(params, state, x)
        # fused stack computes xg in-kernel (different summation order):
        # binary spikes must still agree except at exact-threshold ties
        mismatch = float(jnp.mean(jnp.abs(fus - ref)))
        assert mismatch < 2e-3, mismatch
    print("GSU_OK")
    """
    out = _run_child(code)
    assert "GSU_OK" in out.stdout, out.stdout + out.stderr


@tpu
def test_gsu_train_kernel_compiled_grads():
    """Training forward + reverse-time backward kernel vs scan grads, compiled."""
    code = """
    import numpy as np, jax, jax.numpy as jnp
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from spiking_fullsubnet_tpu.ops.gsu import gsu_stack_apply, gsu_stack_init
    from spiking_fullsubnet_tpu.ops.gsu_pallas import gsu_stack_apply_pallas

    T, B, H, F = 40, 16, 64, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, F), dtype=np.float32))
    params, state = gsu_stack_init(
        jax.random.PRNGKey(1), input_size=F, hidden_size=H,
        num_layers=2, shared_weights=True, bn=True)

    w = jnp.asarray(rng.standard_normal((T, B, H), dtype=np.float32))

    def loss_scan(p):
        out, _, _ = gsu_stack_apply(p, state, x, H, True, True, backend="scan")
        return jnp.sum(out * w)

    def loss_pallas(p):
        out, _, _ = gsu_stack_apply_pallas(p, state, x, H, True, True)
        return jnp.sum(out * w)

    # At XLA's DEFAULT f32 matmul precision the MXU runs bf16 passes, and the
    # two implementations group matmuls differently, so grads drift apart at
    # ~1e-3 relative (measured; both equally far from the f64 truth). Compare
    # at HIGHEST precision where true-f32 parity must hold tightly.
    with jax.default_matmul_precision("highest"):
        g_ref = jax.jit(jax.grad(loss_scan))(params)
        g_got = jax.jit(jax.grad(loss_pallas))(params)
    for (pa, a), (pb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got)):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=str(pa))

    # default precision: same kernels, loose agreement only (bf16 passes)
    gd_ref = jax.jit(jax.grad(loss_scan))(params)
    gd_got = jax.jit(jax.grad(loss_pallas))(params)
    for a, bb in zip(jax.tree_util.tree_leaves(gd_ref), jax.tree_util.tree_leaves(gd_got)):
        a, bb = np.asarray(a), np.asarray(bb)
        rel = np.max(np.abs(a - bb)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 5e-3, rel
    print("GRAD_OK")
    """
    out = _run_child(code)
    assert "GRAD_OK" in out.stdout, out.stdout + out.stderr


@tpu
def test_stream_path_compiled_parity():
    """The PRODUCTION serving path (scan_mode=stream) vs the fused scan,
    compiled on hardware at FULL flagship-M size.

    This is the whole-model kernel story round 3's mega kernel failed:
    its compiled parity test timed out (>900 s Mosaic compile at reduced
    width). The stream path's per-stack kernels + hoisted glue compile in
    well under the child timeout at full size AND are the benchmarked
    default (scan_mode=auto picks them)."""
    code = """
    import numpy as np, jax, jax.numpy as jnp
    from dataclasses import replace
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from spiking_fullsubnet_tpu.models.presets import flagship_m

    b = flagship_m(scan_mode="fused")  # FULL flagship-M, f32
    cfg, apply_fn = b["config"], b["apply"]
    params, state = b["params"], b["state"]
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((4, 32000), dtype=np.float32) * 0.1)
    # compare at HIGHEST matmul precision: at the TPU DEFAULT, f32 matmuls
    # run bf16 passes and the two formulations' different groupings flip
    # near-threshold binary spikes (rel ~0.35 measured — formulation
    # chaos, not error; quality parity under bf16 is pinned by the zoo-
    # checkpoint SI-SNR tests). True-f32 parity must be tight.
    cfg_s = replace(cfg, scan_mode="stream")
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda p, s, n: apply_fn(cfg, p, s, n, train=False)[
            "enhanced_y"])(params, state, noisy)
        got = jax.jit(lambda p, s, n: apply_fn(cfg_s, p, s, n, train=False)[
            "enhanced_y"])(params, state, noisy)
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.linalg.norm(ref - got) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 1e-4, rel

    # train=True must also compile and produce a finite loss + grads
    clean = jnp.asarray(rng.standard_normal((4, 32000), dtype=np.float32) * 0.05)
    def loss_fn(p, s):
        out = apply_fn(cfg_s, p, s, noisy, train=True)
        return jnp.mean(jnp.abs(out["enhanced_y"] - clean))
    l, g = jax.jit(jax.value_and_grad(loss_fn))(params, state)
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    print("STREAM_OK", rel)
    """
    out = _run_child(code)
    assert "STREAM_OK" in out.stdout, out.stdout + out.stderr


def test_merged_sections_kernel_compiled_parity():
    """The serving configuration (collect_layer_outputs=False -> ONE
    whole-model monolith launch: in-kernel STFT, gates, stacks, projection,
    deep filter and iSTFT) vs the per-section kernel path, compiled on
    hardware at full flagship-M size.

    Exactness is asserted on the cumulative-norm config (its input scaling
    is a running sum — no LN variance amplification): rel < 1e-3. The
    pre-LN flagship config's LN statistics amplify f32 grouping noise into
    sparse near-threshold spike flips (the documented chaos class, see
    test_stream_path_compiled_parity), so it gets a loose sanity bound."""
    code = """
    import numpy as np, jax, jax.numpy as jnp
    from dataclasses import replace
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    from spiking_fullsubnet_tpu.models.presets import flagship_m

    # cum config: monolith vs per-section path must agree tightly
    b = flagship_m(scan_mode="stream", collect_layer_outputs=False,
                   use_pre_layer_norm_fb=False, use_pre_layer_norm_sb=False,
                   norm_type="cumulative_laplace_norm")
    cfg, apply_fn = b["config"], b["apply"]
    params, state = b["params"], b["state"]
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((4, 64000), dtype=np.float32) * 0.1)
    cfg_ref = replace(cfg, collect_layer_outputs=True)  # per-section kernels
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda p, s, n: apply_fn(cfg_ref, p, s, n, train=False)[
            "enhanced_y"])(params, state, noisy)
        got = jax.jit(lambda p, s, n: apply_fn(cfg, p, s, n, train=False)[
            "enhanced_y"])(params, state, noisy)
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.linalg.norm(ref - got) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 1e-3, rel

    # pre-LN flagship: same machinery + LN stats; sparse spike flips allowed
    b2 = flagship_m(scan_mode="stream", collect_layer_outputs=False)
    cfg2 = b2["config"]
    cfg2_ref = replace(cfg2, collect_layer_outputs=True)
    with jax.default_matmul_precision("highest"):
        ref2 = jax.jit(lambda p, s, n: apply_fn(cfg2_ref, p, s, n, train=False)[
            "enhanced_y"])(b2["params"], b2["state"], noisy)
        got2 = jax.jit(lambda p, s, n: apply_fn(cfg2, p, s, n, train=False)[
            "enhanced_y"])(b2["params"], b2["state"], noisy)
    rel2 = np.linalg.norm(np.asarray(ref2) - np.asarray(got2)) / (
        np.linalg.norm(np.asarray(ref2)) + 1e-12)
    assert rel2 < 0.05, rel2
    print("MERGED_OK", rel, rel2)
    """
    out = _run_child(code)
    assert "MERGED_OK" in out.stdout, out.stdout + out.stderr
