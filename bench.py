"""Benchmark: flagship-model serving + training throughput on one chip.

Prints ONE JSON line with the primary metric plus context fields:
    {"metric": "audio_seconds_per_second_per_chip", "value": N,
     "unit": "audio-s/s", "vs_baseline": R, ...}

value = seconds of 16 kHz audio enhanced per wall-clock second (steady
state, batch 256 x 30 s utterances, offline/batched) with Spiking-FullSubNet
M (954k params, the published leaderboard model) under the production
serving config (scan_mode=auto -> stream path, bfloat16 streams,
collect_layer_outputs=False — quality parity vs f32 verified on the
competition checkpoint by
tests/test_mixed_precision.py::test_bf16_forward_preserves_quality).

vs_baseline = value / realtime: how many real-time streams one chip
sustains (the reference publishes no wall-clock numbers — SURVEY.md §6).

Breakdown fields (all measured on-device with the chained-iteration
protocol of runtime/timing.py — plain block_until_ready is a no-op over
tunneled backends and under-reports by orders of magnitude):
    recurrent_kernel_ms   the serving path's TWO Pallas launches (fullband
                          stack + the merged-sections kernel, which fuses
                          the layer-0 gates, every sub-band stack, the
                          output projection and the deep filter), measured
                          standalone at the same shapes — the SEQUENTIAL
                          floor of this architecture (a strict per-frame
                          recurrence; no amount of fusion removes it)
    dsp_ms                STFT + magnitude + iSTFT, measured standalone
    glue_ms               everything else (normalization statistics,
                          spectrum assembly), by subtraction
    mfu / fraction_of_roofline  analytic-FLOPs MFU vs v5e bf16 peak; the
                          gap to 1.0 is dominated by the sequential floor
                          (see kernel_floor_fraction — the roofline assumes
                          perfectly parallel FLOPs, which a recurrence
                          cannot reach on one core)
    train_audio_s_per_s   training step throughput (batch 64 x 6 s)
    streaming_ms_per_hop_b1  per-hop on-device latency of the streaming
                          API at batch 1 vs the 8 ms real-time budget
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from spiking_fullsubnet_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    from spiking_fullsubnet_tpu.models.presets import flagship_m as _flagship_bundle
    from spiking_fullsubnet_tpu.runtime.roofline import roofline_report
    from spiking_fullsubnet_tpu.runtime.timing import time_fn_per_iter

    bundle = _flagship_bundle(
        scan_mode="auto", compute_dtype="bfloat16", collect_layer_outputs=False)
    cfg, apply_fn = bundle["config"], bundle["apply"]
    params, state = bundle["params"], bundle["state"]

    sr = 16000
    rng = np.random.default_rng(0)

    # ---- offline enhance throughput (the headline) ----
    batch, seconds = 256, 30.0
    noisy = jnp.asarray(rng.standard_normal((batch, int(seconds * sr)), dtype=np.float32) * 0.1)

    def enhance(params, state, noisy):
        return apply_fn(cfg, params, state, noisy, train=False)["enhanced_y"]

    dt = time_fn_per_iter(enhance, (params, state, noisy), iters=(1, 3), reps=3)
    enhance_tput = batch * seconds / dt

    # ---- the PUBLISHED competition checkpoint on the same fast path ----
    # The zoo M weights (shipped config: offline_laplace_norm, no pre-LN)
    # serve on the SAME stream/merged path — the input norms are per-unit
    # scalar streams that commute through the hoisted layer-0 matmuls
    # (VERDICT r4 #2: the only weights with leaderboard-verified quality
    # previously ran on the slowest layered path, unbenchmarked).
    zoo_tput = None
    try:
        import tomllib
        from pathlib import Path

        from spiking_fullsubnet_tpu.models.spiking_fullsubnet import (
            separator_config, spiking_fullsubnet_init)
        from spiking_fullsubnet_tpu.runtime.convert import load_npz

        zdir = Path(__file__).parent / "model_zoo" / "intel_ndns" / "spike_fsb"
        shipped = Path("/root/reference/model_zoo/intel_ndns/spike_fsb/"
                       "baseline_m/baseline_m.toml")
        if (zdir / "baseline_m.npz").exists():
            if shipped.exists():
                margs = tomllib.loads(shipped.read_text())["model_g"]["args"]
                zcfg = separator_config(**margs)
            else:
                zcfg = separator_config(norm_type="offline_laplace_norm",
                                        shared_weights=True, bn=True)
            from dataclasses import replace as _rep

            zcfg = _rep(zcfg, scan_mode="auto", compute_dtype="bfloat16",
                        collect_layer_outputs=False)
            tpl = spiking_fullsubnet_init(jax.random.PRNGKey(0), zcfg)
            rest = load_npz(str(zdir / "baseline_m.npz"),
                            {"params": tpl[0], "state": tpl[1]})

            def z_enhance(p, s, n):
                return apply_fn(zcfg, p, s, n, train=False)["enhanced_y"]

            dtz = time_fn_per_iter(
                z_enhance, (rest["params"], rest["state"], noisy),
                iters=(1, 3), reps=3)
            zoo_tput = batch * seconds / dtz
    except Exception as e:  # noqa: BLE001 — zoo bench is auxiliary
        print(f"# zoo bench skipped: {type(e).__name__}: {e}", flush=True)

    # ---- breakdown: Pallas kernels standalone (sequential floor) ----
    # The serving path runs TWO launches: the fullband stack kernel and the
    # merged-sections kernel (layer-0 gates + all sub-band stacks + output
    # projection + deep filter in ONE kernel, ops/gsu_pallas.py). Both are
    # timed standalone at the exact serving shapes with the model's real
    # weight/stream structure (random values — timing is value-independent).
    from spiking_fullsubnet_tpu.dsp.spectral import (
        istft_real_imag_tmajor,
        num_frames,
        stft_real_imag_tmajor,
    )
    from spiking_fullsubnet_tpu.nn.core import cast_floating
    from spiking_fullsubnet_tpu.ops import gsu_pallas

    T = num_frames(int(seconds * sr), cfg.n_fft, cfg.hop_length)
    Tp = -(-T // 128) * 128
    kernel_s = 0.0
    if gsu_pallas.available():
        cdt = jnp.bfloat16
        fb_p = cast_floating(bundle["params"]["fb"], cdt)
        g_fb = -(-cfg.fb_hidden_size // 128) * 128 * (1 if cfg.shared_weights else 2)
        xg_fb = jnp.asarray(
            rng.standard_normal((Tp, batch, g_fb)), dtype=cdt)

        def fb_kernel(xg):
            out, _, _ = gsu_pallas.gsu_stack_eval_pallas_xg(
                fb_p["stack"], state["fb"]["stack"], xg,
                cfg.fb_hidden_size, cfg.shared_weights,
                collect_all=False, keep_padded=True)
            return out

        fb_kernel_s = time_fn_per_iter(fb_kernel, (xg_fb,), iters=(1, 5), reps=3)

        g_sb = -(-cfg.sb_hidden_size // 128) * 128 * (1 if cfg.shared_weights else 2)
        fbp = -(-cfg.fb_proj_size // 128) * 128
        sec_p, sec_s, wa_l, wb_l, uv_l, wp_l, bp_l = [], [], [], [], [], [], []
        sec_spec, sec_geom = [], []
        xa = jnp.asarray(rng.standard_normal((Tp, batch, cfg.num_freqs)), cdt)
        xbv = jnp.asarray(rng.standard_normal((Tp, batch, fbp)), cdt)
        for i in range(cfg.num_sections):
            n = (cfg.freq_cutoffs[i + 1] - cfg.freq_cutoffs[i]) // cfg.center_freq_sizes[i]
            ctr, df = cfg.center_freq_sizes[i], cfg.df_orders[i]
            sb_p = cast_floating(bundle["params"]["sb"][i], cdt)
            sec_p.append(sb_p["stack"])
            sec_s.append(state["sb"][i]["stack"])
            wa_l.append(jnp.asarray(
                rng.standard_normal((n, cfg.num_freqs, g_sb)) * 0.02, cdt))
            wb_l.append(jnp.asarray(
                rng.standard_normal((n, fbp, g_sb)) * 0.02, cdt))
            uv_l.append((jnp.asarray(rng.standard_normal(g_sb), jnp.float32),
                         jnp.asarray(rng.standard_normal(g_sb), jnp.float32)))
            P = 2 * df * ctr
            wp_l.append(jnp.asarray(
                rng.standard_normal((P, cfg.sb_hidden_size)) * 0.05, jnp.float32))
            bp_l.append(jnp.asarray(rng.standard_normal((P,)) * 0.05, jnp.float32))
            w = n * ctr
            sec_spec.append((
                jnp.asarray(rng.standard_normal((Tp, batch, w)), jnp.float32),
                jnp.asarray(rng.standard_normal((Tp, batch, w)), jnp.float32)))
            sec_geom.append((ctr, df))
        U = sum(w.shape[0] for w in wa_l)
        up = -(-U // 8) * 8
        alpha = jnp.asarray(rng.uniform(0.5, 1.5, (Tp, batch, up)), jnp.float32)
        beta = jnp.asarray(rng.uniform(-0.1, 0.1, (Tp, batch, up)), jnp.float32)

        # weights/spectra ride as ARGUMENTS (closing over them embeds
        # ~10 MB of literal constants into the chained HLO, which crashes
        # the remote compile helper)
        def sections_kernel(xa, xbv, alpha, beta, wts):
            return gsu_pallas.gsu_sections_eval_pallas(
                wts["p"], sec_s, wts["wa"], wts["wb"], wts["uv"],
                wts["wp"], wts["bp"],
                xa, xbv, alpha, beta, cfg.sb_hidden_size, cfg.shared_weights,
                sec_spec=wts["spec"], sec_geom=sec_geom)

        wts = {"p": sec_p, "wa": wa_l, "wb": wb_l, "uv": uv_l,
               "wp": wp_l, "bp": bp_l, "spec": sec_spec}
        sections_kernel_s = time_fn_per_iter(
            sections_kernel, (xa, xbv, alpha, beta, wts), iters=(1, 3), reps=3)
        kernel_s = fb_kernel_s + sections_kernel_s
        # free the multi-GB microbench streams: leaving them alive pushes
        # the HBM allocator into defrag thrash for the measurements below
        # (the zoo path measured 4x slower with them resident)
        del xa, xbv, alpha, beta, wts, wa_l, wb_l, sec_spec, xg_fb

    # ---- breakdown: DSP (stft + magnitude + istft) standalone ----
    def dsp_pass(y):
        re, im = stft_real_imag_tmajor(
            y, cfg.n_fft, cfg.hop_length, cfg.win_length,
            n_frames_out=Tp, matmul_dtype="bfloat16")
        mag = (jnp.square(re) + jnp.square(im)) ** (cfg.fdrc / 2)
        wave = istft_real_imag_tmajor(
            re[:T], im[:T], cfg.n_fft, cfg.hop_length, cfg.win_length,
            length=y.shape[-1], matmul_dtype="bfloat16")
        return mag.astype(jnp.bfloat16), wave

    dsp_s = time_fn_per_iter(dsp_pass, (noisy,), iters=(1, 5), reps=3)

    # glue of the TWO-LAUNCH (zoo) path: its batch minus its kernels & DSP
    # (the monolith headline has no glue by construction — batch IS kernel)
    glue_s = max((dtz if zoo_tput else dt) - kernel_s - dsp_s, 0.0)

    # ---- in-kernel MXU accounting for the monolith serving launch ----
    # The headline path is ONE kernel containing the whole model, so the
    # old kernel-vs-glue split collapses: report the kernel's achieved
    # matmul rate against the bf16 peak instead. padded_flops counts the
    # matmuls the MXU actually executes (lane padding 224->256, 320->384,
    # DFT width 384); the gap between kernel_mxu_fraction and 1.0 is lane
    # padding + the per-step VPU-serial gate/DF math of a strict recurrence.
    def _padded_flops_per_frame_row(c):
        hp = -(-c.sb_hidden_size // 128) * 128
        g = hp * (1 if c.shared_weights else 2)
        hpf = -(-c.fb_hidden_size // 128) * 128
        gf = hpf * (1 if c.shared_weights else 2)
        fp = -(-(c.num_freqs + 1) // 128) * 128
        fbp = -(-c.fb_proj_size // 128) * 128
        f = 4 * 2 * c.n_fft * fp  # stft + istft: 4 dots of [n_fft, Fp]
        f += 2 * 128 * gf + (c.fb_num_layers - 1) * 2 * hpf * gf \
            + c.fb_num_layers * 2 * hpf * gf + 2 * hpf * fbp
        for i in range(c.num_sections):
            n = (c.freq_cutoffs[i + 1] - c.freq_cutoffs[i]) // c.center_freq_sizes[i]
            p_pad = -(-2 * c.df_orders[i] * c.center_freq_sizes[i] // 128) * 128
            aw = 128 if i == 0 else 256  # narrowed window (flagship spans)
            per_unit = (2 * aw * g + 2 * fbp * g
                        + (c.sb_num_layers - 1) * 2 * hp * g
                        + c.sb_num_layers * 2 * hp * g + 2 * hp * p_pad)
            f += n * per_unit
        return f

    padded_tf = _padded_flops_per_frame_row(cfg) * Tp * batch / 1e12
    kernel_tflops_per_s = padded_tf / dt if dt else None

    # ---- training throughput ----
    tb, tsec = 64, 6.0
    t_noisy = jnp.asarray(rng.standard_normal((tb, int(tsec * sr)), dtype=np.float32) * 0.1)
    t_clean = jnp.asarray(rng.standard_normal((tb, int(tsec * sr)), dtype=np.float32) * 0.05)

    def train_step(params, state, n, c):
        def loss_fn(p, s):
            out = apply_fn(cfg, p, s, n, train=True)
            return jnp.mean(jnp.abs(out["enhanced_y"] - c)), out["state"]

        (l, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params, state)
        return l, ns, g

    dt_train = time_fn_per_iter(train_step, (params, state, t_noisy, t_clean), iters=(1, 5), reps=3)
    train_tput = tb * tsec / dt_train

    # train breakdown (VERDICT r4 #6): forward-only (same train=True graph)
    # vs the full value_and_grad step — the difference is the backward pass
    # (reverse-time Pallas vjp kernels + transposed glue matmuls)
    def train_fwd(params, state, n, c):
        out = apply_fn(cfg, params, state, n, train=True)
        return jnp.mean(jnp.abs(out["enhanced_y"] - c)), out["state"]

    dt_tfwd = time_fn_per_iter(train_fwd, (params, state, t_noisy, t_clean), iters=(1, 5), reps=3)
    del t_noisy, t_clean

    # ---- streaming per-hop latency, batch 1 (serving mode) ----
    from spiking_fullsubnet_tpu.streaming import StreamingEnhancer

    enhancer = StreamingEnhancer(cfg, params, state, batch_size=1)
    s0 = enhancer.init_state()
    hop_samples = jnp.asarray(
        rng.standard_normal((1, cfg.hop_length), dtype=np.float32) * 0.1)

    def hop_step(st, chunk):
        st2, y = enhancer.step(st, chunk)
        return st2, y

    dt_hop = time_fn_per_iter(hop_step, (s0, hop_samples), iters=(8, 64), reps=3)
    ms_per_hop = dt_hop * 1e3
    hop_budget_ms = cfg.hop_length / sr * 1e3  # 8 ms at 16 kHz / hop 128

    roof = roofline_report(cfg, enhance_tput, chip="tpu_v5e", matmul_dtype="bf16")
    audio_s = batch * seconds

    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip",
                "value": round(enhance_tput, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(enhance_tput, 2),
                "mfu": round(roof["mfu"], 4),
                "fraction_of_roofline": round(roof["fraction_of_roofline"], 4),
                "roofline_audio_s_per_s": round(roof["roofline_audio_s_per_s"], 0),
                "model_gflops_per_audio_second": round(roof["model_gflops_per_audio_second"], 3),
                "batch_ms": round(dt * 1e3, 2),
                # the headline path is the whole-model MONOLITH launch
                # (STFT+stacks+DF+iSTFT in one kernel) — batch_ms IS kernel
                # time plus ~1 ms of chunk reshapes. Its achieved matmul
                # rate (padded-flop basis) against the 197 TF/s bf16 peak:
                "kernel_padded_tflops": round(padded_tf, 2),
                "kernel_achieved_tflops_per_s": round(kernel_tflops_per_s, 1),
                "kernel_mxu_fraction": round(kernel_tflops_per_s / 197.0, 3),
                # the TWO-LAUNCH serving kernels (used by the zoo config,
                # whose offline norm is anti-causal), standalone at the same
                # shapes, and the zoo path's decomposition around them
                "recurrent_kernel_ms": round(kernel_s * 1e3, 2),
                "fb_kernel_ms": round(fb_kernel_s * 1e3, 2) if kernel_s else None,
                "sections_kernel_ms": round(sections_kernel_s * 1e3, 2) if kernel_s else None,
                "dsp_ms": round(dsp_s * 1e3, 2),
                "glue_ms": round(glue_s * 1e3, 2),
                "kernel_floor_audio_s_per_s": round(audio_s / kernel_s, 0) if kernel_s else None,
                "kernel_floor_fraction": round((audio_s / kernel_s) / roof["roofline_audio_s_per_s"], 3) if kernel_s else None,
                # the imported competition checkpoint (shipped config:
                # offline_laplace_norm -> two-launch path) serving fast
                "zoo_m_audio_s_per_s": round(zoo_tput, 2) if zoo_tput else None,
                "train_audio_s_per_s": round(train_tput, 2),
                "train_step_ms": round(dt_train * 1e3, 2),
                "train_fwd_ms": round(dt_tfwd * 1e3, 2),
                "train_bwd_ms": round(max(dt_train - dt_tfwd, 0.0) * 1e3, 2),
                "streaming_ms_per_hop_b1": round(ms_per_hop, 3),
                "streaming_hop_budget_ms": hop_budget_ms,
                "streaming_realtime_ok": bool(ms_per_hop < hop_budget_ms),
            }
        )
    )


if __name__ == "__main__":
    main()
