#!/usr/bin/env python
"""Profiling harness: jax.profiler trace capture + XLA cost attribution.

SURVEY.md §5a's TPU equivalent of the reference's (absent) profiling
subsystem: "jax.profiler traces + per-kernel roofline accounting".

Two modes, composable:

  --trace-dir DIR   capture a jax.profiler trace of the flagship forward
                    (open with TensorBoard / Perfetto). Gracefully reports
                    when the backend transport cannot host the profiler
                    (remote-attached dev tunnels).
  (always)          prints the XLA compiler's own cost analysis of the
                    jitted forward + training step (FLOPs, bytes accessed)
                    next to the analytic roofline (runtime/roofline.py), so
                    the analytic model is cross-checked against the
                    compiler's count.

Usage:
    python tools/profile_trace.py [--batch 8] [--seconds 2] [--trace-dir /tmp/trace]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--train-batch", type=int, default=None,
                    help="train-step shape (defaults to --batch; the serving "
                    "batch 256x30s OOMs the train step's saved activations, "
                    "so profile serving and training at their own shapes)")
    ap.add_argument("--train-seconds", type=float, default=None)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--scan-mode", default="auto")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--serving", action="store_true",
                    help="bench serving config: collect_layer_outputs=False "
                    "(enables the merged-sections kernel path)")
    ap.add_argument("--summary", default=None,
                    help="write a markdown per-op table parsed from the "
                    "captured trace (requires --trace-dir; xprof)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spiking_fullsubnet_tpu.models.presets import flagship_m as _flagship_bundle
    from spiking_fullsubnet_tpu.runtime.roofline import (
        CHIP_SPECS, spiking_fullsubnet_cost)

    bundle = _flagship_bundle(
        scan_mode=args.scan_mode,
        compute_dtype=None if args.compute_dtype == "none" else args.compute_dtype,
        collect_layer_outputs=not args.serving,
    )
    cfg, apply_fn = bundle["config"], bundle["apply"]
    params, state = bundle["params"], bundle["state"]
    sr = 16000
    noisy = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, int(args.seconds * sr))).astype(np.float32) * 0.1)

    tb = args.train_batch or args.batch
    tsec = args.train_seconds or args.seconds
    t_noisy = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (tb, int(tsec * sr))).astype(np.float32) * 0.1)
    t_clean = t_noisy * 0.5

    fwd = jax.jit(lambda p, s, n: apply_fn(cfg, p, s, n, train=False)["enhanced_y"])

    def train_step(p, s, n, c):
        def loss(p, s):
            out = apply_fn(cfg, p, s, n, train=True)
            return jnp.mean(jnp.abs(out["enhanced_y"] - c)), out["state"]

        return jax.value_and_grad(loss, has_aux=True)(p, s)

    step = jax.jit(train_step)

    audio_seconds = args.batch * args.seconds
    analytic = spiking_fullsubnet_cost(cfg, sr)
    print(f"analytic model cost: "
          f"{analytic.flops_per_audio_second() / 1e9:.3f} GFLOP / audio-second "
          f"({analytic.flops_per_audio_second() * audio_seconds / 1e9:.2f} GFLOP this run)")

    targets = [("forward", fwd, (params, state, noisy))]
    if not args.skip_train:
        targets.append(("train_step", step, (params, state, t_noisy, t_clean)))
    for name, fn, fargs in targets:
        lowered = fn.lower(*fargs)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        bytes_ = float(cost.get("bytes accessed", float("nan")))
        peak = CHIP_SPECS["tpu_v5e"]["bf16"]
        bw = CHIP_SPECS["tpu_v5e"]["hbm_gbps"]
        print(f"XLA cost[{name}]: {flops / 1e9:.2f} GFLOP, "
              f"{bytes_ / 1e9:.2f} GB accessed "
              f"-> speed-of-light {max(flops / peak, bytes_ / bw) * 1e3:.2f} ms "
              f"({'compute' if flops / peak > bytes_ / bw else 'memory'}-bound)")

    # execute once (so a captured trace contains real device work)
    out = fwd(params, state, noisy)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    if args.trace_dir:
        try:
            with jax.profiler.trace(args.trace_dir):
                out = fwd(params, state, noisy)
                _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
                if not args.skip_train:
                    tout = step(params, state, t_noisy, t_clean)
                    _ = np.asarray(jax.tree_util.tree_leaves(tout)[0].ravel()[:1])
            print(f"profiler trace written to {args.trace_dir} "
                  f"(view: tensorboard --logdir {args.trace_dir})")
        except Exception as e:  # noqa: BLE001
            print(f"profiler trace unavailable on this backend transport: "
                  f"{type(e).__name__}: {str(e)[:160]}")
        if args.summary:
            write_trace_summary(args.trace_dir, args.summary, vars(args))
            print(f"per-op summary written to {args.summary}")


def write_trace_summary(trace_dir: str, out_path: str, run_args: dict,
                        top_n: int = 25) -> None:
    """Parse the captured xplane with xprof and write a markdown per-op
    table (self time, occurrences, measured HBM bandwidth, boundedness) —
    the committable profile artifact."""
    import glob
    import json

    from xprof.convert import raw_to_tool_data as rtd

    # one capture session only — multiple xplane files make the converter
    # return None; take the newest session dir
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))[-1:]
    out, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    if out is None:
        raise RuntimeError("xprof returned no hlo_stats for " + str(files))
    data = json.loads(out)
    tbl = data[0] if isinstance(data, list) else data
    cols = [c["id"] for c in tbl["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in tbl["rows"]]
    idx = {k: cols.index(k) for k in (
        "hlo_op_expression", "total_self_time", "occurrences", "category",
        "measured_memory_bw", "bound_by")}
    rows.sort(key=lambda r: -float(r[idx["total_self_time"]] or 0))
    total_us = sum(float(r[idx["total_self_time"]] or 0) for r in rows)

    lines = [
        "# Serving-path device profile (xprof hlo_stats)",
        "",
        f"Run: `python tools/profile_trace.py "
        + " ".join(f"--{k.replace('_','-')} {v}" for k, v in run_args.items()
                   if v not in (None, False) and k not in ("summary",))
        + "`",
        "",
        f"Total device self time: **{total_us/1e3:.1f} ms**",
        "",
        "| self ms | x | category | bound by | HBM GB/s | op |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows[:top_n]:
        t = float(r[idx["total_self_time"]] or 0)
        if t < 200:
            break
        expr = str(r[idx["hlo_op_expression"]])[:110].replace("|", "\\|")
        lines.append(
            f"| {t/1e3:.2f} | {r[idx['occurrences']]:.0f} "
            f"| {r[idx['category']]} | {r[idx['bound_by']]} "
            f"| {r[idx['measured_memory_bw']]:.0f} | `{expr}` |")
    from pathlib import Path

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
