#!/usr/bin/env python
"""AOT serving export: compile + serialize the enhancement graphs with jax.export.

Produces deployable StableHLO artifacts (weights baked in) for:
  - the offline batched enhance graph  (enhance_bBATCH_tSAMPLES.jaxexp)
  - the streaming per-chunk step       (streaming_step_bBATCH_cfCHUNK.jaxexp)
plus a manifest.json recording shapes/dtypes/sample-rate/platforms, and a
--check mode that deserializes each artifact and verifies it against the
live graph. A serving process then needs only `jax.export.deserialize` +
`.call` — no model code, no checkpoint loading, no retracing.

The reference has no serving-export story (its deployment artifact is a raw
torch checkpoint, model_zoo/); this is the TPU-native equivalent of the
leaderboard's 8 ms-hop serving contract (BASELINE.md latency rows).

Usage:
  python tools/export_serving.py -O exported/ [--npz model_zoo/.../baseline_m.npz]
      [--what offline streaming] [--batch 1] [--chunk_frames 1]
      [--seconds 30] [--platforms tpu] [--check]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_bundle(npz_path=None, **overrides):
    from spiking_fullsubnet_tpu.models.presets import flagship_m as _flagship_bundle

    bundle = _flagship_bundle(**overrides)
    if npz_path:
        from spiking_fullsubnet_tpu.runtime.convert import load_npz

        bundle["params"] = load_npz(npz_path, bundle["params"])
    return bundle


def export_offline(bundle, batch: int, seconds: float, sr: int, platforms):
    import jax
    import jax.numpy as jnp

    cfg, apply_fn = bundle["config"], bundle["apply"]
    params, state = bundle["params"], bundle["state"]

    def enhance(noisy):
        return apply_fn(cfg, params, state, noisy, train=False)["enhanced_y"]

    example = jnp.zeros((batch, int(seconds * sr)), jnp.float32)
    exported = jax.export.export(jax.jit(enhance), platforms=platforms)(example)
    return exported, example


def export_streaming(bundle, batch: int, chunk_frames: int, platforms):
    import jax
    import jax.numpy as jnp

    from spiking_fullsubnet_tpu.streaming import StreamingEnhancer

    cfg = bundle["config"]
    enhancer = StreamingEnhancer(
        cfg, bundle["params"], bundle["state"], batch_size=batch, chunk_frames=chunk_frames
    )
    state = enhancer.init_state()
    chunk = jnp.zeros((batch, chunk_frames * cfg.hop_length), jnp.float32)
    exported = jax.export.export(jax.jit(enhancer._chunk_step), platforms=platforms)(state, chunk)
    return exported, enhancer, state, chunk


def roundtrip_check(blob: bytes, args, reference_out, atol=0.0):
    """Deserialize and run the artifact; compare against the live graph."""
    import jax

    restored = jax.export.deserialize(blob)
    got = restored.call(*args)
    ref_flat = jax.tree_util.tree_leaves(reference_out)
    got_flat = jax.tree_util.tree_leaves(got)
    assert len(ref_flat) == len(got_flat)
    for r, g in zip(ref_flat, got_flat):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=atol, rtol=0)
    return restored


def main():
    import jax

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-O", "--output_dir", required=True)
    p.add_argument("--npz", default=None, help="framework .npz weights (tools/convert_checkpoint.py)")
    p.add_argument("--what", nargs="+", default=["offline", "streaming"],
                   choices=["offline", "streaming"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--chunk_frames", type=int, default=1)
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering targets, e.g. tpu cpu (default: current backend)")
    p.add_argument("--scan_mode", default="fused",
                   help="execution strategy baked into the artifact (fused = "
                        "one scan over frames, the best serving graph)")
    p.add_argument("--check", action="store_true", help="deserialize + verify vs live graph")
    args = p.parse_args()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    platforms = args.platforms or [jax.default_backend()]

    # Pallas kernels only lower for TPU targets; force the portable scan
    # when any requested platform is not TPU (the live backend may be TPU).
    backend = "auto" if all(plat == "tpu" for plat in platforms) else "scan"
    if backend == "auto" and jax.default_backend() not in ("tpu", "axon"):
        # backend="auto" resolves against the LIVE backend at trace time, so a
        # CPU host would silently bake the portable scan into a "tpu" artifact.
        print(
            "WARNING: --platforms tpu requested from a non-TPU host "
            f"(live backend: {jax.default_backend()}); the artifact will bake "
            "the portable scan path, not the Pallas TPU kernels. Re-export on "
            "a TPU host for the production execution path."
        )
        backend = "scan"
    bundle = build_bundle(args.npz, scan_mode=args.scan_mode, backend=backend)
    cfg = bundle["config"]
    manifest = {
        "sample_rate": args.sr,
        "hop_length": cfg.hop_length,
        "n_fft": cfg.n_fft,
        "platforms": platforms,
        "jax_version": jax.__version__,
        "weights": args.npz or "fresh-init",
        "artifacts": {},
    }

    if "offline" in args.what:
        exported, example = export_offline(bundle, args.batch, args.seconds, args.sr, platforms)
        name = f"enhance_b{args.batch}_t{example.shape[1]}.jaxexp"
        blob = exported.serialize()
        (out_dir / name).write_bytes(blob)
        manifest["artifacts"]["offline"] = {
            "file": name,
            "input": {"shape": list(example.shape), "dtype": "float32"},
            "output": "enhanced [batch, samples] float32",
            "bytes": len(blob),
        }
        if args.check:
            apply_fn, params, state = bundle["apply"], bundle["params"], bundle["state"]
            ref = apply_fn(cfg, params, state, example, train=False)["enhanced_y"]
            roundtrip_check(blob, (example,), ref)
            print(f"offline: roundtrip check OK ({name})")

    if "streaming" in args.what:
        exported, enhancer, state, chunk = export_streaming(
            bundle, args.batch, args.chunk_frames, platforms)
        name = f"streaming_step_b{args.batch}_cf{args.chunk_frames}.jaxexp"
        blob = exported.serialize()
        (out_dir / name).write_bytes(blob)
        # Initial-state template: a serving process has no model code, so ship
        # the zero-valued init state as an .npz of leaves (path -> array). The
        # artifact's in_tree rebuilds the pytree from these leaves in order.
        import jax.numpy as jnp  # noqa: F401 (jax already imported)
        from jax.tree_util import tree_flatten_with_path, keystr

        leaves, _ = tree_flatten_with_path(state)
        state_name = f"streaming_init_state_b{args.batch}.npz"
        np.savez(out_dir / state_name,
                 **{keystr(path): np.asarray(leaf) for path, leaf in leaves})
        manifest["artifacts"]["streaming"] = {
            "file": name,
            "chunk_samples": int(chunk.shape[1]),
            "latency_budget_ms": args.chunk_frames * cfg.hop_length / args.sr * 1e3,
            "state": "pytree; initial value shipped as init_state_file "
                     "(flattened leaves in tree order) — thread the step's "
                     "returned state back in",
            "init_state_file": state_name,
            "init_state_leaves": [
                {"path": keystr(path), "shape": list(np.shape(leaf)),
                 "dtype": str(np.asarray(leaf).dtype)}
                for path, leaf in leaves
            ],
            "bytes": len(blob),
        }
        if args.check:
            ref = enhancer.step(state, chunk)
            roundtrip_check(blob, (state, chunk), ref)
            print(f"streaming: roundtrip check OK ({name})")

    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"Wrote {len(manifest['artifacts'])} artifact(s) + manifest.json to {out_dir}")


if __name__ == "__main__":
    main()
