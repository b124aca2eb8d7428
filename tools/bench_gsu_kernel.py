"""Microbenchmark: GSU layer recurrence — XLA scan vs Pallas kernel.

Run on the live accelerator:
    python tools/bench_gsu_kernel.py [--t-blk 8 16 32] [--batch 64] [--time 512]

Prints per-config us/frame so kernel work can be judged against the scan
baseline (see COVERAGE.md "Known gaps").
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--time", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=320)
    ap.add_argument("--input", type=int, default=320)
    ap.add_argument("--t-blk", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--shared", action="store_true", default=True)
    args = ap.parse_args()

    from spiking_fullsubnet_tpu.ops.gsu import gsu_stack_apply, gsu_stack_init
    from spiking_fullsubnet_tpu.ops.gsu_pallas import gsu_layer_pallas_eval

    T, B, H, F = args.time, args.batch, args.hidden, args.input
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, F), dtype=np.float32))

    params, state = gsu_stack_init(
        jax.random.PRNGKey(0), input_size=F, hidden_size=H, num_layers=1,
        shared_weights=args.shared, bn=False,
    )

    scan = jax.jit(
        lambda p, s, x: gsu_stack_apply(p, s, x, hidden_size=H, shared_weights=args.shared, train=False)[0]
    )
    dt, ref = timeit(scan, params, state, x)
    print(f"scan:            {dt*1e6/T:8.2f} us/frame   total {dt*1e3:.2f} ms")

    lp = params["layers"][0]
    xg = jnp.einsum("tbf,gf->tbg", x, lp["weight_ih"])

    for t_blk in args.t_blk:
        try:
            pk = jax.jit(
                lambda xg, w, b: gsu_layer_pallas_eval(
                    xg, w, b, H, args.shared, t_blk=t_blk
                )
            )
            dt, out = timeit(pk, xg, lp["weight_hh"], lp["bias_ih"])
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"pallas t_blk={t_blk:3d}: {dt*1e6/T:8.2f} us/frame   total {dt*1e3:.2f} ms   max|diff|={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas t_blk={t_blk:3d}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
