"""Microbenchmark: GSU layer recurrence — XLA scan vs Pallas kernel.

Run on the live accelerator:
    python tools/bench_gsu_kernel.py [--t-blk 8 16 32] [--batch 64] [--time 512]

Uses the chained on-device timing protocol (runtime/timing.py) — plain
block_until_ready timing is unreliable over tunneled backends. Prints
us/frame per configuration plus the model-shape roofline context.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--time", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=320)
    ap.add_argument("--input", type=int, default=320)
    ap.add_argument("--t-blk", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--shared", action=argparse.BooleanOptionalAction, default=True,
                    help="--shared / --no-shared gate-cell weight tying")
    ap.add_argument("--train", action="store_true",
                    help="also benchmark the value_and_grad training path")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    args = ap.parse_args()

    from spiking_fullsubnet_tpu.ops.gsu import gsu_stack_apply, gsu_stack_init
    from spiking_fullsubnet_tpu.ops.gsu_pallas import gsu_layer_pallas
    from spiking_fullsubnet_tpu.runtime.timing import time_fn_per_iter

    T, B, H, F = args.time, args.batch, args.hidden, args.input
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, F), dtype=np.float32)).astype(dtype)

    params, state = gsu_stack_init(
        jax.random.PRNGKey(0), input_size=F, hidden_size=H, num_layers=1,
        shared_weights=args.shared, bn=False,
    )
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    def scan_fwd(p, x):
        return gsu_stack_apply(p, state, x, hidden_size=H,
                               shared_weights=args.shared, train=False)[0]

    dt = time_fn_per_iter(scan_fwd, (params, x))
    print(f"scan fwd:            {dt*1e6/T:8.3f} us/frame   total {dt*1e3:.2f} ms")
    ref = jax.jit(scan_fwd)(params, x)

    lp = params["layers"][0]

    for t_blk in args.t_blk:
        try:
            def pallas_fwd(p, x, t_blk=t_blk):
                lp = p["layers"][0]
                xg = jnp.einsum("tbf,gf->tbg", x, lp["weight_ih"],
                                preferred_element_type=jnp.float32)
                return gsu_layer_pallas(xg, lp["weight_hh"], lp["bias_ih"],
                                        H, args.shared, t_blk=t_blk)
            out = jax.jit(pallas_fwd)(params, x)
            err = float(jnp.max(jnp.abs(np.asarray(out) - np.asarray(ref))))
            dt = time_fn_per_iter(pallas_fwd, (params, x))
            print(f"pallas fwd t_blk={t_blk:3d}: {dt*1e6/T:8.3f} us/frame   "
                  f"total {dt*1e3:.2f} ms   max|diff|={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas fwd t_blk={t_blk:3d}: FAILED ({type(e).__name__}: {str(e)[:200]})")

    if args.train:
        def scan_loss(p, x):
            out = gsu_stack_apply(p, state, x, hidden_size=H,
                                  shared_weights=args.shared, train=True)[0]
            return jnp.sum(out * out)

        def scan_grad(p, x):
            return jax.grad(scan_loss)(p, x)

        dt = time_fn_per_iter(scan_grad, (params, x))
        print(f"scan  grad:          {dt*1e6/T:8.3f} us/frame   total {dt*1e3:.2f} ms")

        for t_blk in args.t_blk:
            try:
                def pallas_loss(p, x, t_blk=t_blk):
                    lp = p["layers"][0]
                    xg = jnp.einsum("tbf,gf->tbg", x, lp["weight_ih"],
                                    preferred_element_type=jnp.float32)
                    out = gsu_layer_pallas(xg, lp["weight_hh"], lp["bias_ih"],
                                           H, args.shared, t_blk=t_blk)
                    return jnp.sum(out * out)

                def pallas_grad(p, x, t_blk=t_blk):
                    return jax.grad(pallas_loss)(p, x)

                jax.jit(pallas_grad)(params, x)
                dt = time_fn_per_iter(pallas_grad, (params, x))
                print(f"pallas grad t_blk={t_blk:3d}: {dt*1e6/T:8.3f} us/frame   "
                      f"total {dt*1e3:.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"pallas grad t_blk={t_blk:3d}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
