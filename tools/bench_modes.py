#!/usr/bin/env python
"""Flagship tile-forward throughput under each eval mode (real TPU).

Measures the 512x512/batch-32 bf16 forward (the bench.py headline shape)
with: fused stages OFF, ON (bf16), int8 dynamic scales, int8 static
calibrated scales.  One JSON line per mode.

Usage: python tools/bench_modes.py [--modes bf16,fused,int8,int8cal]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="bf16,fused,int8,int8cal")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seg-stack", action="store_true",
                    help="stacked seg-conv dots in the fused kernels")
    ap.add_argument("--band-rows", type=int, default=0,
                    help="force the rolling-halo band height (0 = auto)")
    ap.add_argument("--halo-carry", action="store_true",
                    help="carry halo rows between bands (measured slower "
                         "bf16, neutral int8 — default recomputes)")
    ap.add_argument("--upsample-impl", default="einsum_hw",
                    choices=["einsum_hw", "shift_lerp"],
                    help="W-minor 2x bilinear H-interp lowering "
                         "(ops/wminor.py set_upsample_impl)")
    ap.add_argument("--lazy-upsample", action="store_true",
                    help="defer the decoder upsample H-interp to the "
                         "consuming kernel (upsample-on-read, UpTensor)")
    ap.add_argument("--trace", default="",
                    help="xprof trace dir for the timed loops (device "
                         "self-time via tools/trace_stats.py)")
    ap.add_argument("--arch", default="UNet_R_SS_v2",
                    help="registry arch to bench (e.g. UNet_B_SS for the "
                         "bneck eval kernel)")
    ap.add_argument("--pool-impl", default="",
                    choices=["", "reshape6", "shift_dot", "shift_slice"],
                    help="W-minor pool lowering A/B (ops/wminor.py)")
    ap.add_argument("--pair", default="auto", choices=["auto", "on", "off"],
                    help="pair-stacked conv dots for 2C<=128 stages "
                         "(ops/stage_kernel.set_pair_dots)")
    ap.add_argument("--bias-tile", default="auto",
                    choices=["auto", "on", "off"],
                    help="conv bias as (C, W) tile instead of a +1 K "
                         "column (ops/stage_kernel.set_bias_tile)")
    ap.add_argument("--lazy-pool", default="auto",
                    choices=["auto", "on", "off"],
                    help="pool-on-read encoder seams "
                         "(ops/wminor.set_lazy_pool)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.ops.stage_kernel import (
        set_band_rows,
        set_fused_stage,
        set_halo_carry,
        set_seg_stack,
    )
    from ssunet_gan_tpu.ops.stage_kernel_int8 import (
        set_int8_calibration,
        set_int8_stage,
    )
    from ssunet_gan_tpu.utils import jit_init

    if args.seg_stack:
        set_seg_stack(True)  # default: auto (int8-only — measured win)
    if args.band_rows:
        set_band_rows(args.band_rows)
    if args.halo_carry:
        set_halo_carry(True)
    if args.upsample_impl != "einsum_hw":
        from ssunet_gan_tpu.ops.wminor import set_upsample_impl

        set_upsample_impl(args.upsample_impl)
    if args.lazy_upsample:
        from ssunet_gan_tpu.ops.wminor import set_lazy_upsample

        set_lazy_upsample(True)
    if args.pool_impl:
        from ssunet_gan_tpu.ops.wminor import set_pool_impl

        set_pool_impl(args.pool_impl)
    if args.pair != "auto":
        from ssunet_gan_tpu.ops.stage_kernel import set_pair_dots

        set_pair_dots(args.pair == "on")
    if args.bias_tile != "auto":
        from ssunet_gan_tpu.ops.stage_kernel import set_bias_tile

        set_bias_tile(args.bias_tile == "on")
    if args.lazy_pool != "auto":
        from ssunet_gan_tpu.ops.wminor import set_lazy_pool

        set_lazy_pool(args.lazy_pool == "on")

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = build_model(args.arch, num_classes=3, input_channels=3)
    x0 = jnp.zeros((args.batch, args.tile, args.tile, 3), dtype)
    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)

    rng = np.random.default_rng(0)
    xh = rng.normal(size=x0.shape).astype(np.float32)
    x = jnp.asarray(xh, dtype)

    def timed(label):
        @jax.jit
        def forward(image):
            return jax.nn.sigmoid(model.apply(variables, image, False))

        jax.block_until_ready(forward(x))

        def loop():
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = forward(x)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        if args.trace:
            tdir = os.path.join(args.trace, label)
            with jax.profiler.trace(tdir):
                dt = loop()
        else:
            dt = loop()
        tps = args.batch * args.iters / dt
        print(json.dumps({"mode": label, "tiles_per_sec": round(tps, 2),
                          "ms_per_batch": round(1e3 * dt / args.iters, 2)}),
              flush=True)

    modes = args.modes.split(",")
    if "bf16" in modes:
        set_fused_stage(False); set_int8_stage(False)
        timed("bf16-unfused")
    if "fused" in modes:
        set_fused_stage(True); set_int8_stage(False)
        timed("bf16-fused")
    if "int8" in modes:
        set_fused_stage(True); set_int8_stage(True)
        timed("int8-dynamic")
    if "int8cal" in modes:
        from ssunet_gan_tpu.infer.calibrate import calibrate_int8

        set_fused_stage(True); set_int8_stage(False)
        calibrate_int8(model, variables, xh[:8], batch_size=8)
        set_int8_stage(True)
        timed("int8-calibrated")
        set_int8_calibration(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
