#!/usr/bin/env python
"""Flagship supervised train-step throughput (real TPU).

Measures the b=8 bf16 @512² train step (the BASELINE.md "Training" config)
under the XLA composition and/or the fused train kernels. Wall clock is
synced per step on the FULL step output (blocking on the loss scalar alone
collapses through the axon relay — see timed_steps); pass ``--trace DIR``
to also capture an xprof trace of the timed section (device self-time is
the number of record — CLAUDE.md: the relay under-reports chained
dispatch).

Usage: python tools/bench_train.py [--modes xla,fused] [--steps 10]
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
    ap.add_argument("--modes", default="xla,fused")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trace", default="")
    ap.add_argument("--lookahead", default="", choices=("", "on", "off"))
    ap.add_argument("--gan", action="store_true",
                    help="bench the adversarial G+D step (train_seg_gan.py:"
                         "167-233 hot loop) instead of the supervised step")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.ops.losses import bce_dice_loss
    from ssunet_gan_tpu.ops.stage_kernel_train import set_fused_train
    from ssunet_gan_tpu.train.optim import build_optimizer
    from ssunet_gan_tpu.train.state import TrainState
    from ssunet_gan_tpu.train.step import make_train_step
    from ssunet_gan_tpu.utils import jit_init

    if args.lookahead:
        from ssunet_gan_tpu.ops.stage_kernel import set_lookahead

        set_lookahead(args.lookahead == "on")

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.batch, args.size, args.size, 3)), dtype
    )
    y = jnp.asarray(
        (rng.random((args.batch, args.size, args.size, 3)) > 0.5), jnp.float32
    )
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-4, "weight_decay": 1e-7})

    def build_step(fused):
        """(state(s), jitted step closure) for the selected hot loop."""
        if not args.gan:
            variables = jit_init(model, jax.random.PRNGKey(0), x, train=True)
            state = TrainState.create(variables, tx)
            sup = jax.jit(make_train_step(model, bce_dice_loss, tx, 3, clip=0.8))

            def step(s, lr):
                return sup(s, (x, y), lr)

            return state, step

        from ssunet_gan_tpu.models.gan import Discriminator
        from ssunet_gan_tpu.train.gan_step import make_gan_train_step

        disc = Discriminator(num_classes=3, kernel_size=3, n_channels=64,
                             n_blocks=8, fc_size=1024)
        tx_d = build_optimizer(
            {"optimizer": "Adam", "lr": 2e-5, "weight_decay": 0.0}
        )
        g_vars = jit_init(model, jax.random.PRNGKey(0), x, train=True)
        d_vars = jit_init(disc, jax.random.PRNGKey(1), y, train=True)
        g_state = TrainState.create(g_vars, tx)
        d_state = TrainState.create(d_vars, tx_d)
        gan = jax.jit(make_gan_train_step(model, disc, bce_dice_loss, tx, tx_d, 3))

        def step(s, lr):
            g, d = s
            g, d, m = gan(g, d, (x, y), lr)
            return (g, d), m

        return (g_state, d_state), step

    def run(label, fused):
        set_fused_train(fused)
        state, step = build_step(fused)
        lr = jnp.float32(1e-4)
        state, metrics = step(state, lr)  # compile + warm
        # block on the whole warm-up output (see timed_steps): the loss
        # buffer alone is ready before the param updates finish, which would
        # let the warm-up tail bleed into the first timed step
        jax.block_until_ready((state, metrics))

        def timed_steps(s):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, m = step(s, lr)
                # Block on the WHOLE step output, not just the loss scalar:
                # XLA schedules the loss write early in the program, and the
                # axon relay marks that buffer ready before the param updates
                # finish — blocking on it alone lets steps pipeline and the
                # wall clock collapse (measured: a ~120 ms step "takes" 2.7
                # ms). Device traces (--trace + tools/trace_stats.py) remain
                # the numbers of record regardless.
                jax.block_until_ready((s, m))
            return s, time.perf_counter() - t0

        if args.trace:
            tdir = os.path.join(args.trace, label)
            with jax.profiler.trace(tdir):
                state, dt = timed_steps(state)
        else:
            state, dt = timed_steps(state)
        ms = 1e3 * dt / args.steps
        print(json.dumps({
            "mode": ("gan_" if args.gan else "") + label,
            "ms_per_step": round(ms, 1),
            "img_per_sec": round(args.batch / (dt / args.steps), 2),
            "loss": round(float(metrics["loss"]), 4),
        }), flush=True)
        set_fused_train(None)

    modes = args.modes.split(",")
    if "xla" in modes:
        run("xla", False)
    if "fused" in modes:
        run("fused", True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
