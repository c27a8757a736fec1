"""Headline benchmark: sliding-window tile inference throughput.

The reference's whole-scene inference runs one 512×512 patch per forward in
a batch=1 Python loop (aerial_image_segmentation_api.py:386-390) — SURVEY.md
§3 hot-loop rank 2.  The TPU rebuild batches tiles through the jitted
flagship forward.  North star (BASELINE.json): ≥ 2,000 512×512 tiles/sec
per chip on the flagship ``UNet_R_SS_v2``.

Prints ONE JSON line:
    {"metric": "tiles_per_sec_512", "value": N, "unit": "tiles/s", "vs_baseline": N/2000}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_TILES_PER_SEC = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model

    on_tpu = jax.devices()[0].platform == "tpu"
    # CPU fallback keeps the harness runnable anywhere; numbers only matter on TPU
    tile = 512 if on_tpu else 64
    batch = 32 if on_tpu else 2
    iters = 10 if on_tpu else 2

    from ssunet_gan_tpu.utils import jit_init

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    x0 = jnp.zeros((batch, tile, tile, 3), jnp.bfloat16 if on_tpu else jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)

    @jax.jit
    def forward(image):
        logits = model.apply(variables, image, False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32), dtype=x0.dtype)

    jax.block_until_ready(forward(x))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "tiles_per_sec_512" if on_tpu else "tiles_per_sec_cpu_smoke",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
