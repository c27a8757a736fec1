"""Headline benchmark: sliding-window tile inference throughput.

The reference's whole-scene inference runs one 512×512 patch per forward in
a batch=1 Python loop (aerial_image_segmentation_api.py:386-390) — SURVEY.md
§3 hot-loop rank 2.  The TPU rebuild batches tiles through the jitted
flagship forward.  North star (BASELINE.json): ≥ 2,000 512×512 tiles/sec
per chip on the flagship ``UNet_R_SS_v2``.

Prints PROGRESSIVE JSON lines — one complete JSON object per finished leg,
each a superset of the previous — so the driver (which reads the last
parseable line of the tail) gets the headline number the moment the first
timed loop completes, even if later legs are cut off by the harness budget:

    {"metric": "tiles_per_sec_512", "value": N, "unit": "tiles/s",
     "vs_baseline": N/2000}                                    ← leg 1
    {..., "int8_tiles_per_sec": M}                             ← leg 2
    {..., "scene_e2e_s": S, "scene_px_per_sec": P, ...}        ← leg 3

Legs 2 (int8 PTQ) and 3 (whole-scene e2e) are best-effort: they are skipped
when the internal soft deadline (SSUNET_GAN_TPU_BENCH_DEADLINE, default
300 s) approaches and their errors never lose leg 1's number.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_TILES_PER_SEC = 2000.0
_T0 = time.monotonic()
# r5: the soft deadline moved 300 -> 480 s and the watchdog 420 -> 660:
# the warm path's leg count grew (s8 pool-on-read kernels + the scene
# legs' u8/bf16 forwards) and the r4 420 s watchdog left leg 3 honestly
# skipped on warm caches. The headline still streams out first (~4 min
# warm), so any outer kill preserves the latest good line.
_DEADLINE = float(os.environ.get("SSUNET_GAN_TPU_BENCH_DEADLINE", "480"))


def _time_left() -> float:
    return _DEADLINE - (time.monotonic() - _T0)


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.utils import jit_init

    on_tpu = jax.devices()[0].platform == "tpu"
    # CPU fallback keeps the harness runnable anywhere; numbers only matter on TPU
    tile = 512 if on_tpu else 64
    batch = 32 if on_tpu else 2
    iters = 10 if on_tpu else 2

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    x0 = jnp.zeros((batch, tile, tile, 3), jnp.bfloat16 if on_tpu else jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)

    @jax.jit
    def forward(image):
        logits = model.apply(variables, image, False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(0)
    xh = rng.normal(size=x0.shape).astype(np.float32)
    x = jnp.asarray(xh, dtype=x0.dtype)

    jax.block_until_ready(forward(x))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * iters / dt
    result = {
        "metric": "tiles_per_sec_512" if on_tpu else "tiles_per_sec_cpu_smoke",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 4),
    }
    _emit(result)  # ← headline out, whatever happens next

    # leg 2 — opt-in int8 eval mode (static max-calibration PTQ): the
    # quantized counterpart of the headline number, reported separately
    # because it is an approximation (accuracy bars: tools/accuracy_bar.py)
    # the int8 leg stacks calibration (a composition-forward compile) +
    # the s8 forward compile: ~3-4 min cold over the tunnel. Attempting it
    # without that headroom ends with the parent watchdog SIGTERMing the
    # child mid-TPU-op — which can wedge the axon tunnel for every later
    # process (CLAUDE.md) — so skip honestly unless it can actually finish.
    # gate 90 s (was 150): the watchdog grace (660 − 480 = 180 s) lets a
    # leg started at the gate finish warm; cold runs still skip honestly
    if on_tpu and _time_left() > 90:
        try:
            from ssunet_gan_tpu.infer.calibrate import calibrate_int8
            from ssunet_gan_tpu.ops.stage_kernel_int8 import (
                set_int8_calibration,
                set_int8_stage,
            )

            calibrate_int8(model, variables, xh[:8], batch_size=8)
            _CAL["ready"] = True  # leg 3 reuses the installed scales
            set_int8_stage(True)

            @jax.jit
            def forward_int8(image):
                return jax.nn.sigmoid(model.apply(variables, image, False))

            jax.block_until_ready(forward_int8(x))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = forward_int8(x)
            jax.block_until_ready(out)
            result["int8_tiles_per_sec"] = round(
                batch * iters / (time.perf_counter() - t0), 2
            )
        except Exception as exc:  # best-effort: never lose the headline
            result["int8_error"] = f"{type(exc).__name__}: {exc}"[:160]
        finally:
            try:
                # int8 mode off, but KEEP the calibration scales installed —
                # the scene leg's int8 sub-measure reuses them
                set_int8_stage(False)
            except Exception:
                pass
        _emit(result)
    elif on_tpu:
        result["int8_skipped"] = "deadline"
        _emit(result)

    # leg 3 — whole-scene end-to-end (same honest-skip rule as leg 2)
    if _time_left() > 60:
        try:
            result.update(bench_scene(model, variables, on_tpu))
        except Exception as exc:
            result["scene_error"] = f"{type(exc).__name__}: {exc}"[:160]
        _emit(result)
    else:
        result["scene_skipped"] = "deadline"
        _emit(result)


_CAL = {"ready": False}


def bench_scene(model, variables, on_tpu):
    """Whole-scene inference, decomposed so the device pipeline has a
    tunnel-insensitive regression metric (r2 VERDICT weak #6b):

    - ``scene_host_s``   — host patch-extract + resize (cv2/native, threaded)
    - ``scene_h2d_s``    — uint8 tile transfer to HBM
    - ``scene_device_s`` — device-only: fused normalize → chunked forward →
      scatter-add merge, on pre-staged tiles (block_until_ready-bounded)
    - ``scene_e2e_s``    — the overlapped pipeline (pipelined_scene_forward:
      chunk-granular prep/H2D/compute overlap) + merge, wall clock

    D2H of the merged canvas is excluded everywhere — the axon dev tunnel's
    ~3 MB/s would swamp it; on a real host it's DMA."""
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.data.tiling import grid_coords, merge_patches_device
    from ssunet_gan_tpu.infer.api import (
        INFER_BATCH,
        _get_forward,
        patch_and_preprocess,
        pipelined_scene_forward,
    )

    side = 4096 if on_tpu else 256
    config = {
        "patch_size": 1024 if on_tpu else 64,
        "input_h": 512 if on_tpu else 64,
        "input_w": 512 if on_tpu else 64,
        "patch_overlap": 0.5,
        "num_classes": 3,
        "deep_supervision": False,
    }
    rng = np.random.default_rng(1)
    scene = rng.integers(0, 255, (side, side, 3), np.uint8)
    coords = grid_coords(side, side, config["patch_size"], config["patch_overlap"])

    # -- decomposed components (serial, each bounded by block_until_ready) --
    t0 = time.perf_counter()
    patches, _ = patch_and_preprocess(scene, scene, config, raw_uint8=True)
    host_s = time.perf_counter() - t0

    # the device leg runs the BENCHED eval configuration: bf16 activations
    # (accuracy bars: ΔIoU −0.0002, BASELINE.md) with the forward emitting
    # floor-quantized uint8 probs — the merge's own first step, so results
    # are identical while the prob tensor moves 4× fewer bytes. The merge
    # output stays device-resident (the leg's contract excludes D2H).
    dev_dtype = jnp.bfloat16 if on_tpu else None
    fwd, dev_vars = _get_forward(model, variables, None, normalize=True,
                                 dtype=dev_dtype, quantize_probs=True)
    n = len(patches)
    pad = (-n) % INFER_BATCH
    if pad:
        patches = np.concatenate([patches, np.zeros_like(patches[:pad])])
    chunks = [patches[i : i + INFER_BATCH] for i in range(0, len(patches), INFER_BATCH)]

    def h2d():
        dev = [jnp.asarray(c) for c in chunks]
        jax.block_until_ready(dev)
        return dev

    def device_only(dev, f, dv):
        probs = jnp.concatenate([f(dv, c) for c in dev])[:n]
        merged = merge_patches_device(
            probs, coords, side, side, config["patch_size"],
            config["num_classes"], overlap=config["patch_overlap"],
            return_device=True,
        )
        jax.block_until_ready(merged)

    dev = h2d()
    device_only(dev, fwd, dev_vars)  # cold: compiles forward + merge
    t0 = time.perf_counter()
    device_only(dev, fwd, dev_vars)
    device_s = time.perf_counter() - t0

    # int8 scene sub-leg: reuse leg 2's calibration (kernel-to-kernel s8
    # flow through the same uint8-prob merge)
    int8_device_s = None
    if on_tpu and _CAL.get("ready") and _time_left() > 90:
        try:
            from ssunet_gan_tpu.ops.stage_kernel_int8 import set_int8_stage

            set_int8_stage(True)
            fwd8, dev_vars8 = _get_forward(
                model, variables, None, normalize=True, dtype=dev_dtype,
                quantize_probs=True)
            device_only(dev, fwd8, dev_vars8)  # compile
            t0 = time.perf_counter()
            device_only(dev, fwd8, dev_vars8)
            int8_device_s = time.perf_counter() - t0
        except Exception:
            pass
        finally:
            from ssunet_gan_tpu.ops.stage_kernel_int8 import set_int8_stage

            set_int8_stage(False)
    del dev
    t0 = time.perf_counter()
    dev = h2d()
    h2d_s = time.perf_counter() - t0
    del dev

    # -- overlapped end-to-end pipeline --
    def run_e2e():
        t0 = time.perf_counter()
        probs, cds, p_size = pipelined_scene_forward(
            model, variables, scene, config, dtype=dev_dtype,
            quantize_probs=True)
        merged = merge_patches_device(
            probs, cds, side, side, p_size, config["num_classes"],
            overlap=config["patch_overlap"], return_device=True,
        )
        jax.block_until_ready(merged)
        return time.perf_counter() - t0

    run_e2e()  # warm the pipelined-forward cache entry
    # best-of-2 warm runs: the dev tunnel's H2D throughput fluctuates and
    # dominates e2e in the sandbox (BASELINE.md); min is the stabler
    # estimate. Collapse to one run when the deadline is close.
    e2e_s = run_e2e()
    if _time_left() > 30:
        e2e_s = min(e2e_s, run_e2e())
    out = {
        "scene_e2e_s": round(e2e_s, 3),
        "scene_px_per_sec": round(side * side / e2e_s, 0),
        "scene_host_s": round(host_s, 3),
        "scene_h2d_s": round(h2d_s, 3),
        "scene_device_s": round(device_s, 3),
    }
    if int8_device_s is not None:
        out["scene_device_int8_s"] = round(int8_device_s, 3)
    return out


def _watchdog_main() -> None:
    """Run the real bench in a child, streaming its JSON lines through.

    The axon dev tunnel can wedge for hours after any process dies mid-
    TPU-op (CLAUDE.md); a wedged backend hangs in C++ device init where no
    Python-level recovery is possible. The child prints one complete JSON
    line per finished leg; the parent forwards each line the moment it
    appears — so the driver's captured tail always holds the latest good
    result even if the harness kills this process mid-leg (the r3 failure
    mode: rc=124 with an empty tail). On its own deadline the parent emits
    an honest zero-valued error line if the child produced nothing.
    Deadline 420 s > the child's internal soft deadline (300 s), which
    skips optional legs rather than dying.
    """
    import subprocess
    import sys
    import tempfile
    import threading

    env = dict(os.environ, SSUNET_GAN_TPU_BENCH_CHILD="1")
    deadline = float(env.get("SSUNET_GAN_TPU_BENCH_WATCHDOG", "660"))

    # Pre-flight: a fresh TPU client started while the previous one's
    # device lease is still releasing hangs FOREVER in C++ device init
    # (observed repeatedly on the axon tunnel — back-to-back bench runs
    # alternate between working and hanging). Probe with tiny disposable
    # subprocesses until one sees the backend; killing a probe stuck in
    # device INIT is not a mid-op kill, so it carries no wedge risk.
    probe_src = (
        "import jax; d = jax.devices(); "
        "import jax.numpy as jnp; "
        "jnp.ones((8, 8)).block_until_ready(); print('ready')"
    )
    for attempt in range(4):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src], env=dict(os.environ),
                capture_output=True, text=True, timeout=75,
            )
            if "ready" in (r.stdout or ""):
                break
        except subprocess.TimeoutExpired:
            pass
        time.sleep(20)

    stderr_f = tempfile.TemporaryFile(mode="w+")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=stderr_f,
        text=True, bufsize=1,
    )
    got_line = []

    def pump():
        for line in proc.stdout:
            line = line.rstrip()
            if line.startswith("{"):
                got_line.append(line)
                print(line, flush=True)

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    timed_out = False
    try:
        proc.wait(timeout=deadline)
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    th.join(timeout=10)

    if got_line:
        return  # lines already streamed; last one is the driver's result
    if timed_out:
        msg = "deadline exceeded (TPU backend unavailable / tunnel wedged)"
    else:
        stderr_f.seek(0)
        detail = stderr_f.read().strip().splitlines()
        msg = detail[-1][:200] if detail else f"rc={proc.returncode}"
    print(json.dumps({
        "metric": "tiles_per_sec_512", "value": 0, "unit": "tiles/s",
        "vs_baseline": 0.0, "error": msg,
    }), flush=True)


if __name__ == "__main__":
    if os.environ.get("SSUNET_GAN_TPU_BENCH_CHILD"):
        main()
    else:
        _watchdog_main()
