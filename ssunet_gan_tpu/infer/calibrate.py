"""Post-training int8 calibration (static activation scales).

The int8 fused stages (`ops/stage_kernel_int8.py`) default to DYNAMIC
per-tensor activation scales — an extra abs-max reduction pass over every
stage input (an HBM re-read of the largest tensors in the model) and
data-dependent numerics.  This module implements standard max-calibration
PTQ: one recording pass over representative tiles captures per-stage-input
abs-max ranges; installing them via
:func:`ops.stage_kernel_int8.set_int8_calibration` turns each quantize into
a single fused elementwise op with batch-independent numerics.

Capability parity target: the reference has no quantized path at all — this
is a TPU-native extension past its eval loop
(/root/reference/scripts/aerial_image_segmentation_api.py:376-390).

Recording works through the model dispatch (`models/ssunet.py`): when a
record sink is active, every SS stage runs the plain module composition and
writes its input abs-max *tracers* into the sink, which the jitted record
function returns as outputs — so one compiled forward per tile batch yields
all ranges at once.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import numpy as np

from ssunet_gan_tpu.ops.stage_kernel_int8 import (
    set_int8_calibration,
    set_record_sink,
)

SCALES_FILE = "int8_scales.json"


def record_activation_ranges(model, variables, tiles: np.ndarray,
                             batch_size: int = 16) -> Dict[str, float]:
    """One max-calibration pass: eval-forward ``tiles`` (N, H, W, C float32,
    already model-normalized) in fixed-size batches, return
    ``{"<stage>:<part>": abs_max}`` maxed over all batches.

    The batch is padded to a multiple of ``batch_size`` by repeating tile 0
    (repeats cannot raise a max), so the record forward compiles once.
    """

    def fn(vs, x):
        sink: Dict = {}
        set_record_sink(sink)
        try:
            model.apply(vs, x, False)
        finally:
            set_record_sink(None)
        return sink

    fwd = jax.jit(fn)

    n = len(tiles)
    if n == 0:
        raise ValueError("calibration needs at least one tile")
    pad = (-n) % batch_size
    if pad:
        tiles = np.concatenate([tiles, np.repeat(tiles[:1], pad, axis=0)])

    ranges: Dict[str, float] = {}
    for i in range(0, len(tiles), batch_size):
        out = jax.device_get(fwd(variables, jax.numpy.asarray(tiles[i : i + batch_size])))
        for k, v in out.items():
            v = float(v)
            if k not in ranges or v > ranges[k]:
                ranges[k] = v
    if not ranges:
        raise ValueError(
            "model recorded no stage inputs — is it an SS-family arch?"
        )
    return ranges


def save_calibration(model_dir: str, scales: Dict[str, float]) -> str:
    """Write the scales next to the model card (loaded automatically by
    :func:`infer.api.load_segmentation_models` when ``int8`` is set)."""
    path = os.path.join(model_dir, SCALES_FILE)
    with open(path, "wt") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1,
                  sort_keys=True)
    return path


def load_calibration(model_dir: str) -> Optional[Dict[str, float]]:
    path = os.path.join(model_dir, SCALES_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rt") as f:
        return {k: float(v) for k, v in json.load(f).items()}


def calibrate_int8(model, variables, tiles: np.ndarray,
                   model_dir: Optional[str] = None,
                   batch_size: int = 16) -> Dict[str, float]:
    """Record ranges, install them as the active static scales, and
    optionally persist them to ``model_dir``.  Returns the scales."""
    scales = record_activation_ranges(model, variables, tiles, batch_size)
    set_int8_calibration(scales)
    if model_dir is not None:
        save_calibration(model_dir, scales)
    return scales
