"""Small shared utilities (reference: /root/reference/scripts/utils.py).

``AverageMeter`` (utils.py:58-74), ``str2bool`` (utils.py:45-51),
``count_params`` (utils.py:54-55) and deterministic seeding
(train.py:35-41 — where the reference's ``cudnn.deerministic`` typo meant
determinism was never actually enabled; JAX is deterministic by default,
so here seeding actually works).
"""

from __future__ import annotations

import argparse
import random
from typing import Any

import jax
import numpy as np


class AverageMeter:
    """Computes and stores the running average of a scalar series."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def str2bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "1"):
        return True
    if str(v).lower() in ("false", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def jit_init(model, key, *sample_args, train: bool = True):
    """``model.init`` under ``jit``.

    Eager flax init dispatches each op individually — minutes of overhead on
    a 1-core host or across the axon TPU tunnel.  Under jit it is one
    compile + one execution.  ``train`` is closed over (it selects Python
    control flow, so it must be trace-static).
    """
    return jax.jit(lambda k, *a: model.init(k, *a, train))(key, *sample_args)


def count_params(params) -> int:
    """Total number of parameters in a pytree (utils.py:54-55)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def seed_everything(torch_seed: int = 41, numpy_seed: int = 101) -> jax.Array:
    """Mirror the reference's seeding (train.py:35-39: torch=41, numpy/random=101).

    Returns the root JAX PRNG key (seeded with the reference's model seed).
    """
    np.random.seed(numpy_seed)
    random.seed(numpy_seed)
    return jax.random.PRNGKey(torch_seed)


def adjust_brightness(img: np.ndarray, target_v: int = 90) -> np.ndarray:
    """HSV V-channel renormalisation to a target mean (utils.py:5-42).

    BGR uint8 in, BGR uint8 out; shifts the V channel so its mean becomes
    ``target_v`` (the reference hardcodes 90), clipping to [1, 255].
    """
    import cv2

    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    h, s, v = cv2.split(hsv)
    diff = target_v - float(np.average(v))
    v = np.clip(np.round(v.astype(np.float64) + diff), 1, 255).astype(np.uint8)
    return cv2.cvtColor(cv2.merge((h, s, v)), cv2.COLOR_HSV2BGR)
