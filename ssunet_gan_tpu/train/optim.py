"""Optimizers and LR schedulers with exact torch semantics.

The reference builds torch ``Adam``/``SGD`` (train.py:295-301) and — only
when the optimizer is SGD — one of four schedulers stepped once per epoch
(train.py:303-320, 426-432).  Torch-parity notes:

- torch ``weight_decay`` is **L2 regularization** (``grad += wd·p`` before
  the moment updates), *not* AdamW decoupled decay — so the decay transform
  precedes the moment transform in the optax chain;
- Adam defaults: betas (0.9, 0.999), eps 1e-8;
- SGD momentum uses torch's ``buf = μ·buf + grad`` accumulator (optax
  ``trace``, not EMA), with optional Nesterov.

The learning rate is injected **per call** (the train step takes ``lr`` as a
scalar argument and scales the final updates), so per-epoch scheduler moves
never trigger recompilation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax


def build_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    """Build the update transform (lr applied separately; see module doc).

    Mirrors train.py:295-301; raises NotImplementedError on unknown
    optimizers like the reference.
    """
    wd = float(config.get("weight_decay", 0.0) or 0.0)
    name = config["optimizer"]
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    if name == "Adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "SGD":
        mom = float(config.get("momentum", 0.0) or 0.0)
        if mom:
            parts.append(optax.trace(decay=mom, nesterov=bool(config.get("nesterov", False))))
    else:
        raise NotImplementedError(name)
    parts.append(optax.scale(-1.0))  # descent; lr multiplied in at call time
    return optax.chain(*parts)


def build_cnn_optimizer(config: Dict[str, Any]) -> optax.GradientTransformation:
    """The encoder's second Adam (train.py:299-301: lr 1e-3 — applied as the
    step's ``lr_cnn`` — with the experiment's weight decay)."""
    wd = float(config.get("weight_decay", 0.0) or 0.0)
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def encoder_param_labels(params) -> Any:
    """Label tree: leaves under ``encoder/eff_conv`` → 'cnn', rest → 'main'
    (the reference's cnn_subs split, train.py:275-278)."""
    # only the eff_conv subtree is 'cnn'; encoder.conv_a stays 'main'
    # (the reference adds conv_a to the main optimizer, train.py:286-287)
    def walk(tree, in_cnn):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_cnn or k == "eff_conv") for k, v in tree.items()
            }
        return "cnn" if in_cnn else "main"

    return walk(params, False)


def adam(lr_unused: float = 0.0) -> optax.GradientTransformation:
    """Bare torch-default Adam transform (GAN trainer, train_seg_gan.py:452,468)."""
    return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-1.0))


class LRScheduler:
    """Per-epoch LR schedule with torch stepping semantics.

    ``lr(epoch)`` returns the rate for that epoch. ReduceLROnPlateau is
    stateful: call :meth:`step_plateau` with the monitored value after each
    epoch (the reference monitors val loss, train.py:430).
    """

    def __init__(self, base_lr: float):
        self.base_lr = float(base_lr)

    def lr(self, epoch: int) -> float:
        return self.base_lr

    def step_plateau(self, value: float) -> None:  # no-op except plateau
        return None


class ConstantLR(LRScheduler):
    pass


class CosineAnnealingLR(LRScheduler):
    """torch CosineAnnealingLR closed form (stepped once per epoch)."""

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.t_max = int(t_max)
        self.eta_min = float(eta_min)

    def lr(self, epoch: int) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * epoch / self.t_max)
        ) / 2


class MultiStepLR(LRScheduler):
    """torch MultiStepLR: decay by gamma at each milestone epoch."""

    def __init__(self, base_lr: float, milestones, gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)

    def lr(self, epoch: int) -> float:
        k = sum(1 for m in self.milestones if m <= epoch)
        return self.base_lr * self.gamma**k


class ReduceLROnPlateau(LRScheduler):
    """torch ReduceLROnPlateau (mode='min', default threshold semantics)."""

    def __init__(
        self,
        base_lr: float,
        factor: float = 0.1,
        patience: int = 10,
        min_lr: float = 0.0,
        threshold: float = 1e-4,
    ):
        super().__init__(base_lr)
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.current = float(base_lr)
        self.best: Optional[float] = None
        self.num_bad = 0

    def lr(self, epoch: int) -> float:
        return self.current

    def step_plateau(self, value: float) -> None:
        value = float(value)
        if self.best is None or value < self.best * (1 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.current = max(self.current * self.factor, self.min_lr)
            self.num_bad = 0


def build_scheduler(config: Dict[str, Any]) -> LRScheduler:
    """Scheduler selection (train.py:303-320): only active for SGD; Adam runs
    at constant lr.  Unknown SGD schedulers raise like the reference."""
    base_lr = float(config["lr"])
    if config["optimizer"] != "SGD":
        return ConstantLR(base_lr)
    name = config.get("scheduler", "ConstantLR")
    if name == "CosineAnnealingLR":
        return CosineAnnealingLR(base_lr, config["epochs"], float(config.get("min_lr", 0.0)))
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(
            base_lr,
            factor=float(config.get("factor", 0.1)),
            patience=int(config.get("patience", 10)),
            min_lr=float(config.get("min_lr", 0.0)),
        )
    if name == "MultiStepLR":
        milestones = [int(e) for e in str(config["milestones"]).split(",")]
        return MultiStepLR(base_lr, milestones, float(config.get("gamma", 0.1)))
    if name == "ConstantLR":
        return ConstantLR(base_lr)
    raise NotImplementedError(name)
