"""Functional train state.

The reference's mutable training state (module params, BN running stats,
spectral-norm u/v buffers, two optimizers' moments) becomes one immutable
pytree threaded through the jitted steps.  This is what makes real
checkpoint/resume possible — the reference never saves optimizer state and
its resume branch is dead code (train.py:260-269, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct
from flax.core import FrozenDict


def _freeze(d: Any) -> Any:
    return d if isinstance(d, FrozenDict) else FrozenDict(d)


class TrainState(struct.PyTreeNode):
    """Model + optimizer state for one network (generator or discriminator).

    ``variables()`` rebuilds the flax variable dict for ``Module.apply``.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation) -> "TrainState":
        params = variables.get("params", {})
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            spectral=variables.get("spectral", {}),
            opt_state=tx.init(params),
        )

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.spectral:
            v["spectral"] = self.spectral
        return v

    def mutable_collections(self):
        cols = []
        if self.batch_stats:
            cols.append("batch_stats")
        if self.spectral:
            cols.append("spectral")
        return cols
