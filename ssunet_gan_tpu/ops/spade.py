"""SPADE — spatially-adaptive (de)normalization.

Behaviour-parity re-implementation of /root/reference/scripts/normalization.py:67-122.

Two deliberate quirks of the reference are preserved (SURVEY.md §7 calls
these out as *the behaviour*, not bugs to fix silently):

1. **The param-free norm is bypassed.**  ``SPADE.forward`` sets
   ``normalized = x`` (normalization.py:110) — the declared batch/syncbatch/
   instance norm (normalization.py:76-84) is dead code.  We therefore parse
   and validate the config string but instantiate no norm at all.  (This
   also means the "syncbatch" variant needs no cross-replica communication —
   a double win on TPU.)
2. **The segmap is first projected through ``x2map``** (norm_nc → label_nc,
   normalization.py:94,114) before the shared MLP, because the reference's
   SS-UNets condition every stage on *itself* (e.g. archs.py:722).

``nhidden`` follows ``int(max(nhidden, 4))`` (normalization.py:88) with the
callers passing ``nb_filter/ss_scale`` as a float (archs.py:486).
"""

from __future__ import annotations

import re

import jax
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d

_CONFIG_RE = re.compile(r"spade(\D+)(\d)x\d")
_KNOWN_NORMS = ("instance", "syncbatch", "batch")


def parse_spade_config(config_text: str):
    """Parse ``spade(norm)(ks)x(ks)`` (normalization.py:71-74)."""
    if not config_text.startswith("spade"):
        raise ValueError(f"SPADE config must start with 'spade': {config_text!r}")
    parsed = _CONFIG_RE.search(config_text)
    norm_type = str(parsed.group(1))
    ks = int(parsed.group(2))
    if norm_type not in _KNOWN_NORMS:
        raise ValueError(
            "%s is not a recognized param-free norm type in SPADE" % norm_type
        )
    return norm_type, ks


class SPADE(nn.Module):
    """SPADE(config_text, norm_nc, label_nc, nhidden) (normalization.py:68)."""

    config_text: str
    norm_nc: int
    label_nc: int
    nhidden: float = 64

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array) -> jax.Array:
        _, ks = parse_spade_config(self.config_text)
        nhidden = int(max(self.nhidden, 4))
        pw = ks // 2

        # Part 1: param-free norm — bypassed by design (normalization.py:110).
        normalized = x

        # Part 2: γ/β conditioned on the (projected) semantic map.
        segmap = Conv2d(self.label_nc, ks, padding=pw, name="x2map")(segmap)
        actv = nn.relu(Conv2d(nhidden, ks, padding=pw, name="mlp_shared")(segmap))
        gamma = Conv2d(self.norm_nc, ks, padding=pw, name="mlp_gamma")(actv)
        beta = Conv2d(self.norm_nc, ks, padding=pw, name="mlp_beta")(actv)

        return normalized * (1 + gamma) + beta
