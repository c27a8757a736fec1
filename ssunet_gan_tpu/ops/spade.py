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
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d, _bias_init_for_fan, torch_kernel_init
from ssunet_gan_tpu.ops.spade_kernel import (
    conv_apply,
    fast_gamma_beta_modulate,
    fused_spade_mode,
    fused_spade_stage,
    fused_spade_supported,
)

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


class _ConvParams(nn.Module):
    """Declares exactly ``Conv2d``'s param tree (kernel HWIO + bias, torch
    init) without applying it — lets :class:`SPADE` share one set of γ/β
    parameters between the XLA path and the fused Pallas kernel, keeping
    checkpoints and the torch converter byte-identical either way."""

    features: int
    kernel_size: int
    in_ch: int

    @nn.compact
    def __call__(self):
        shape = (self.kernel_size, self.kernel_size, self.in_ch, self.features)
        kernel = self.param("kernel", torch_kernel_init, shape, jnp.float32)
        fan_in = int(np.prod(shape[:-1]))
        bias = self.param("bias", _bias_init_for_fan(fan_in), (self.features,), jnp.float32)
        return kernel, bias


class SPADE(nn.Module):
    """SPADE(config_text, norm_nc, label_nc, nhidden) (normalization.py:68)."""

    config_text: str
    norm_nc: int
    label_nc: int
    nhidden: float = 64

    @nn.compact
    def __call__(self, x, segmap):
        """Apply SPADE; ``__call__(None, None)`` is the param-fetch path for
        the fused eval-stage kernel (self-SPADE: segmap channels = norm_nc),
        returning ``(k1, b1, k2, b2, kg, bg, kb, bb)``."""
        _, ks = parse_spade_config(self.config_text)
        nhidden = int(max(self.nhidden, 4))
        pw = ks // 2

        # Part 1: param-free norm — bypassed by design (normalization.py:110).
        normalized = x

        # Part 2: γ/β conditioned on the (projected) semantic map. Params are
        # declared Conv2d-identically so both code paths share one checkpoint
        # format (see _ConvParams).
        seg_ch = self.norm_nc if segmap is None else segmap.shape[-1]
        k1, b1 = _ConvParams(self.label_nc, ks, seg_ch, name="x2map")()
        k2, b2 = _ConvParams(nhidden, ks, self.label_nc, name="mlp_shared")()
        kg, bg = _ConvParams(self.norm_nc, ks, nhidden, name="mlp_gamma")()
        kb, bb = _ConvParams(self.norm_nc, ks, nhidden, name="mlp_beta")()
        if x is None:
            return k1, b1, k2, b2, kg, bg, kb, bb

        mode = fused_spade_mode()
        if (
            mode == "pallas"
            and segmap is x
            and fused_spade_supported(x, ks)
        ):
            # Self-SPADE (every ss-UNet stage): one Pallas kernel for the
            # whole stage — seg/actv/γ/β stay VMEM-resident and the narrow
            # convs run channels-in-sublanes (ops/spade_kernel.py).
            return fused_spade_stage(x, k1, b1, k2, b2, kg, bg, kb, bb)

        seg = conv_apply(segmap, k1, b1, pw)
        actv = nn.relu(conv_apply(seg, k2, b2, pw))
        if mode in ("fast", "pallas") and ks == 3:
            # im2col the tiny actv → γ|β as one wide-contraction 1×1 conv
            # (ops/spade_kernel.py) — same math, MXU-friendly shapes.
            return fast_gamma_beta_modulate(normalized, actv, kg, bg, kb, bb)
        gamma = conv_apply(actv, kg, bg, pw)
        beta = conv_apply(actv, kb, bb, pw)
        return normalized * (1 + gamma) + beta
