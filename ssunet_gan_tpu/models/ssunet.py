"""Self-SPADE U-Net family (the "ss-UNet" models; NHWC, flax.linen).

Behaviour-parity re-implementations of:
- ``SSUNet``       ← /root/reference/scripts/archs.py:673-743
                     (VGGBlocks, filters 32..512, ss_scale 4)
- ``UNet_B_SS``    ← archs.py:346-406 (Bottlenecks, 64..1024, ss_scale 16)
- ``UNet_R_SS``    ← archs.py:469-556 (BasicBlocks, 6-level pyramid
                     64/128/256/384/512/768, bilinear decoder)
- ``UNet_R_SS_v2`` ← archs.py:559-671 — the reference config's flagship
                     (configs/config_v1.json:14): same encoder, decoder
                     un-pools the top 3 levels through saved max-pool
                     indices with 1×1 channel-head convs, bilinear for the
                     bottom 2.

The defining pattern: after every stage the activation is SPADE-conditioned
**on itself** (e.g. ``SPADE0_0(x0_0, x0_0)``, archs.py:722).  SPADE's
``nhidden`` is ``nb_filter/ss_scale`` passed as a float (archs.py:486) and
floored at 4 inside SPADE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssunet_gan_tpu.ops.blocks import BasicBlock, Bottleneck, VGGBlock, maybe_remat
from ssunet_gan_tpu.ops.conv import Conv2d, kaiming_uniform_fan_in_init
from ssunet_gan_tpu.ops.stage_kernel import (
    fused_bneck_supported,
    fused_eval_stage,
    fused_eval_stage_bneck,
    fused_stage_enabled,
    fused_stage_probe_ok,
    fused_stage_supported,
    lookahead_enabled,
)
from ssunet_gan_tpu.ops.stage_kernel_int8 import (
    QTensor,
    fused_eval_stage_int8,
    int8_calibration,
    int8_stage_enabled,
    record_sink,
    record_stage_inputs,
    xla_int8_block,
)
from ssunet_gan_tpu.ops.stage_kernel_train import (
    fused_train_enabled,
    fused_train_stage,
)
from ssunet_gan_tpu.ops import blocks as blocks_mod
from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.wminor import (
    DownQTensor,
    DownTensor,
    UpTensor,
    WTensor,
    materialize_down,
    materialize_down_q,
    materialize_up,
    pool2x2,
    pool2x2_with_indices,
    to_nhwc,
    unpool2x2,
    upsample2x,
)

SPADE_CONTEXT = "spadebatch3x3"  # archs.py:483 (param-free norm is bypassed anyway)


def _up(x, materialize: bool = False, calib_key: str = None) -> jax.Array:
    """Bilinear ×2 preserving the activation form (W-minor stays W-minor).

    ``materialize=True`` forces the materializing einsum_hw lowering: the
    lazy ``UpTensor`` form is consumed in-kernel only by the EVAL stage
    kernels; train mode and bneck stages would have it materialized back by
    ``_spade_stage`` in the W-then-H einsum order, whose H contraction wraps
    the 2×-wider tensor in relayout copies (measured −16% on the int8 eval
    interim state, BASELINE.md r4) — and in train the autodiff transpose
    pays the same again. Callers pass ``train`` (or ``True`` for bneck
    consumers).

    ``calib_key`` names the consumer's stage input ("<stage>:<part>"): in
    int8 record mode the W-interp-only HALF payload's abs-max is recorded
    under ``"<calib_key>:half"`` so the int8 kernel's upsample-on-read
    quantizes the half tensor against its own range (each full row is a
    convex combination of half rows — amax(half) ≥ amax(full))."""
    if calib_key is not None and record_sink() is not None:
        import numpy as np

        from ssunet_gan_tpu.ops.resize import _linear_matrix
        from ssunet_gan_tpu.ops.stage_kernel_int8 import record_range

        v = to_nhwc(x).astype(jnp.float32)
        cm = jnp.asarray(np.asarray(_linear_matrix(v.shape[2], 2 * v.shape[2],
                                                   True)))
        half = jnp.einsum("qw,nhwc->nhqc", cm, v,
                          precision=jax.lax.Precision.HIGHEST)
        record_range(f"{calib_key}:half", jnp.max(jnp.abs(half)))
    if materialize:
        from ssunet_gan_tpu.ops import wminor as _wm

        # scoped off: upsample2x reads the global flag at trace time
        prev = _wm._LAZY_UPSAMPLE
        _wm.set_lazy_upsample(False)
        try:
            return upsample2x(x, align_corners=True)
        finally:
            _wm.set_lazy_upsample(prev)
    return upsample2x(x, align_corners=True)


def _out_amax(key):
    """Static calibrated abs-max covering a stage's OUTPUT: the key is the
    skip-connection consumer's recorded input (the output tensor itself),
    so quantizing the producer at this scale is exact max-calibration PTQ
    for every consumer (pooled views are subsets — never larger)."""
    if key is None:
        return None
    cal = int8_calibration()
    return None if cal is None else cal.get(key)


def _dq(t):
    """Any activation form → a plain NHWC array (composition fallback)."""
    t = to_nhwc(t)
    return t.dequant() if isinstance(t, QTensor) else t


# max-pool through any activation form (QTensor pooling commutes with
# symmetric quantization; W-minor forms pool in place — ops/wminor.py).
# TRAIN-mode pools skip the lazy (pool-on-read) emission: train consumers
# always materialize, so the lazy detour would only split the value/code
# computations apart (r5 train regression).


def _qpool_idx(x, train: bool = False):
    return pool2x2_with_indices(x, lazy=not train)


def _qpool(x, train: bool = False):
    return pool2x2(x, lazy=not train)


def _spade_stage(x, planes, num_classes, ss, bname, sname, train,
                 final_conv=None, block: str = "basic",
                 out_calib_key=None):
    """One ss-UNet stage: conv block + self-SPADE.

    ``block`` selects the conv block: ``"basic"`` (BasicBlock, the R_SS
    family) or ``"vgg"`` (VGGBlock, SSUNet) — a VGG stage is the BasicBlock
    stage with a zero shortcut, so both share the same fused kernels.

    In eval mode with the fused-stage kernel enabled, the whole stage runs
    as one Pallas program (ops/stage_kernel.py, or the int8 variant when
    the int8 mode is on); otherwise the standard module composition. Both
    branches declare the identical parameter tree (the fused branch uses
    the modules' param-fetch paths).

    ``final_conv`` (a 1×1 Conv2d module) marks the model's LAST stage: the
    fused kernel folds it in and emits logits directly (the full-res stage
    activation never leaves VMEM); the composition path applies it after.
    Returns (stage_output_or_None, logits_or_None).
    """
    # NB: QTensor/WTensor/UpTensor are themselves NamedTuples — they must
    # not be unpacked as multi-part inputs
    parts = (
        tuple(x)
        if isinstance(x, (tuple, list))
        and not isinstance(x, (QTensor, WTensor, UpTensor, DownTensor,
                               DownQTensor))
        else (x,)
    )
    if any(isinstance(p, UpTensor) for p in parts) and (
        train
        or record_sink() is not None
        or not fused_stage_enabled()
        or not lookahead_enabled()
        # the bneck kernel consumes the lazy form since r5, but only on
        # its fused path (int8 mode and unfused widths materialize)
        or (block == "bneck" and (
            int8_stage_enabled()
            or not fused_bneck_supported(
                parts, planes, num_classes, int(max(planes / ss, 4)),
                None if final_conv is None else num_classes)
        ))
    ):
        # lazy upsample seams are consumed in-kernel only by the bf16
        # lookahead-grid eval stage; every other branch materializes the
        # pending H-interp up front (ops/acts.materialize_up)
        parts = tuple(
            materialize_up(p) if isinstance(p, UpTensor) else p for p in parts
        )
        x = parts if len(parts) > 1 else parts[0]
    if any(isinstance(p, (DownTensor, DownQTensor)) for p in parts) and (
        train
        or block == "bneck"
        or record_sink() is not None
        or not fused_stage_enabled()
        or not lookahead_enabled()
    ):
        # lazy pool seams (pool-on-read) are consumed in-kernel only by
        # the lookahead-grid eval stages (bf16 and s8); every other branch
        # applies the pending 2×2 max up front (ops/acts.materialize_down)
        parts = tuple(
            materialize_down(p) if isinstance(p, DownTensor)
            else materialize_down_q(p) if isinstance(p, DownQTensor)
            else p
            for p in parts
        )
        x = parts if len(parts) > 1 else parts[0]
    in_planes = sum(p.shape[-1] for p in parts)
    spade_args = (SPADE_CONTEXT, planes, num_classes, planes / ss)
    if not train and record_sink() is not None:
        # int8 calibration pass: record stage-input abs-max tracers into the
        # active sink and run the plain composition (stage outputs are
        # parity-equal across paths, so the recorded ranges transfer)
        record_stage_inputs(bname, parts)
        if block == "vgg":
            y = VGGBlock(planes, planes, name=bname)(x, train)
        elif block == "bneck":
            y = Bottleneck(planes, name=bname)(x, train)
        else:
            y = BasicBlock(planes, name=bname)(x, train)
        y = SPADE(*spade_args, name=sname)(y, y)
        return (y, None) if final_conv is None else (y, final_conv(y))
    if (
        train
        and block == "basic"
        and fused_train_enabled()
        and not blocks_mod._REMAT  # remat path bounds memory via the modules
        and fused_stage_supported(parts, planes)
        and in_planes != planes
        and fused_stage_probe_ok(
            parts, planes, num_classes, int(max(planes / ss, 4)),
            None if final_conv is None else num_classes,
        )
    ):
        bb = BasicBlock(planes, in_planes=in_planes, name=bname)
        bp = bb(None, True)
        sp = SPADE(*spade_args, name=sname)(None, None)
        head = None if final_conv is None else final_conv(None)
        out, stats = fused_train_stage(parts, bp, sp, head)
        bb(None, True, stats=stats)  # running-average updates (torch 0.1)
        return (out, None) if final_conv is None else (None, out)
    if (
        not train
        and block == "bneck"
        and fused_stage_enabled()
        and not int8_stage_enabled()  # int8 covers the BasicBlock/VGG dots
        and fused_bneck_supported(
            parts, planes, num_classes, int(max(planes / ss, 4)),
            None if final_conv is None else num_classes)
    ):
        bp = Bottleneck(planes, in_planes=in_planes, name=bname)(None, False)
        sp = SPADE(*spade_args, name=sname)(None, None)
        head = None if final_conv is None else final_conv(None)
        out = fused_eval_stage_bneck(parts, bp, sp, final_head=head,
                                     emit_wminor=True)
        return (out, None) if final_conv is None else (None, out)
    if (
        not train
        and block in ("basic", "vgg")
        and fused_stage_enabled()
        and fused_stage_supported(parts, planes, pack=True,
                                  int8=int8_stage_enabled())
        # BasicBlock's shortcut conv must exist for the fused packing;
        # VGG stages have no shortcut at all (zero columns)
        and (block == "vgg" or in_planes != planes)
        and fused_stage_probe_ok(
            parts, planes, num_classes, int(max(planes / ss, 4)),
            None if final_conv is None else num_classes,
            pack=True, int8=int8_stage_enabled(),
        )
    ):
        if block == "vgg":
            bp = VGGBlock(planes, planes, in_channels=in_planes,
                          name=bname)(None, False)
        else:
            bp = BasicBlock(planes, in_planes=in_planes, name=bname)(None, False)
        sp = SPADE(*spade_args, name=sname)(None, None)
        head = None if final_conv is None else final_conv(None)
        if int8_stage_enabled():
            out = fused_eval_stage_int8(
                parts, bp, sp, final_head=head, calib_key=bname,
                out_abs_max=None if final_conv is not None
                else _out_amax(out_calib_key),
                emit_wminor=True,
            )
        else:
            out = fused_eval_stage(parts, bp, sp, final_head=head,
                                   emit_wminor=True)
        return (out, None) if final_conv is None else (None, out)
    if not train and block in ("basic", "vgg") and int8_stage_enabled():
        # deep/unfused stage in int8 mode: XLA-native s8 convs (the MXU runs
        # them at 2× bf16; fusing these W ≤ 64 levels measured slower — see
        # stage_kernel._PACK_MAX_PLANES); SPADE stays the bf16 composition
        if block == "vgg":
            bp = VGGBlock(planes, planes, in_channels=in_planes,
                          name=bname)(None, False)
        else:
            bp = BasicBlock(planes, in_planes=in_planes, name=bname)(None, False)
        # deep levels stay NHWC (cheap boundary: 4×+ smaller than level 0)
        y = xla_int8_block(tuple(to_nhwc(p) for p in parts), bp,
                           calib_key=bname, residual=(block != "vgg"))
        y = SPADE(*spade_args, name=sname)(y, y)
        am = None if final_conv is not None else _out_amax(out_calib_key)
        if am is not None:
            # producer-side s8 emission (XLA): one fused quantize replaces
            # every consumer's own quantize pass over this tensor
            s = max(float(am) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / s),
                         -127, 127).astype(jnp.int8)
            y = QTensor(q, s, y.dtype)
        return (y, None) if final_conv is None else (y, final_conv(y))
    if any(isinstance(p, (QTensor, WTensor, UpTensor, DownTensor,
                          DownQTensor)) for p in parts):
        # composition fallback reached with producer-quantized or W-minor
        # inputs (e.g. a stage whose probe failed consuming a fused skip):
        # back to plain NHWC first
        parts = tuple(_dq(p) for p in parts)
        x = parts if len(parts) > 1 else parts[0]
    if block == "vgg":
        y = maybe_remat(VGGBlock)(planes, planes, name=bname)(x, train)
    elif block == "bneck":
        y = maybe_remat(Bottleneck)(planes, name=bname)(x, train)
    else:
        y = maybe_remat(BasicBlock)(planes, name=bname)(x, train)
    y = SPADE(*spade_args, name=sname)(y, y)
    return (y, None) if final_conv is None else (y, final_conv(y))


# backward-compat alias (r2 name)
_basic_spade_stage = _spade_stage


def _final_conv(num_classes: int, name: str = "final", in_channels=None) -> Conv2d:
    """Final 1×1 conv with kaiming-uniform fan_in weights and zero bias
    (archs.py:522-524). ``in_channels`` enables the param-fetch path."""
    return Conv2d(
        num_classes, 1, name=name, kernel_init=kaiming_uniform_fan_in_init,
        bias_fill=0.0, in_channels=in_channels,
    )


class SSUNet(nn.Module):
    """VGGBlock U-Net + self-SPADE at every stage (archs.py:673-743)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = (32, 64, 128, 256, 512)  # archs.py:680
        ss = 4  # archs.py:689
        C = self.num_classes

        def stage(xin, i, bname, sname, out_key=None):
            return _spade_stage(xin, f[i], C, ss, bname, sname, train,
                                block="vgg", out_calib_key=out_key)[0]

        # encoder stages name their skip consumer as the s8-emission key
        # (see UNetRSSv2); x4_0 feeds only the bilinear _up → stays bf16
        x0_0 = stage(x, 0, "conv0_0", "SPADE0_0", out_key="conv0_4:0")
        x1_0 = stage(_qpool(x0_0, train), 1, "conv1_0", "SPADE1_0",
                     out_key="conv1_3:0")
        x2_0 = stage(_qpool(x1_0, train), 2, "conv2_0", "SPADE2_0",
                     out_key="conv2_2:0")
        x3_0 = stage(_qpool(x2_0, train), 3, "conv3_0", "SPADE3_0",
                     out_key="conv3_1:0")
        x4_0 = stage(_qpool(x3_0, train), 4, "conv4_0", "SPADE4_0")

        x3_1 = stage((x3_0, _up(x4_0, train, "conv3_1:1")), 3, "conv3_1", "SPADE3_1")
        x2_2 = stage((x2_0, _up(x3_1, train, "conv2_2:1")), 2, "conv2_2", "SPADE2_2")
        x1_3 = stage((x1_0, _up(x2_2, train, "conv1_3:1")), 1, "conv1_3", "SPADE1_3")

        # the final 1×1 conv rides the last fused stage in eval
        _, logits = _spade_stage(
            (x0_0, _up(x1_3, train, "conv0_4:1")), f[0], C, ss, "conv0_4", "SPADE0_4", train,
            final_conv=Conv2d(self.num_classes, 1, name="final",
                              in_channels=f[0]),
            block="vgg",
        )
        return logits


class UNetBSS(nn.Module):
    """Bottleneck U-Net + self-SPADE (archs.py:346-406)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = (64, 128, 256, 512, 1024)  # archs.py:351
        ss = 16  # archs.py:357
        C = self.num_classes

        def stage(xin, i, bname, sname):
            return _spade_stage(xin, f[i], C, ss, bname, sname, train,
                                block="bneck")[0]

        x0_0 = stage(x, 0, "conv0_0", "SPADE0_0")
        x1_0 = stage(_qpool(x0_0, train), 1, "conv1_0", "SPADE1_0")
        x2_0 = stage(_qpool(x1_0, train), 2, "conv2_0", "SPADE2_0")
        x3_0 = stage(_qpool(x2_0, train), 3, "conv3_0", "SPADE3_0")
        x4_0 = stage(_qpool(x3_0, train), 4, "conv4_0", "SPADE4_0")

        # x3_1 (512 planes) never fuses — force the einsum_hw H-then-W
        # order there (the lazy form would materialize W-then-H, the
        # measured-slow association); the fused-width stages consume the
        # lazy form in-kernel (bneck upsample-on-read, r5)
        x3_1 = stage((x3_0, _up(x4_0, True)), 3, "conv3_1", "SPADE3_1")
        x2_2 = stage((x2_0, _up(x3_1, train)), 2, "conv2_2", "SPADE2_2")
        x1_3 = stage((x1_0, _up(x2_2, train)), 1, "conv1_3", "SPADE1_3")

        # the final 1×1 conv rides the last fused stage in eval
        _, logits = _spade_stage(
            (x0_0, _up(x1_3, train)), f[0], C, ss, "conv0_4", "SPADE0_4",
            train,
            final_conv=Conv2d(self.num_classes, 1, name="final",
                              in_channels=f[0]),
            block="bneck",
        )
        return logits


class UNetRSS(nn.Module):
    """BasicBlock 6-level U-Net + self-SPADE, bilinear decoder
    (archs.py:469-556, six_step=True)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = (64, 128, 256, 384, 512, 768)  # archs.py:478
        ss = 16  # archs.py:484
        C = self.num_classes

        def stage(xin, feat, bname, sname, out_key=None):
            return _basic_spade_stage(xin, feat, C, ss, bname, sname, train,
                                      out_calib_key=out_key)[0]

        # encoder stages name their skip consumer as the s8-emission key
        # (see UNetRSSv2); x5_0 feeds only the bilinear _up → stays bf16
        x0_0 = stage(x, f[0], "conv0_0", "SPADE0_0", out_key="conv0_4:0")
        x1_0 = stage(_qpool(x0_0, train), f[1], "conv1_0", "SPADE1_0",
                     out_key="conv1_3:0")
        x2_0 = stage(_qpool(x1_0, train), f[2], "conv2_0", "SPADE2_0",
                     out_key="conv2_2:0")
        x3_0 = stage(_qpool(x2_0, train), f[3], "conv3_0", "SPADE3_0",
                     out_key="conv3_1:0")
        x4_0 = stage(_qpool(x3_0, train), f[4], "conv4_0", "SPADE4_0",
                     out_key="conv4_1:0")

        x5_0 = stage(_qpool(x4_0, train), f[5], "conv5_0", "SPADE5_0")
        x4_1 = stage((x4_0, _up(x5_0, train, "conv4_1:1")), f[4], "conv4_1", "SPADE4_1")
        x3_1 = stage((x3_0, _up(x4_1, train, "conv3_1:1")), f[3], "conv3_1", "SPADE3_1")
        x2_2 = stage((x2_0, _up(x3_1, train, "conv2_2:1")), f[2], "conv2_2", "SPADE2_2")
        x1_3 = stage((x1_0, _up(x2_2, train, "conv1_3:1")), f[1], "conv1_3", "SPADE1_3")

        # the final 1×1 conv rides the last fused stage in eval
        _, logits = _basic_spade_stage(
            (x0_0, _up(x1_3, train, "conv0_4:1")), f[0], C, ss, "conv0_4", "SPADE0_4", train,
            final_conv=_final_conv(self.num_classes, in_channels=f[0]),
        )
        return logits


class UNetRSSv2(nn.Module):
    """The config's flagship arch: BasicBlock encoder + self-SPADE, decoder
    with index-unpooling on the top 3 levels (archs.py:559-671).

    Pool indices are carried as window-local 2-bit codes
    (see ops/pool.py) rather than torch's flat HBM indices.

    ``filters`` defaults to the reference widths (archs.py:568). The
    registry's opt-in ``UNet_R_SS_v2_wide`` variant pads the 64-channel
    levels to 128 so every conv output fills the MXU's 128 lanes (the
    64-wide levels run at 40-50% MXU efficiency, BASELINE.md) — NOT
    checkpoint-compatible with the reference shapes.
    """

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False
    filters: tuple = (64, 128, 256, 384, 512, 768)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = self.filters
        ss = 16  # archs.py:575
        C = self.num_classes

        def stage(xin, feat, bname, sname, out_key=None):
            return _basic_spade_stage(xin, feat, C, ss, bname, sname, train,
                                      out_calib_key=out_key)[0]

        # Encoder stages name their skip-connection consumer ("convK_1:0")
        # as the output calibration key: under int8 + static calibration the
        # stage emits s8 at that scale and every consumer (pool chain and
        # skip) reads it quantized — kernel-to-kernel int8 flow.
        enc_0 = stage(x, f[0], "conv0_0", "SPADE0_0", out_key="conv0_1:0")

        p0, idx0 = _qpool_idx(enc_0, train)
        enc_1 = stage(p0, f[1], "conv1_0", "SPADE1_0", out_key="conv1_1:0")

        p1, idx1 = _qpool_idx(enc_1, train)
        enc_2 = stage(p1, f[2], "conv2_0", "SPADE2_0", out_key="conv2_1:0")

        p2, idx2 = _qpool_idx(enc_2, train)
        enc_3 = stage(p2, f[3], "conv3_0", "SPADE3_0", out_key="conv3_1:0")

        p3, idx3 = _qpool_idx(enc_3, train)
        enc_4 = stage(p3, f[4], "conv4_0", "SPADE4_0", out_key="conv4_1:0")
        p4, idx4 = _qpool_idx(enc_4, train)

        enc_5 = stage(p4, f[5], "conv5_0", "SPADE5_0")
        enc_5 = Conv2d(f[4], 1, use_bias=False, name="conv_head5_0")(enc_5)
        enc_5_up = unpool2x2(enc_5, idx4)

        dec_4 = stage((enc_4, enc_5_up), f[4], "conv4_1", "SPADE4_1")
        dec_4 = Conv2d(f[3], 1, use_bias=False, name="conv_head4_1")(dec_4)
        dec_4_up = unpool2x2(dec_4, idx3)

        dec_3 = stage((enc_3, dec_4_up), f[3], "conv3_1", "SPADE3_1")
        dec_3 = Conv2d(f[2], 1, use_bias=False, name="conv_head3_1")(dec_3)
        dec_3_up = unpool2x2(dec_3, idx2)

        dec_2 = stage((enc_2, dec_3_up), f[2], "conv2_1", "SPADE2_1")

        dec_1 = stage((enc_1, _up(dec_2, train, "conv1_1:1")), f[1], "conv1_1", "SPADE1_1")

        # the final 1×1 conv rides the last fused stage (logits leave the
        # kernel directly; the full-res dec_0 never hits HBM in eval)
        _, logits = _basic_spade_stage(
            (enc_0, _up(dec_1, train, "conv0_1:1")), f[0], C, ss, "conv0_1", "SPADE0_1", train,
            final_conv=_final_conv(self.num_classes, in_channels=f[0]),
        )
        return logits
