"""int8 variant of the fused eval-mode [BasicBlock + self-SPADE] stage.

The bf16 fused stages run at 40-44% MFU and are MXU-bound (BASELINE.md r2
device profile); v5e's MXU runs int8 at 2× the bf16 rate, which is the only
identified lever past the 438 tiles/s bf16 compute roofline (docs/ROADMAP.md).
This kernel keeps the rolling-halo structure of ``ops.stage_kernel`` and
moves the two heavy contractions — conv1 and conv2+shortcut, ~90% of stage
FLOPs — to int8×int8→int32 MXU dots:

- **stage inputs** are quantized per-tensor in XLA (dynamic symmetric
  scales, no calibration state); the per-part scale folds into the packed
  conv1/shortcut weight columns BEFORE per-output-channel weight
  quantization, so the kernel needs no activation-scale operands;
- **h1** (the conv1 activation) is quantized per H-band inside the kernel
  (VPU abs-max over the VMEM slab) — valid because each band's h1 slab is
  produced and consumed within one grid step, so the scale never crosses a
  band boundary;
- dequantization is a per-output-channel f32 multiply fused with the BN
  bias add and ReLU on the VPU;
- the **SPADE tail, shortcut-free epilogue and final 1×1 head stay bf16**
  (<10% of stage FLOPs — quantizing them buys nothing and costs accuracy).

Zero-points are zero everywhere (symmetric quantization), so the halo
zero-masking used for conv padding stays exact in the int8 domain.

References: archs.py:205-241 (BasicBlock), normalization.py:94-120 (SPADE);
capability parity target: the eval path of
/root/reference/scripts/aerial_image_segmentation_api.py:376-390.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssunet_gan_tpu.ops.spade_kernel import (
    _carried_rows,
    _interpret,
    _shift_w,
    _spade_tail,
    _zero_outside_image,
    pack_seg_stacked,
    pick_seg_r,
)
from ssunet_gan_tpu.ops.stage_kernel import (
    _PROBE_MARGIN,
    _VMEM_LIMIT,
    _pack_factor,
    _pack_lanes,
    _unpack_lanes,
    halo_carry_enabled,
    lookahead_enabled,
    resolve_band_th,
    seg_stack_enabled,
)

# ---------------------------------------------------------------------------
# Mode toggle: int8 is OPT-IN (config key "int8" / set_int8_stage) — it is a
# quantized approximation, so the caller owns the accuracy/throughput trade.
# ---------------------------------------------------------------------------

_INT8_STAGE = False


def set_int8_stage(enabled: bool) -> None:
    global _INT8_STAGE
    _INT8_STAGE = bool(enabled)


def int8_stage_enabled() -> bool:
    return _INT8_STAGE


# ---------------------------------------------------------------------------
# Static activation-scale calibration. Dynamic per-tensor scales cost a full
# abs-max reduction pass over every stage input in XLA (an extra HBM read of
# the largest tensors in the model) and make the quantization data-dependent.
# A calibration pass (infer/calibrate.py) records per-stage-input abs-max
# over representative tiles; with those scales installed the quantize step
# is ONE fused elementwise op, and the numbers are batch-independent.
#
# ``_CALIB_SCALES`` maps "<stage-name>:<part-index>" → float abs-max.
# ``_RECORD_SINK`` (a dict) switches the model dispatch into record mode:
# stages run the normal composition and write their input abs-max tracers
# into the sink, which the calibration wrapper returns as jit outputs.
# ---------------------------------------------------------------------------

_CALIB_SCALES: Optional[dict] = None
_RECORD_SINK: Optional[dict] = None


class QTensor(NamedTuple):
    """A producer-quantized activation flowing between stages: ``q`` is the
    int8 tensor, ``scale`` the f32 dequantization scale (``x ≈ q·s``),
    ``dtype`` the activation dtype the tensor logically stands in for.
    Only exists under static calibration (the scale must be a trace-time
    constant for the emitting kernel). Max-pooling commutes with symmetric
    quantization (pooled values are a subset of the original elements), so
    pooled QTensors keep the producer's scale.

    ``wminor`` marks a (N, H, C, W)-oriented payload (the fused kernels'
    native orientation — see ops/wminor.py); ``shape`` always reports the
    LOGICAL NHWC shape and ``dequant`` always returns NHWC."""

    q: jax.Array
    scale: float
    dtype: object
    wminor: bool = False

    @property
    def shape(self):
        if self.wminor:
            n, h, c, w = self.q.shape
            return (n, h, w, c)
        return self.q.shape

    def dequant(self) -> jax.Array:
        q = jnp.swapaxes(self.q, 2, 3) if self.wminor else self.q
        return (q.astype(jnp.float32) * self.scale).astype(self.dtype)


def set_int8_calibration(scales: Optional[dict]) -> None:
    """Install static activation scales ({"stage:i": abs_max}) or None to
    return to dynamic per-tensor quantization."""
    global _CALIB_SCALES
    _CALIB_SCALES = dict(scales) if scales is not None else None


def int8_calibration() -> Optional[dict]:
    return _CALIB_SCALES


def set_record_sink(sink: Optional[dict]) -> None:
    global _RECORD_SINK
    _RECORD_SINK = sink


def record_sink() -> Optional[dict]:
    return _RECORD_SINK


def record_range(key: str, amax) -> None:
    """Record-mode hook: write one abs-max tracer into the active sink,
    maxing over previous writes (several model applications in one trace
    accumulate)."""
    if _RECORD_SINK is None:
        return
    _RECORD_SINK[key] = (
        amax if key not in _RECORD_SINK else jnp.maximum(_RECORD_SINK[key], amax)
    )


def record_stage_inputs(key: str, parts) -> None:
    """Record-mode hook (model dispatch): write each stage input's abs-max
    tracer into the active sink."""
    if _RECORD_SINK is None:
        return
    for i, p in enumerate(parts):
        record_range(f"{key}:{i}", jnp.max(jnp.abs(p.astype(jnp.float32))))


def _rowscale(acc_f32: jax.Array, d: jax.Array) -> jax.Array:
    """Per-output-channel scale on a (C, W) slab.

    ``d`` arrives PRE-TILED as (C, W) — Mosaic's vector layout pass rejects
    (C, 1)-shaped broadcasts (r2 finding, CLAUDE.md), so the per-channel
    vectors are broadcast to lane-width in XLA and ride as operands."""
    return acc_f32 * d


def quantize_tensor(x: jax.Array, abs_max: Optional[float] = None):
    """Per-tensor symmetric int8 quantization (XLA side).

    Returns (q, scale): ``x ≈ q · scale`` with q ∈ [-127, 127], zero-point
    0 (so zero-padding halos stay exact in the quantized domain).

    ``abs_max`` (a calibrated static bound) skips the data-dependent abs-max
    reduction — the quantize becomes one fused elementwise op and values
    beyond the calibration range saturate (standard max-calibration PTQ).
    """
    if abs_max is None:
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
    else:
        m = jnp.float32(abs_max)
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_rows(w: jax.Array):
    """Per-output-channel (row) symmetric int8 weight quantization."""
    m = jnp.max(jnp.abs(w), axis=1)
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / s[:, None]), -127, 127).astype(jnp.int8)
    return q, s


def _quant_band(h: jax.Array):
    """Per-band dynamic int8 quantization of a VMEM slab (in-kernel).

    Row-at-a-time: the slab stays in its storage dtype and only one (C, W)
    f32 row is ever live (a full f32 copy of a tall band would be the
    kernel's largest value — bf16→f32 is exact, so the per-row max and
    quantized values are identical to the whole-slab form)."""
    t = h.shape[0]
    m = jnp.max(jnp.abs(h[0]).astype(jnp.float32))
    for r in range(1, t):
        m = jnp.maximum(m, jnp.max(jnp.abs(h[r]).astype(jnp.float32)))
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.stack(
        [
            jnp.clip(jnp.round(h[r].astype(jnp.float32) / s), -127, 127)
            .astype(jnp.int8)
            for r in range(t)
        ],
        axis=0,
    )
    return q, s


# ---------------------------------------------------------------------------
# XLA int8 path for the DEEP (unfused) stages. The W ≤ 64 pyramid levels
# don't fuse profitably (deep-level lane packing measured slower end-to-end
# at every depth — see stage_kernel._PACK_MAX_PLANES), but their bf16 convs
# are ~25 ms/iter of the flagship's 140 ms int8 profile and the v5e MXU runs
# s8×s8→s32 at 2× the bf16 rate. This path applies the SAME quantization
# scheme as the fused kernel through plain `lax.conv_general_dilated` calls
# (XLA lowers int8 convs to the MXU natively): static-or-dynamic per-tensor
# input scales folded into per-output-channel int8 weights, f32 dequant
# fused with the BN affine and ReLU, dynamic per-tensor h1 requantization.
# SPADE stays bf16 in the caller (module composition).
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _quant_hwio(w: jax.Array):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    m = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    s = jnp.maximum(m / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def _conv_s8(qx: jax.Array, qw: jax.Array, pad: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        qx, qw, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )


def xla_int8_block(parts: Sequence[jax.Array], block_bundle: Tuple,
                   calib_key: Optional[str] = None,
                   residual: bool = True) -> jax.Array:
    """int8 BasicBlock/VGGBlock eval forward via XLA native s8 convs.

    ``block_bundle`` is the modules' param-fetch output (BN eval affines
    folded): ``(k1, (s1, t1), k2, (s2, t2), ks_or_None)``. ``residual=False``
    marks a VGG stage (plain conv chain, never a residual add); a BasicBlock
    with ``ks=None`` adds the concatenated input (identity shortcut).

    Returns the block output (pre-SPADE) in the activation dtype; the
    caller applies SPADE as the normal module composition.
    """
    k1, (s1, t1), k2, (s2, t2), ks = block_bundle
    dtype = parts[0].dtype
    csum = sum(p.shape[-1] for p in parts)

    def _amax(i):
        if _CALIB_SCALES is None or calib_key is None:
            return None
        return _CALIB_SCALES.get(f"{calib_key}:{i}")

    def _qin(i, p):
        if isinstance(p, QTensor):
            q = jnp.swapaxes(p.q, 2, 3) if p.wminor else p.q
            return q, jnp.float32(p.scale)
        return quantize_tensor(p, _amax(i))

    qparts, sx = zip(*(_qin(i, p) for i, p in enumerate(parts)))
    qcat = qparts[0] if len(qparts) == 1 else jnp.concatenate(qparts, axis=-1)

    # conv1: fold bn1 scale + per-part input scales into the weight columns,
    # then per-output-channel quantize
    k1f = (k1 * s1).astype(jnp.float32)  # (3, 3, ΣCp, C) ← bn scale on O
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    k1f = jnp.concatenate(
        [k1f[:, :, offs[i] : offs[i + 1], :] * sx[i] for i in range(len(parts))],
        axis=2,
    )
    Wq1, d1 = _quant_hwio(k1f)
    h1 = jax.nn.relu(_conv_s8(qcat, Wq1, 1).astype(jnp.float32) * d1 + t1)

    # dynamic per-tensor requantization of h1 (cheap at deep widths)
    qh1, sh1 = quantize_tensor(h1)
    k2f = (k2 * s2).astype(jnp.float32)
    Wq2, d2 = _quant_hwio(k2f)
    acc2 = _conv_s8(qh1, Wq2, 1).astype(jnp.float32) * (d2 * sh1) + t2

    if ks is not None:  # projection shortcut (1×1, per-part input scales)
        ksf = jnp.concatenate(
            [
                ks[:, :, offs[i] : offs[i + 1], :].astype(jnp.float32) * sx[i]
                for i in range(len(parts))
            ],
            axis=2,
        )
        Wqs, dsc = _quant_hwio(ksf)
        acc2 = acc2 + _conv_s8(qcat, Wqs, 0).astype(jnp.float32) * dsc
    elif residual:  # identity shortcut (BasicBlock, in_planes == planes)
        fparts = [p.dequant() if isinstance(p, QTensor) else p for p in parts]
        xid = fparts[0] if len(fparts) == 1 else jnp.concatenate(fparts, axis=-1)
        acc2 = acc2 + xid.astype(jnp.float32)
    # else: VGG chain — no residual add at all

    return jax.nn.relu(acc2).astype(dtype)


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------


def _upsample_on_read_s8(scr, cur, lookr, i, th: int, h_img: int):
    """s8 variant of ``ops.stage_kernel._upsample_on_read``: expand a
    HALF-H quantized part's band window to full-res s8 rows in VMEM.

    The half tensor's scale is the part scale folded into the conv weight
    columns, so the 2-tap lerp requantizes with a plain round+clip —
    q_out = clip(round(w0·q[j0] + w1·q[j1])). vs the materializing path
    (quantize the bf16 upsampled tensor) this adds one extra rounding step
    (≤0.5 quantization steps) on interpolated rows — inside the int8
    path's approximation envelope, re-measured by the accuracy bars."""
    thh = th // 2
    hh = h_img // 2
    xh_half = jnp.concatenate([scr[:], cur[:], lookr[0:5]], axis=0)
    g0h = i * thh - 5
    xh_half = _zero_outside_image(xh_half, g0h, hh).astype(jnp.float32)
    rows = []
    for t in range(th + 10):
        lj = (t - 6) // 2 + 5
        pf = i * th + (t - 5)
        j0g = i * thh + ((t - 6) // 2)
        w1 = (pf * (hh - 1) - j0g * (2 * hh - 1)).astype(jnp.float32) \
            / jnp.float32(2 * hh - 1)
        w0 = ((j0g + 1) * (2 * hh - 1) - pf * (hh - 1)).astype(jnp.float32) \
            / jnp.float32(2 * hh - 1)
        r = xh_half[lj] * w0 + xh_half[lj + 1] * w1
        rows.append(jnp.clip(jnp.round(r), -127.0, 127.0))
    xh = jnp.stack(rows, axis=0).astype(jnp.int8)
    return _zero_outside_image(xh, i * th - 5, h_img)


def _pool_on_read_s8(scr, cur, lookr, sel, i, th: int, h_img: int):
    """s8 variant of ``ops.stage_kernel._pool_on_read``: pool a FULL-res
    quantized part's band window to POOLED s8 rows in VMEM. Max-pooling
    commutes with symmetric quantization (s8 compares are the dequantized
    compares). Mosaic does not legalize s8 elementwise max
    (``arith.maxsi``), so the compare/decimate run in bf16 — exact for
    s8-range integers (|q| ≤ 127 < 2⁸, and the one-hot decimation dot is
    an exact selection) — and cast back to s8. ``sel`` arrives in bf16."""
    xf = jnp.concatenate([scr[:], cur[:], lookr[0:10]], axis=0)
    xf = xf.astype(jnp.bfloat16)
    rows = []
    for t in range(th + 10):
        top, bot = xf[2 * t], xf[2 * t + 1]
        tr = jnp.concatenate([top[:, 1:], top[:, -1:]], axis=-1)
        br = jnp.concatenate([bot[:, 1:], bot[:, -1:]], axis=-1)
        rows.append(jnp.maximum(jnp.maximum(top, tr), jnp.maximum(bot, br)))
    outs = []
    for g in range((th + 10) // 2):
        m2 = jnp.concatenate([rows[2 * g], rows[2 * g + 1]], axis=0)
        d = jnp.dot(m2, sel[:], preferred_element_type=jnp.float32)
        outs.append(d.astype(jnp.int8))
    cp = xf.shape[1]
    mp = jnp.concatenate(outs, axis=0).reshape(th + 10, cp, sel.shape[1])
    return _zero_outside_image(mp, i * th - 5, h_img)


def _make_kernel_int8(n_parts: int, th: int, c: int, w: int, part_ch,
                      h_img: int, has_final: bool, dtype, sub_w: int = 0,
                      out_inv_scale: Optional[float] = None,
                      seg_r: int = 0, seg_lab: int = 0, carry: bool = False,
                      look: bool = False, up: Tuple[bool, ...] = (),
                      pair: bool = False, down: Tuple[bool, ...] = ()):
    """``out_inv_scale`` (a compile-time constant, = 127/abs_max from the
    static calibration) switches the epilogue to emit s8 directly: the
    SPADE-modulated stage output is quantized in-kernel, so the HBM write,
    the output relayout copy and the consumer's quantize pass all move
    half the bytes (kernel-to-kernel int8 flow).

    ``carry`` enables the halo-carry path (spade_kernel._carried_rows).
    The h1 carry is bit-exact (bf16 rows; the per-band requant scale is
    re-derived from the assembled band, which carries the same values).
    The y carry keeps the scale PROVENANCE of the producing band — carried
    rows were dequantized with that band's s_h1 instead of the next
    band's, a sub-quantization-step numeric shift well inside the int8
    path's approximation envelope (accuracy bars: tools/accuracy_bar.py).
    """
    csum = sum(part_ch)
    up = tuple(up) if up else (False,) * n_parts
    down = tuple(down) if down else (False,) * n_parts

    def kernel(*refs):
        # operands: [qx_p ×P], [qlook_p ×P if look], Wq1, Wq2, Wqs,
        #           DQ (4,C) f32, K1s, K2s, K3s, [KF], [SEL down], out,
        #           [scratch_p ×P], [h1c, yc, [segc], actvc]
        nl = n_parts * (1 + int(look))
        qx = refs[:n_parts]
        qlook = refs[n_parts:nl]
        wq1_ref, wq2_ref, wqs_ref, dq_ref = refs[nl : nl + 4]
        k1s_ref, k2s_ref, k3s_ref = refs[nl + 4 : nl + 7]
        kf_ref = refs[nl + 7] if has_final else None
        nl += int(has_final)
        sel_ref = refs[nl + 7] if any(down) else None
        nl += int(any(down))
        o_ref = refs[nl + 7]
        scratch = refs[nl + 8 :]
        cscr = scratch[n_parts:]  # halo-carry refs (empty when carry=False)

        i = pl.program_id(1)
        cur = [qx[p][:] for p in range(n_parts)]

        def _compute():
            g0 = (i if look else i - 1) * th - 5  # global row of xh row 0
            first = i == 0 if look else i == 1
            xh_parts = []
            for p in range(n_parts):
                if up[p]:
                    xh_parts.append(
                        _upsample_on_read_s8(
                            scratch[p], cur[p], qlook[p], i, th, h_img
                        )
                    )  # (th+10, Cp, W) s8, expanded from th/2+10 half rows
                    continue
                if down[p]:
                    xh_parts.append(
                        _pool_on_read_s8(
                            scratch[p], cur[p], qlook[p], sel_ref, i, th,
                            h_img,
                        )
                    )  # (th+10, Cp, W) s8, pooled from 2·th+20 full rows
                    continue
                if look:  # scratch(5) | cur(th) | lookahead(5)
                    xh = jnp.concatenate(
                        [scratch[p][:], cur[p], qlook[p][0:5]], axis=0
                    )
                else:
                    xh = jnp.concatenate([scratch[p][:], cur[p][0:5]], axis=0)
                xh_parts.append(
                    _zero_outside_image(xh, g0, h_img)
                )  # (th+10, Cp, W) int8 — zero-point 0 keeps pad exact

            # pair mode (ops/stage_kernel.pair_dots_enabled): dq_ref is
            # pre-tiled to (5, 2C, W) and the weight matrices are 2-row
            # blocks — the per-row C-high s8 dots leave half the MXU's M
            # rows idle at C = 64 exactly like the bf16 kernel's
            dq = dq_ref[:]  # (5, C|2C, W) pre-tiled per-channel vectors
            d1, t1 = dq[0], dq[1]

            if pair:
                def h1_pair(g):
                    taps = []
                    for p in range(n_parts):
                        for m in range(4):
                            r = xh_parts[p][2 * g + m]
                            for dx in range(3):
                                taps.append(_shift_w(r, dx, sub_w))
                    x12 = jnp.concatenate(taps, axis=0)  # (12·ΣCp, W) s8
                    acc = jax.lax.dot_general(
                        wq1_ref[:], x12, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return jax.nn.relu(
                        _rowscale(acc.astype(jnp.float32), d1) + t1
                    ).astype(dtype)  # (2C, W)

                h1 = jnp.concatenate(
                    [h1_pair(g) for g in range((th + 8) // 2)], axis=0
                ).reshape(th + 8, c, w)
                h1 = _zero_outside_image(h1, g0 + 1, h_img)
            else:
                # conv1 (int8 MXU) + per-channel dequant + bn1 bias + relu
                def h1_row(t):
                    taps = []
                    for p in range(n_parts):
                        for dy in range(3):
                            r = xh_parts[p][t + dy]
                            for dx in range(3):
                                taps.append(_shift_w(r, dx, sub_w))
                    x9 = jnp.concatenate(taps, axis=0)  # (9·ΣCp, W) int8
                    acc = jax.lax.dot_general(
                        wq1_ref[:], x9, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    # per-row downcast: no live f32 slab
                    return jax.nn.relu(
                        _rowscale(acc.astype(jnp.float32), d1) + t1
                    ).astype(dtype)

                if carry:
                    h1 = _carried_rows(h1_row, th + 8, 8, cscr[0], first,
                                       g0 + 1, h_img)
                else:
                    h1 = jnp.stack([h1_row(t) for t in range(th + 8)], axis=0)
                    h1 = _zero_outside_image(h1, g0 + 1, h_img)  # (th+8, C, W)

            # per-band requantization of h1 (slab-local scale, see module doc)
            qh1, s_h1 = _quant_band(h1)

            d2 = dq[2] * s_h1  # conv2 dequant folds the band scale
            ds, t2 = dq[3], dq[4]

            if pair:
                def y_pair(g):
                    taps = []
                    for m in range(4):
                        r = qh1[2 * g + m]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx, sub_w))
                    h12 = jnp.concatenate(taps, axis=0)  # (12C, W) s8
                    acc2 = jax.lax.dot_general(
                        wq2_ref[:], h12, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    xrows = jnp.concatenate(
                        [
                            xh_parts[p][2 * g + 2 + j]
                            for p in range(n_parts)
                            for j in range(2)
                        ],
                        axis=0,
                    )  # (2·ΣCp, W) s8, part-major row-minor
                    accs = jax.lax.dot_general(
                        wqs_ref[:], xrows, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return jax.nn.relu(
                        _rowscale(acc2.astype(jnp.float32), d2)
                        + _rowscale(accs.astype(jnp.float32), ds)
                        + t2
                    ).astype(dtype)  # (2C, W)

                y = jnp.concatenate(
                    [y_pair(g) for g in range((th + 6) // 2)], axis=0
                ).reshape(th + 6, c, w)
                y = _zero_outside_image(y, g0 + 2, h_img)
            else:
                def y_row(t):
                    taps = []
                    for dy in range(3):
                        r = qh1[t + dy]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx, sub_w))
                    h9 = jnp.concatenate(taps, axis=0)  # (9C, W) int8
                    acc2 = jax.lax.dot_general(
                        wq2_ref[:], h9, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    xrow = jnp.concatenate(
                        [xh_parts[p][t + 2] for p in range(n_parts)], axis=0
                    )  # (ΣCp, W) int8
                    accs = jax.lax.dot_general(
                        wqs_ref[:], xrow, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return jax.nn.relu(
                        _rowscale(acc2.astype(jnp.float32), d2)
                        + _rowscale(accs.astype(jnp.float32), ds)
                        + t2
                    ).astype(dtype)

                if carry:
                    y = _carried_rows(y_row, th + 6, 6, cscr[1], first,
                                      g0 + 2, h_img)
                else:
                    y = jnp.stack([y_row(t) for t in range(th + 6)], axis=0)
                    y = _zero_outside_image(y, g0 + 2, h_img)  # (th+6, C, W)

            tail_carry = None
            if carry:
                tail_carry = (None if seg_r else cscr[2], cscr[-1], first)
            out = _spade_tail(
                y, g0 + 2, h_img, k1s_ref, k2s_ref, k3s_ref, dtype, sub_w,
                seg_r=seg_r, seg_lab=seg_lab, carry=tail_carry,
            )
            if out_inv_scale is not None:
                o_ref[:] = jnp.stack(
                    [
                        jnp.clip(
                            jnp.round(
                                out[t].astype(jnp.float32) * out_inv_scale
                            ),
                            -127, 127,
                        ).astype(jnp.int8)
                        for t in range(out.shape[0])
                    ],
                    axis=0,
                )
            elif not has_final:
                o_ref[:] = out
            else:
                ones_row = jnp.ones((1, w), dtype)
                fin_rows = []
                for t in range(th):
                    xr = jnp.concatenate([out[t], ones_row], axis=0)
                    fin_rows.append(
                        jnp.dot(kf_ref[:], xr, preferred_element_type=jnp.float32)
                    )
                o_ref[:] = jnp.stack(fin_rows, axis=0).astype(dtype)

        if look:
            # no prologue step (see ops/stage_kernel.set_lookahead): band i
            # computes from (5-row scratch | block i | 8-row lookahead)
            _compute()
            for p in range(n_parts):
                if down[p]:
                    scratch[p][:] = cur[p][2 * th - 10 :]
                else:
                    scratch[p][:] = cur[p][(th // 2 if up[p] else th) - 5 :]
        else:
            pl.when(i > 0)(_compute)

            # roll the int8 scratch: keep the last th+5 rows of
            # (scratch ∪ cur)
            for p in range(n_parts):
                tail = scratch[p][th:]  # last 5 rows (read before overwrite)

                @pl.when(i == 0)
                def _init(p=p):
                    scratch[p][0:5] = jnp.zeros_like(scratch[p][0:5])
                    scratch[p][5:] = cur[p]

                @pl.when(i > 0)
                def _roll(p=p, tail=tail):
                    scratch[p][0:5] = tail
                    scratch[p][5:] = cur[p]

    return kernel


def _stage_call_int8(parts_q, Wq1, Wq2, Wqs, DQ, K1s, K2s, K3s, th: int,
                     dtype, KF=None, sub_w: int = 0,
                     out_inv_scale: Optional[float] = None,
                     seg_r: int = 0, seg_lab: int = 0,
                     vmem_limit: Optional[int] = None,
                     up: Optional[Tuple[bool, ...]] = None,
                     pair: bool = False,
                     down: Optional[Tuple[bool, ...]] = None):
    """parts_q: list of (N, H, Cp, W) int8 views; returns (N, H, C_out, W)
    in ``dtype`` (C_out = stage width, or classes when KF folds the head),
    or int8 when ``out_inv_scale`` is set (kernel-to-kernel int8 flow).

    ``up[p]`` marks a HALF-H s8 part (a quantized :class:`ops.acts.UpTensor`
    payload) expanded on read inside the kernel — see
    ``ops.stage_kernel._stage_call``. The s8 expansion requantizes the
    2-tap lerp per row (the half tensor's scale IS the part scale folded
    into the weights, so requant is a plain round+clip)."""
    up = tuple(bool(u) for u in (up or (False,) * len(parts_q)))
    down = tuple(bool(u) for u in (down or (False,) * len(parts_q)))
    n = parts_q[0].shape[0]
    w = parts_q[0].shape[3] // (2 if down[0] else 1)
    h = parts_q[0].shape[1] * (2 if up[0] else 1) // (2 if down[0] else 1)
    # pair mode: the conv weight matrices are 2-row blocks (2C rows)
    c = Wq2.shape[0] // (2 if pair else 1)
    n_parts = len(parts_q)
    part_ch = tuple(p.shape[2] for p in parts_q)
    nh = h // th
    look = lookahead_enabled()
    assert not any(up) or (look and th % 16 == 0), (up, look, th)
    assert not any(down) or look, (down, look)
    assert not (any(down) and sub_w), "lane packing excludes pool-on-read"
    grid = (n, nh) if look else (n, nh + 1)
    c_out = c if KF is None else KF.shape[0]
    out_dtype = dtype if out_inv_scale is None else jnp.int8

    def cur_spec(p):
        tb = 2 * th if down[p] else th // 2 if up[p] else th
        wb = 2 * w if down[p] else w
        if look:
            return pl.BlockSpec(
                (None, tb, part_ch[p], wb),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, tb, part_ch[p], wb),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(p):
        tb = 2 * th if down[p] else th // 2 if up[p] else th
        hp = 2 * h if down[p] else h // 2 if up[p] else h
        wb = 2 * w if down[p] else w
        lb = 16 if down[p] else 8
        return pl.BlockSpec(
            (None, lb, part_ch[p], wb),
            lambda ni, hi, tb=tb, hp=hp, lb=lb: (
                ni, jnp.minimum((hi + 1) * (tb // lb), hp // lb - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi, _r=len(shape): (0,) * _r, memory_space=pltpu.VMEM
    )

    carry = halo_carry_enabled()
    scratch = [
        pltpu.VMEM(
            (10, part_ch[p], 2 * w) if down[p]
            else (5 if look else th + 5, part_ch[p], w),
            jnp.int8,
        )
        for p in range(n_parts)
    ]
    if carry:
        lab = seg_lab if seg_r else K1s.shape[0]
        scratch += [
            pltpu.VMEM((8, c, w), dtype),          # h1 carry (bf16, exact)
            pltpu.VMEM((6, c, w), dtype),          # y carry
        ]
        if not seg_r:
            scratch += [pltpu.VMEM((4, lab, w), dtype)]  # seg carry
        scratch += [pltpu.VMEM((2, K2s.shape[0], w), dtype)]  # actv carry

    weights = [Wq1, Wq2, Wqs, DQ, K1s, K2s, K3s] + ([] if KF is None else [KF])
    if any(down):
        import numpy as _np

        sel = _np.zeros((2 * w, w), _np.float32)
        sel[_np.arange(0, 2 * w, 2), _np.arange(w)] = 1.0
        weights += [jnp.asarray(sel, dtype)]  # bf16: s8 max isn't legal
    return pl.pallas_call(
        _make_kernel_int8(n_parts, th, c, w, part_ch, h, KF is not None, dtype,
                          sub_w, out_inv_scale, seg_r, seg_lab, carry=carry,
                          look=look, up=up, pair=pair, down=down),
        grid=grid,
        in_specs=(
            [cur_spec(p) for p in range(n_parts)]
            + ([look_spec(p) for p in range(n_parts)] if look else [])
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=pl.BlockSpec(
            (None, th, c_out, w),
            (lambda ni, hi: (ni, hi, 0, 0)) if look
            else (lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, c_out, w), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or _VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(*((list(parts_q) + list(parts_q)) if look else parts_q), *weights)


def _probe_compile_int8(h, w, part_ch, c, lab, nh, num_out, dtype, sub_w=0,
                        th=8, up=(), down=()) -> bool:
    """Probe-compile the INT8 stage program for one shape signature (the
    bf16 probe in ops/stage_kernel.py doesn't transfer: the s8 slabs halve
    the VMEM working set, which is exactly what lets the taller bands fit).
    Conservative configuration: bf16 output (no s8 emission), which is the
    largest output buffer this signature can need."""
    if _interpret():
        return True
    s = jax.ShapeDtypeStruct
    csum = sum(part_ch)
    up = tuple(up) if up else (False,) * len(part_ch)
    down = tuple(down) if down else (False,) * len(part_ch)
    dtype = jnp.dtype(dtype)
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled(True) else 0
    k1s_shape = (
        (seg_r * 8, 3 * (seg_r + 2) * c + 1) if seg_r else (lab, 9 * c + 1)
    )
    from ssunet_gan_tpu.ops.stage_kernel import pair_dots_enabled

    pair = pair_dots_enabled(c)
    m = 2 * c if pair else c
    if pair:
        conv_shapes = [
            s((m, 12 * csum), jnp.int8),  # Wq1 pair lhs
            s((m, 12 * c), jnp.int8),     # Wq2 pair lhs
            s((m, 2 * csum), jnp.int8),   # Wqs pair lhs
        ]
    else:
        conv_shapes = [
            s((c, 9 * csum), jnp.int8),   # Wq1
            s((c, 9 * c), jnp.int8),      # Wq2
            s((c, csum), jnp.int8),       # Wqs
        ]
    def part_shape(pi, cp):
        if up[pi]:
            return s((2, h // 2, cp, w), jnp.int8)
        if down[pi]:
            return s((2, 2 * h, cp, 2 * w), jnp.int8)
        return s((2, h, cp, w), jnp.int8)

    args = (
        # batch 2 forces the real cross-block double-buffering schedule
        # (see ops/stage_kernel._probe_compile)
        [part_shape(pi, cp) for pi, cp in enumerate(part_ch)]
        + conv_shapes
        + [
            s((5, m, w), jnp.float32),    # DQ (pre-tiled per-channel vecs)
            s(k1s_shape, dtype),          # K1s
            s((nh, 9 * lab + 1), dtype),  # K2s
            s((2 * c, 9 * nh + 1), dtype),  # K3s
        ]
        + ([] if num_out is None else [s((num_out, c + 1), dtype)])
    )

    def fn(*arrs):
        pq = list(arrs[: len(part_ch)])
        wq1, wq2, wqs, dq, k1s, k2s, k3s = arrs[len(part_ch) : len(part_ch) + 7]
        kf = arrs[len(part_ch) + 7] if num_out is not None else None
        return _stage_call_int8(
            pq, wq1, wq2, wqs, dq, k1s, k2s, k3s, th, dtype, KF=kf,
            sub_w=sub_w, seg_r=seg_r, seg_lab=lab,
            vmem_limit=_VMEM_LIMIT - _PROBE_MARGIN, up=up, pair=pair,
            down=down,
        )

    try:
        jax.jit(fn).lower(*args).compile()
        return True
    except Exception as e:  # Mosaic RESOURCE_EXHAUSTED / lowering failures
        import sys

        print(
            "fused-stage int8 probe failed for shape %s th=%d (%s); trying "
            "the next band height" % ((h, w, part_ch, c), th, type(e).__name__),
            file=sys.stderr,
        )
        return False


# ---------------------------------------------------------------------------
# Public entry: NHWC parts + module param bundles.
# ---------------------------------------------------------------------------


def fused_eval_stage_int8(
    parts: Sequence[Union[jax.Array, "QTensor"]],
    block_bundle: Tuple,
    spade_bundle: Tuple,
    final_head: Optional[Tuple] = None,
    calib_key: Optional[str] = None,
    out_abs_max: Optional[float] = None,
    emit_wminor: bool = False,
) -> Union[jax.Array, "QTensor"]:
    """int8 eval stage: quantize inputs (dynamic per-tensor, or static when
    ``calib_key`` hits installed calibration scales; a :class:`QTensor` part
    arrives already quantized by its producer), run the int8 rolling-halo
    kernel, emit the stage output (or folded logits) in the activation
    dtype — or, with ``out_abs_max`` (a static calibrated range), quantize
    the output in-kernel and return a :class:`QTensor` (kernel-to-kernel
    int8 flow: the HBM write, relayout and consumer quantize all move s8).

    Bundles are identical to :func:`ops.stage_kernel.fused_eval_stage`.
    Parts may be NHWC arrays, W-minor :class:`ops.acts.WTensor`\\ s or
    (either-orientation) QTensors; ``emit_wminor=True`` keeps the output in
    the kernel's W-minor orientation (ops/wminor.py) when no head is folded
    and no lane packing applies.
    """
    from ssunet_gan_tpu.ops.acts import (
        DownQTensor as _DnQ0,
        DownTensor as _DnT0,
        WTensor,
        materialize_down,
        materialize_down_q,
    )
    if _pack_factor(parts[0].shape[0], parts[0].shape[2]) > 1 and any(
        isinstance(p, (_DnT0, _DnQ0)) for p in parts
    ):
        # lane packing (deep/small widths) excludes pool-on-read
        parts = tuple(
            materialize_down(p) if isinstance(p, _DnT0)
            else materialize_down_q(p) if isinstance(p, _DnQ0)
            else p
            for p in parts
        )
    k1, (s1, t1), k2, (s2, t2), ks = block_bundle
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = spade_bundle
    dtype = parts[0].dtype
    c = k2.shape[-1]
    lab = k1s.shape[-1]
    nh = k2s.shape[-1]

    # quantize the stage inputs (XLA): static calibrated scales when
    # available, else per-tensor dynamic symmetric scales; QTensor parts
    # are already s8 with a known scale
    def _amax(i):
        if _CALIB_SCALES is None or calib_key is None:
            return None
        return _CALIB_SCALES.get(f"{calib_key}:{i}")

    def _amax_half(i):
        """Calibrated range for a lazy part's HALF-res payload: prefer the
        half-specific record (``"<stage>:<i>:half"``, written by
        ``models.ssunet._up`` during the calibration pass), falling back
        to the full tensor's range. NOTE each FULL row is a convex
        combination of HALF rows, so amax(full) ≤ amax(half): quantizing
        the half payload at the full tensor's range can clip half-row
        peaks the materialized path would keep (r4 advisor finding) —
        hence the dedicated half record."""
        if _CALIB_SCALES is None or calib_key is None:
            return None
        return _CALIB_SCALES.get(f"{calib_key}:{i}:half", _amax(i))

    def _qin(i, p):
        """Quantized W-minor (N, H, Cp, W) view + scale of part ``i``.

        An :class:`ops.acts.UpTensor` part quantizes its HALF-H payload
        against the half-specific calibrated range (see ``_amax_half``);
        the kernel expands + requantizes it on read."""
        from ssunet_gan_tpu.ops.acts import DownQTensor, DownTensor, UpTensor

        if isinstance(p, DownQTensor):
            return p.q, jnp.float32(p.scale)
        if isinstance(p, QTensor):
            q = p.q if p.wminor else jnp.swapaxes(p.q, 2, 3)
            return q, jnp.float32(p.scale)
        if isinstance(p, UpTensor):
            return quantize_tensor(p.v, _amax_half(i))
        if isinstance(p, DownTensor):
            # pool-on-read: quantize the FULL payload at the consumer's
            # recorded (pooled) range — amax(full) = amax(pooled), every
            # full value above the pooled range would be a window max
            return quantize_tensor(p.v, _amax(i))
        if isinstance(p, WTensor):
            return quantize_tensor(p.v, _amax(i))
        q, s = quantize_tensor(p, _amax(i))
        return jnp.swapaxes(q, 2, 3), s

    from ssunet_gan_tpu.ops.acts import DownQTensor as _DnQ
    from ssunet_gan_tpu.ops.acts import DownTensor as _DnT
    from ssunet_gan_tpu.ops.acts import UpTensor as _UpT

    up = tuple(isinstance(p, _UpT) for p in parts)
    down = tuple(isinstance(p, (_DnT, _DnQ)) for p in parts)
    qparts, sx = zip(*(_qin(i, p) for i, p in enumerate(parts)))

    # fold BN eval scale into conv weights, then the per-part input scale
    # into the corresponding weight columns, then per-row weight quant
    k1f = (k1 * s1).astype(jnp.float32)
    k2f = (k2 * s2).astype(jnp.float32)
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    k1_parts = [
        (k1f[:, :, offs[pi] : offs[pi + 1], :] * sx[pi])
        .reshape(9 * parts[pi].shape[-1], c).T
        for pi in range(len(parts))
    ]
    Wq1, d1 = _quant_rows(jnp.concatenate(k1_parts, axis=1))  # (C, 9ΣCp)
    Wq2, d2 = _quant_rows(k2f.reshape(9 * c, c).T)            # (C, 9C)
    if ks is None:  # shortcut-free (VGGBlock) stage: zero shortcut columns
        ks_parts = [jnp.zeros((c, p.shape[-1]), jnp.float32) for p in parts]
    else:
        ks_parts = [
            (ks[0, 0, offs[pi] : offs[pi + 1], :] * sx[pi]).astype(jnp.float32).T
            for pi in range(len(parts))
        ]
    Wqs, ds = _quant_rows(jnp.concatenate(ks_parts, axis=1))  # (C, ΣCp)
    # per-channel dequant/bias vectors, pre-tiled to (C, W) lanes: Mosaic
    # rejects (C,1)-shaped broadcasts in-kernel (r2 finding). Deep levels
    # lane-pack f images side by side, so tile to the PACKED width.
    f = _pack_factor(parts[0].shape[0], parts[0].shape[2])
    w_img = parts[0].shape[2] * f
    from ssunet_gan_tpu.ops.stage_kernel import (
        _pair_lhs_conv3,
        _pair_lhs_rows,
        pair_dots_enabled,
    )

    pair = pair_dots_enabled(c)
    if pair:
        # pair-stacked s8 dots (see ops/stage_kernel.set_pair_dots): the
        # 2-row-block lhs reuses the ALREADY-QUANTIZED rows (the zero
        # blocks are exact in s8, so the per-row scales carry over
        # unchanged — d/t vectors just duplicate)
        part_ch_ = [p.shape[-1] for p in parts]
        Wq1 = _pair_lhs_conv3(Wq1, [9 * cp for cp in part_ch_])
        Wq2 = _pair_lhs_conv3(Wq2, [9 * c])
        Wqs = _pair_lhs_rows(
            [Wqs[:, offs[pi] : offs[pi + 1]] for pi in range(len(parts))]
        )
        d1, t1, d2, ds, t2 = (
            jnp.concatenate([v, v]) for v in (d1, t1, d2, ds, t2)
        )
    DQ = jnp.stack(
        [
            jnp.tile(v.astype(jnp.float32)[:, None], (1, w_img))
            for v in (d1, t1, d2, ds, t2)
        ],
        axis=0,
    )  # (5, C|2C, W) f32

    # SPADE + final-head packing: identical to the bf16 kernel
    K1s = jnp.concatenate(
        [k1s.reshape(9 * c, lab).T, b1s.reshape(lab, 1)], axis=1
    ).astype(dtype)
    K2s = jnp.concatenate(
        [k2s.reshape(9 * lab, nh).T, b2s.reshape(nh, 1)], axis=1
    ).astype(dtype)
    K3s = jnp.concatenate(
        [
            jnp.concatenate([kgs.reshape(9 * nh, c).T, bgs.reshape(c, 1)], axis=1),
            jnp.concatenate([kbs.reshape(9 * nh, c).T, bbs.reshape(c, 1)], axis=1),
        ],
        axis=0,
    ).astype(dtype)

    KF = None
    if final_head is not None:
        kf, bf = final_head
        KF = jnp.concatenate(
            [kf[0, 0].T, bf.reshape(kf.shape[-1], 1)], axis=1
        ).astype(dtype)  # (ncls, C+1)

    out_inv = None
    s_out = None
    if out_abs_max is not None:
        assert final_head is None, "folded-head stages emit logits, not s8"
        s_out = max(float(out_abs_max) / 127.0, 1e-12)
        out_inv = 1.0 / s_out

    parts_q = list(qparts)  # (N, H, Cp, W) int8 (already W-minor via _qin)
    sub_w = parts_q[0].shape[-1] if f > 1 else 0
    if f > 1:
        parts_q = [_pack_lanes(q, f) for q in parts_q]
    # band height from the same (int8-program-probed) gate the dispatch used
    th = resolve_band_th(
        parts, c, lab, nh,
        None if final_head is None else KF.shape[0], pack=True, int8=True,
    )
    assert th is not None, "caller must gate with fused_stage_supported"
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled(True) else 0
    if seg_r:
        K1s = pack_seg_stacked(k1s, b1s, seg_r, dtype)
    outv = _stage_call_int8(
        parts_q, Wq1, Wq2, Wqs, DQ, K1s, K2s, K3s, th, dtype, KF=KF,
        sub_w=sub_w, out_inv_scale=out_inv, seg_r=seg_r, seg_lab=lab,
        up=up, pair=pair, down=down,
    )
    if f > 1:
        outv = _unpack_lanes(outv, f)
    elif emit_wminor and KF is None:
        if out_abs_max is not None:
            return QTensor(outv, s_out, dtype, wminor=True)
        return WTensor(outv)
    out = jnp.swapaxes(outv, 2, 3)
    if out_abs_max is not None:
        return QTensor(out, s_out, dtype)
    return out
