"""Pallas fused SPADE stage — the flagship's profiled #1 hot spot.

A self-SPADE stage (reference: /root/reference/scripts/normalization.py:94-120
with ``segmap = x``, as every ss-UNet uses it, archs.py:722) is

    seg  = conv3(x;  K1, b1)          # x2map,      C  → label
    actv = relu(conv3(seg; K2, b2))   # mlp_shared, label → nh
    out  = x·(1 + conv3(actv; Kγ,bγ)) + conv3(actv; Kβ,bβ)

XLA runs this as 4 convolutions + modulate at ~33 ms for a level-0 flagship
stage (b=32, 512², C=64): the narrow-output convs (3 and nh=C/16 channels)
map terribly onto the MXU with channels in lanes, and seg/actv/γ/β all round-
trip HBM.

The TPU-first decomposition here is ONE kernel over (N, H-band) tiles in
**W-minor orientation** (arrays viewed (N, H, C, W)): channels live in
sublanes, so a 3-channel conv output wastes 5/8 of a sublane group instead
of 125/128 of the lanes — ~10× better MXU utilization — and every
intermediate (seg, actv, γ|β) stays VMEM-resident.  Per tile:

- the H-halo (3 rings for the 3-conv chain) comes from two extra 8-row
  block views of the same x array with clamped index maps (no overlapping
  blocks needed), zero-masked at image edges;
- W-halos are lane shifts with zero edge masking (= conv pad 1);
- each conv is a batched MXU contraction: x2map as 9 per-tap
  (label, C)@(C, W) dots, mlp_shared and γ|β as single packed-tap dots
  ((nh, 9·label) and (2C, 9·nh) contractions);
- the modulate runs on the VPU and the only HBM traffic is x in, out out.

The (N,H,W,C)→(N,H,C,W) boundary views are plain ``swapaxes``; XLA's layout
assignment folds them into the neighbouring elementwise fusions (they
correspond to layout {2,3,1,0}, one of XLA's native choices here).

Backward: the custom VJP differentiates the identical XLA composition
(``_xla_self_spade``) — training forward gets the kernel, backward matches
today's XLA cost. A fused backward kernel is a later optimization.

Runs in Pallas interpret mode on CPU so the parity suite exercises the exact
kernel bodies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Mode toggle.
#
# Modes (all measured on v5e, flagship b=32 @512² bf16 — see BASELINE.md):
#   "off"    — the reference composition (4 separate convs + modulate).
#              143 tiles/s end-to-end. XLA's in-context lowering keeps every
#              SPADE tensor in layouts coherent with the neighbouring convs.
#   "fast"   — XLA-restructured γ/β: im2col the tiny actv and compute both
#              modulation maps as ONE wide-contraction 1×1 conv (K=9·nh
#              instead of the MXU-starving K=nh). Wins in isolation, LOSES
#              in-context (108.6 tiles/s): the 9-slice concat + 36-ch
#              tensor force layout churn that outweighs the MXU gain.
#   "pallas" — the whole-stage W-minor Pallas kernel below: 7.8 ms vs
#              34.6 ms for the isolated level-0 stage (4.4×), but XLA pins
#              conv layouts at the custom-call boundary and the relayout
#              copies of x (~79 ms/iter) eat the win end-to-end
#              (122 tiles/s).
#
# Auto (None) therefore resolves to "off"; the alternatives stay as
# explicit, fully-tested opt-ins for hardware/toolchains where the layout
# economics differ (the boundary-copy cost is an XLA/Mosaic artifact, not
# intrinsic to the kernel).  Booleans: True → "fast", False → "off".
# ---------------------------------------------------------------------------

_FUSED = None


def set_fused_spade(mode) -> None:
    """Select the SPADE implementation: None (auto → "off"), False/"off",
    True/"fast", or "pallas"."""
    global _FUSED
    _FUSED = mode


def fused_spade_mode() -> str:
    if _FUSED is None or _FUSED is False:
        return "off"
    if _FUSED is True:
        return "fast"
    return _FUSED


def fused_spade_enabled() -> bool:
    return fused_spade_mode() != "off"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Shared conv math (Conv2d.__call__ semantics for a single plain input).
# ---------------------------------------------------------------------------


def conv_apply(x: jax.Array, kernel: jax.Array, bias: jax.Array, pad: int) -> jax.Array:
    """The exact math of ``ops.conv.Conv2d`` for one NHWC input."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    return (y + bias.astype(y.dtype)).astype(x.dtype)


def _xla_self_spade(x, k1, b1, k2, b2, kg, bg, kb, bb):
    """Reference XLA composition of a self-SPADE stage (the oracle the kernel
    must match, and the function the custom VJP differentiates)."""
    seg = conv_apply(x, k1, b1, 1)
    actv = jax.nn.relu(conv_apply(seg, k2, b2, 1))
    gamma = conv_apply(actv, kg, bg, 1)
    beta = conv_apply(actv, kb, bb, 1)
    return x * (1 + gamma) + beta


# ---------------------------------------------------------------------------
# Kernel body.
# ---------------------------------------------------------------------------


def _shift_w(v: jax.Array, dx: int, sub_w: int = 0) -> jax.Array:
    """W-halo tap: position w reads input w+dx-1, zeros at the borders.

    ``sub_w`` > 0 marks a LANE-PACKED slab: the last axis holds
    ``W/sub_w`` independent images of width ``sub_w`` side by side (the
    deep-level packing that fills the 128-lane vector, stage_kernel.py),
    so the shift must not leak across image seams — the lane that would
    read its neighbour image's border column is zeroed instead.
    """
    if dx == 1:
        return v
    zero = jnp.zeros_like(v[..., :1])
    if dx == 0:
        out = jnp.concatenate([zero, v[..., :-1]], axis=-1)
    else:
        out = jnp.concatenate([v[..., 1:], zero], axis=-1)
    if sub_w and sub_w != v.shape[-1]:
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        seam = lane % sub_w == (0 if dx == 0 else sub_w - 1)
        out = jnp.where(seam, jnp.zeros_like(out), out)
    return out


def _dotb(k2d: jax.Array, slab: jax.Array, post=None) -> jax.Array:
    """(M, K) @ (T, K, W) → (T, M, W), f32 accumulation on the MXU.

    Unrolled per-T 2D dots with the SHARED lhs — a batched dot_general would
    broadcast-materialize T copies of the weight in VMEM (9.5 MB for the
    C=512 level), which blows the scoped-VMEM budget.  ``post`` applies a
    per-row epilogue before stacking (see :func:`_conv3_rows`).
    """
    outs = []
    for t in range(slab.shape[0]):
        acc = jax.lax.dot_general(
            k2d, slab[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(post(acc) if post is not None else acc)
    return jnp.stack(outs, axis=0)


def _tap_cat(src: jax.Array, th: int, sub_w: int = 0) -> jax.Array:
    """Stack the 9 (dy,dx) taps of ``src`` (T+2, F, W) along the channel
    (sublane) axis → (T, 9·F, W), tap-major to match packed kernels."""
    taps = []
    for dy in range(3):
        slab = src[dy : dy + th]
        for dx in range(3):
            taps.append(_shift_w(slab, dx, sub_w))
    return jnp.concatenate(taps, axis=1)


def _zero_outside_image(v: jax.Array, row0, h_img: int) -> jax.Array:
    """Zero slab rows whose global row index falls outside [0, h_img).

    ``row0`` is the global row of slab row 0 (can be negative at the top
    band); only edge bands have out-of-image rows.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + row0
    return jnp.where(
        jnp.logical_and(rows >= 0, rows < h_img), v, jnp.zeros_like(v)
    )


def _conv3_rows(slabs, kp, t_out: int, dtype, sub_w: int = 0, post=None):
    """3×3 conv (pad-1 in W, valid in H) over W-minor slabs via per-row
    packed-tap dots: for each output row, the 9 shifted taps of every input
    slab plus a ones-row (bias) concatenate on the contraction axis and hit
    the MXU as ONE ``(Cout, K) @ (K, W)`` matmul with a deep K — an order of
    magnitude better contraction utilization than per-tap narrow-K dots.

    ``slabs``: list of (t_out+2, Cp, W) inputs (split-concat conv parts);
    ``kp``: (Cout, Σ9·Cp [+extras..+1]) packed kernel, parts-major tap-major
    columns, bias LAST. ``extra`` rows (e.g. a fused 1×1-shortcut input) can
    be appended by the caller before the ones-row via ``extra_rows``.
    Returns (t_out, Cout, W) in f32, or in ``post``'s output dtype when a
    per-row epilogue is given.

    ``post`` (row f32 -> row) is applied to each row BEFORE stacking: the
    f32 dot results then never materialize as a full slab, which at tall
    bands halves the kernel's scoped-VMEM high-water (Mosaic tracks value
    liveness; a stacked f32 slab of th+8 rows is the single largest live
    value in the stage kernels).
    """
    row = _conv3_row_fn(slabs, kp, dtype, sub_w, post)
    return jnp.stack([row(t) for t in range(t_out)], axis=0)


def _conv3_row_fn(slabs, kp, dtype, sub_w: int = 0, post=None,
                  ones: Optional[bool] = None):
    """Row function of :func:`_conv3_rows` (``row(t) -> (Cout, W)``), for
    callers that compute arbitrary row subsets (the halo-carry path).

    ``ones`` controls the bias ones-row: None (default) derives it from
    the packed kernel's K — a kp with K = 9·ΣCp carries no bias column
    and the contraction stays exactly 9·ΣCp deep (a +1 column pushes the
    busiest decoder signatures over an exact 128-multiple of K, costing a
    whole extra MXU K-tile pass per row; bias-free callers — the train
    conv kernels packed a ZERO column historically — and bias-tile-mode
    callers add nothing/a pre-broadcast (C, W) tile in ``post``)."""
    w = slabs[0].shape[-1]
    if ones is None:
        ones = kp.shape[-1] != 9 * sum(s.shape[1] for s in slabs)
    ones_row = jnp.ones((1, w), dtype)

    def row(t):
        taps = []
        for slab in slabs:
            for dy in range(3):
                r = slab[t + dy]
                for dx in range(3):
                    taps.append(_shift_w(r, dx, sub_w))
        if ones:
            taps.append(ones_row)
        x9 = jnp.concatenate(taps, axis=0)
        acc = jnp.dot(kp, x9, preferred_element_type=jnp.float32)
        return post(acc) if post is not None else acc

    return row


def _carried_rows(row_fn, total: int, overlap: int, cref, first, row0, h_img):
    """Assemble a ``(total, C, W)`` intermediate whose leading ``overlap``
    rows are CARRIED from the previous band instead of recomputed.

    The rolling-halo kernels historically recomputed every intermediate's
    halo rows per band — (total)/(total−overlap)× redundant MXU work
    (1.25× for conv1 at th=32). Because each band's rows are a pure
    function of the (identical) underlying image rows, the previous band's
    trailing rows are bit-exact stand-ins: carry them in scratch ``cref``
    ((overlap, C, W)), seed it at the image's first compute band
    (``first``), and compute only rows [overlap, total) fresh. The FULL
    slab is re-masked against [0, h_img) — carried rows were masked with
    the same global row indices, so the mask is idempotent across bands.
    Writes the next band's carry (the trailing ``overlap`` rows) back.
    """

    @pl.when(first)
    def _seed():
        cref[:] = _zero_outside_image(
            jnp.stack([row_fn(t) for t in range(overlap)], axis=0),
            row0, h_img,
        ).astype(cref.dtype)

    new = jnp.stack([row_fn(t) for t in range(overlap, total)], axis=0)
    slab = jnp.concatenate([cref[:], new], axis=0)
    slab = _zero_outside_image(slab, row0, h_img)
    cref[:] = slab[total - overlap :]
    return slab


# ---------------------------------------------------------------------------
# Stacked seg-conv dots. The x2map conv emits ``label`` (= num_classes,
# typically 3) channels, so its per-row (lab, 9C+1) @ (9C+1, W) dot occupies
# 3/128 of the MXU's M rows while paying the SAME ceil(K/128) tile passes as
# the C-wide conv2 — ~25-30% of the stage kernel's MXU passes for ~3% of its
# FLOPs. Stacking r output rows per dot with a block-diagonal weight
# (M = r·8, lab padded to the 8-sublane granule Mosaic needs for the
# (t, 8, W) reshape) turns (th+4)·ceil(9C/128) passes into
# (th+4)/r · ceil(3(r+2)C/128) — ~3× fewer. Opt-in per call site via a
# stacked K1s packing (``pack_seg_stacked``) + ``seg_r``/``seg_lab`` args;
# the rhs is 3 dx-shifts of the whole (r+2)-row window (LESS tap-assembly
# VPU work than 9 shifts per row). Zero weight blocks contribute exact
# zeros, so the math is the per-row dot's up to f32 accumulation order.
# ---------------------------------------------------------------------------

_SEG_PAD = 8  # sublanes per stacked output row (Mosaic tile granule)


def pick_seg_r(t_out: int, rhs_bytes_per_row: int = 0) -> int:
    """Largest divisor r of ``t_out`` with r·8 MXU rows ≤ 128; 0 when
    stacking is pointless (r would be 1)."""
    best = 1
    for r in range(2, t_out + 1):
        if t_out % r == 0 and r * _SEG_PAD <= 128:
            best = r
    return best if best > 1 else 0


def pack_seg_stacked(k1s: jax.Array, b1s: jax.Array, r: int,
                     dtype) -> jax.Array:
    """Stacked block-diagonal x2map weight.

    ``k1s``: HWIO (3, 3, C, lab); ``b1s``: (lab,).  Returns
    (r·8, 3·(r+2)·C + 1): output row j's (dy, dx) taps sit at column block
    (dx-major, window row j+dy), matching the kernel's rhs =
    [dx 0..2 × window rows 0..r+1 of the slab | ones]; rows lab..7 of each
    group are zero (padding), the bias rides the last column."""
    c, lab = k1s.shape[2], k1s.shape[3]
    m = r + 2
    w = jnp.zeros((r, _SEG_PAD, 3, m, c), k1s.dtype)
    for j in range(r):
        for dy in range(3):
            for dx in range(3):
                w = w.at[j, :lab, dx, j + dy, :].set(k1s[dy, dx].T)
    lhs = w.reshape(r * _SEG_PAD, 3 * m * c)
    bias = (
        jnp.zeros((r, _SEG_PAD), k1s.dtype)
        .at[:, :lab].set(jnp.broadcast_to(b1s, (r, lab)))
        .reshape(r * _SEG_PAD, 1)
    )
    return jnp.concatenate([lhs, bias], axis=1).astype(dtype)


def _seg_rows_stacked(xh, k1_ref, t_out: int, r: int, lab: int, dtype,
                      sub_w: int):
    """x2map over ``xh`` ((t_out+2, C, W) slab) with stacked dots; returns
    (t_out, lab, W) in ``dtype``."""
    w = xh.shape[-1]
    groups = []
    for g in range(t_out // r):
        t0 = g * r
        blocks = [
            _shift_w(xh[t0 + mrow], dx, sub_w)
            for dx in range(3)
            for mrow in range(r + 2)
        ]
        blocks.append(jnp.ones((1, w), dtype))
        rhs = jnp.concatenate(blocks, axis=0)  # (3(r+2)C + 1, W)
        acc = jnp.dot(k1_ref[:], rhs, preferred_element_type=jnp.float32)
        groups.append(acc.astype(dtype))  # (r·8, W)
    seg8 = (groups[0] if len(groups) == 1
            else jnp.concatenate(groups, axis=0))
    return seg8.reshape(t_out, _SEG_PAD, w)[:, :lab]


def _spade_tail(xh, row0, h_img, k1_ref, k2_ref, k3_ref, dtype, sub_w: int = 0,
                seg_r: int = 0, seg_lab: int = 0, want_saved: bool = False,
                carry=None):
    """Self-SPADE on a W-minor slab ``xh`` of TH+6 rows (3 halo rings each
    side, already zeroed outside the image); returns the TH modulated rows.

    ``want_saved=True`` additionally returns the (TH-row, block-aligned)
    seg and actv intermediate slabs — the training tail kernel stores them
    so its custom VJP can run replay-free (ops/stage_kernel_train.py).

    ``seg_r`` > 0 switches the x2map conv to stacked dots: ``k1_ref`` must
    then hold the ``pack_seg_stacked`` packing and ``seg_lab`` the label
    count (the per-row packing infers it from the weight's row count).

    ``row0`` is the global image row of xh row 0 (for zeroing conv-chain
    intermediates outside [0, h_img) — each conv zero-pads its OWN input).
    Biases ride as an appended ones-channel on the matmul contraction (all
    packed kernels arrive with the bias column last) — the same conv+bias
    numerics, and no (f,1)-shaped broadcasts, which crash Mosaic's vector
    layout pass.

    ``carry`` = (segc_ref_or_None, actvc_ref, first) enables the
    halo-carry path (:func:`_carried_rows`): seg/actv halo rows come from
    the previous band's scratch instead of being recomputed (bit-exact —
    each row is a pure function of the same image rows). ``segc_ref`` is
    None under seg-stacked dots (stacked groups compute r rows at a time,
    which doesn't decompose into a per-row carry).
    """
    th = xh.shape[0] - 6
    c, w = xh.shape[1], xh.shape[2]
    segc_ref, actvc_ref, first = carry if carry is not None else (None,) * 3

    # x2map: per-row packed-tap dot (contraction 9·C+1), or stacked
    # block-diagonal dots (see pack_seg_stacked) when seg_r is set.
    if seg_r:
        seg = _seg_rows_stacked(xh, k1_ref, th + 4, seg_r, seg_lab, dtype,
                                sub_w)
        seg = _zero_outside_image(seg, row0 + 1, h_img)
    elif segc_ref is not None:
        seg_row = _conv3_row_fn([xh], k1_ref[:], dtype, sub_w,
                                post=lambda r: r.astype(dtype))
        seg = _carried_rows(seg_row, th + 4, 4, segc_ref, first,
                            row0 + 1, h_img)
    else:
        seg = _conv3_rows([xh], k1_ref[:], th + 4, dtype, sub_w,
                          post=lambda r: r.astype(dtype))
        seg = _zero_outside_image(seg, row0 + 1, h_img)

    # mlp_shared: packed 9·label(+bias) contraction + ReLU.
    if actvc_ref is not None:
        actv_row = _conv3_row_fn([seg], k2_ref[:], dtype, sub_w,
                                 post=lambda r: jax.nn.relu(r).astype(dtype))
        actv = _carried_rows(actv_row, th + 2, 2, actvc_ref, first,
                             row0 + 2, h_img)
    else:
        s9 = _tap_cat(seg, th + 2, sub_w)  # (TH+2, 9·lab, W)
        s9 = jnp.concatenate([s9, jnp.ones((th + 2, 1, w), dtype)], axis=1)
        actv = _dotb(k2_ref[:], s9,
                     post=lambda r: jax.nn.relu(r).astype(dtype))  # (TH+2, nh, W)
        actv = _zero_outside_image(actv, row0 + 2, h_img)

    # gamma|beta: packed 9·nh(+bias) contraction; modulate on the VPU.
    a9 = _tap_cat(actv, th, sub_w)  # (TH, 9·nh, W)
    a9 = jnp.concatenate([a9, jnp.ones((th, 1, w), dtype)], axis=1)
    # modulate in the activation dtype (the XLA path's bf16 semantics; f32
    # in f32 mode), per ROW right after its γ|β dot — a stacked (TH, 2C, W)
    # gb slab would be the tail's largest live value at tall bands
    one = jnp.ones((), dtype)
    rows = []
    for t in range(th):
        acc = jax.lax.dot_general(
            k3_ref[:], a9[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = acc.astype(dtype)  # (2C, W)
        xr = xh[3 + t]
        rows.append((xr * (one + g[:c]) + g[c:]).astype(dtype))
    out = jnp.stack(rows, axis=0)
    if want_saved:
        # block-aligned th rows of each intermediate (global rows
        # row0+3 .. row0+th+2): seg slab starts at row0+1, actv at row0+2
        th_ = out.shape[0]
        return out, seg[2 : th_ + 2], actv[1 : th_ + 1]
    return out


def _stage_kernel(xc_ref, xp_ref, xn_ref, k1_ref, k2_ref, k3_ref, o_ref):
    i = pl.program_id(1)
    n_bands = pl.num_programs(1)
    th = o_ref.shape[0]
    dtype = o_ref.dtype

    # H halo: last 3 rows of the previous 8-row view / first 3 of the next,
    # zeroed at the image's top/bottom edge (conv pad 1 × 3 convs).
    top = xp_ref[5:8]
    bot = xn_ref[0:3]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == n_bands - 1, jnp.zeros_like(bot), bot)
    xh = jnp.concatenate([top, xc_ref[:], bot], axis=0)  # (TH+6, C, W)

    o_ref[:] = _spade_tail(
        xh, i * th - 3, n_bands * th, k1_ref, k2_ref, k3_ref, dtype
    )


def _stage_core(xv, K1, K2, K3):
    n, h, c, w = xv.shape
    th = 16 if h % 16 == 0 else 8
    h8 = h // 8
    r = th // 8
    vmem = pl.BlockSpec
    grid = (n, h // th)

    return pl.pallas_call(
        _stage_kernel,
        grid=grid,
        in_specs=[
            vmem((None, th, c, w), lambda ni, hi: (ni, hi, 0, 0), memory_space=pltpu.VMEM),
            vmem(
                (None, 8, c, w),
                lambda ni, hi: (ni, jnp.maximum(hi * r - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            vmem(
                (None, 8, c, w),
                lambda ni, hi: (ni, jnp.minimum((hi + 1) * r, h8 - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            vmem(K1.shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM),
            vmem(K2.shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM),
            vmem(K3.shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=vmem((None, th, c, w), lambda ni, hi: (ni, hi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        interpret=_interpret(),
    )(xv, xv, xv, K1, K2, K3)


# ---------------------------------------------------------------------------
# Public entry with custom VJP.
# ---------------------------------------------------------------------------


def fused_spade_supported(x: jax.Array, ks: int) -> bool:
    """Static gate: 3×3 kernels, H a multiple of 8, and on real TPUs W ≥ 128.

    Levels with W < 128 waste 128/W of every VMEM lane (the kernel's W-minor
    blocks) and blow the scoped-VMEM budget at C=512 — and those deep levels
    are <10% of total SPADE cost, so they stay on the XLA path. Interpret
    mode (CPU tests) has no such limit and keeps small shapes for coverage.
    """
    h, w = x.shape[1], x.shape[2]
    min_w = 8 if _interpret() else 128
    return ks == 3 and h % 8 == 0 and h >= 8 and w >= min_w


@jax.custom_vjp
def fused_spade_stage(x, k1, b1, k2, b2, kg, bg, kb, bb):
    """Self-SPADE stage ``x → x·(1+γ(x)) + β(x)`` as one Pallas kernel.

    Exact math of normalization.py:94-120 with ``segmap = x``; weights are
    the module's HWIO conv params. Matmul accumulation is f32; intermediate
    seg/actv round to the activation dtype exactly like the XLA conv chain.
    """
    return _stage_fwd_impl(x, k1, b1, k2, b2, kg, bg, kb, bb)


def _stage_fwd_impl(x, k1, b1, k2, b2, kg, bg, kb, bb):
    n, h, w, c = x.shape
    lab = k1.shape[-1]
    nh = k2.shape[-1]
    xv = jnp.swapaxes(x, 2, 3)  # (N, H, C, W) — folds into neighbours' layouts
    # biases ride as an extra contraction column everywhere
    K1 = jnp.concatenate(
        [k1.reshape(9 * c, lab).T, b1.reshape(lab, 1)], axis=1
    ).astype(x.dtype)  # (lab, 9C+1), tap-major cols
    K2 = jnp.concatenate(
        [k2.reshape(9 * lab, nh).T, b2.reshape(nh, 1)], axis=1
    ).astype(x.dtype)  # (nh, 9·lab+1)
    K3 = jnp.concatenate(
        [
            jnp.concatenate([kg.reshape(9 * nh, c).T, bg.reshape(c, 1)], axis=1),
            jnp.concatenate([kb.reshape(9 * nh, c).T, bb.reshape(c, 1)], axis=1),
        ],
        axis=0,
    ).astype(x.dtype)  # (2C, 9·nh+1)
    outv = _stage_core(xv, K1, K2, K3)
    return jnp.swapaxes(outv, 2, 3)


def _stage_fwd_rule(x, k1, b1, k2, b2, kg, bg, kb, bb):
    out = _stage_fwd_impl(x, k1, b1, k2, b2, kg, bg, kb, bb)
    return out, (x, k1, b1, k2, b2, kg, bg, kb, bb)


def _stage_bwd_rule(res, g):
    # Differentiate the identical XLA composition — numerically the same
    # stage, autodiffed. Forward-in-training uses the kernel; the backward
    # pays one XLA replay (same as the pre-kernel cost structure).
    _, vjp = jax.vjp(_xla_self_spade, *res)
    return vjp(g)


fused_spade_stage.defvjp(_stage_fwd_rule, _stage_bwd_rule)


# ---------------------------------------------------------------------------
# "fast" mode: XLA-restructured γ/β + modulate.
# ---------------------------------------------------------------------------


def im2col_3x3(a: jax.Array) -> jax.Array:
    """(N,H,W,nh) → (N,H,W,9·nh): 3×3 neighborhoods, zero-padded border.
    Tap order matches an HWIO kernel reshaped to (9·nh, C)."""
    n, h, w, _ = a.shape
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [ap[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def fast_gamma_beta_modulate(
    x: jax.Array,
    actv: jax.Array,
    kg: jax.Array,
    bg: jax.Array,
    kb: jax.Array,
    bb: jax.Array,
) -> jax.Array:
    """``x·(1 + conv3(actv; Kγ,bγ)) + conv3(actv; Kβ,bβ)`` — restructured.

    The reference's two 3×3 convs contract only ``nh = C/16`` channels
    (K=4 at the flagship's top level → ~3% MXU contraction utilization).
    Stacking the 9 spatial taps of the *tiny* actv tensor (im2col) turns
    both convs into ONE 1×1 conv with a 9·nh-deep contraction and 2C
    outputs — full-lane MXU work — and XLA fuses the modulate into its
    epilogue. Exact same math, order-of-summation float difference only.
    """
    c = x.shape[-1]
    nh = actv.shape[-1]
    a9 = im2col_3x3(actv)
    k2 = jnp.concatenate([kg.reshape(9 * nh, c), kb.reshape(9 * nh, c)], axis=1)
    b2 = jnp.concatenate([bg, bb])
    gb = conv_apply(a9, k2.reshape(1, 1, 9 * nh, 2 * c), b2, 0)
    return x * (1 + gb[..., :c]) + gb[..., c:]
