"""Training-mode fused [BasicBlock + self-SPADE] stage.

The r2 device profile put the training step at 86% convolution fusions
running ~27% MFU, while the eval-mode fused stage kernels run the same
contractions at 40-44% (BASELINE.md).  Eval folds BatchNorm into static
affines; training cannot — batch statistics are data-dependent and sit
BETWEEN the two convs — so the stage splits into three rolling-halo Pallas
programs with two tiny XLA stat barriers:

    K1: f1 = conv1(x)                      + per-channel (Σ, Σx²) of f1
    XLA: μ₁/σ₁ from the sums → affine a₁,b₁ (γ·rsqrt, β−μ·…)
    K2: f2 = conv2(relu(f1·a₁+b₁))         + per-channel (Σ, Σx²) of f2
    XLA: μ₂/σ₂ → a₂,b₂
    K3: y = relu(f2·a₂+b₂ + shortcut(x));  out = SPADE tail (+optional
        folded final 1×1 head)

The conv dots are the eval kernels' per-row deep-K packed-tap MXU
contractions; the stat sums ride a tiny f32 VMEM accumulator across the
(sequential) grid and cost one (2, C) store.  Per-channel affines enter the
kernels pre-broadcast as (C, W) tiles — elementwise on the slab rows, no
(C,1) vector broadcasts (Mosaic rejects those layouts, CLAUDE.md).

Backward is a custom VJP that does NOT replay the heavy convolutions: the
conv transposes come from ``jax.linear_transpose`` (dx and dW of a linear
conv evaluate only the transposed contraction), and only the cheap
pointwise/BN-stat/SPADE chains are replayed via ``jax.vjp``.  Gradients are
therefore exactly the composition's (same transpose rules autodiff uses).

Running-stat updates stay OUTSIDE this pure function: the stage returns the
batch (mean, unbiased var) pairs and the flax dispatch writes them through
``BatchNorm(..., batch_stats=...)`` (torch momentum-0.1 semantics).

Scope: BasicBlock stages (the R_SS family — archs.py:205-241,469-671),
single-device meshes (training under multi-chip DP needs cross-device BN
stats — the XLA composition path keeps providing exactly that).

References: /root/reference/scripts/train.py:79-120 (the hot loop this
accelerates), archs.py:205-241, normalization.py:94-120.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssunet_gan_tpu.ops.spade_kernel import (
    _conv3_rows,
    _interpret,
    _spade_tail,
    _xla_self_spade,
    _zero_outside_image,
    conv_apply,
)
from ssunet_gan_tpu.ops.stage_kernel import _VMEM_LIMIT

BN_EPS = 1e-5

# ---------------------------------------------------------------------------
# Mode toggle: OPT-IN (default OFF). MEASURED NEGATIVE end-to-end on v5e
# (r3 device trace, flagship b=8 @512² bf16): 250.4 ms/step fused vs the
# XLA composition's 202.8 ms. The kernels do cut the conv compute itself
# (conv+custom-call 143 ms vs XLA's 174.8 ms of conv fusions), but the
# 3-program-per-stage structure adds W-minor boundary relayouts in both
# directions (data formatting 6.9 → 48.7 ms) and strands the BN/ReLU
# pointwise chains outside the conv fusions XLA would otherwise bury them
# in (loop fusion 14.5 → 51.3 ms). Recovering the win needs a single-
# program whole-stage train kernel (phase-gridded two-pass stats) — future
# work; until then the XLA composition is the right default. Gradient
# parity tests keep the opt-in sound. Multi-chip DP must stay on the
# composition path regardless (cross-device BN stats).
# ---------------------------------------------------------------------------

_FUSED_TRAIN: Optional[bool] = None


def set_fused_train(enabled: Optional[bool]) -> None:
    global _FUSED_TRAIN
    _FUSED_TRAIN = enabled


def fused_train_enabled() -> bool:
    if _FUSED_TRAIN is None:
        return False
    return bool(_FUSED_TRAIN)


# ---------------------------------------------------------------------------
# K1/K2: rolling-halo conv3 with channel-sum epilogue (and optional
# affine+relu prologue for K2).
# ---------------------------------------------------------------------------


def _make_conv_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                      h_img: int, has_prologue: bool, dtype):
    def kernel(*refs):
        # operands: [x_p ×P], K, [A, B], out, stats, [scratch_p ×P], acc
        xcur = refs[:n_parts]
        k_ref = refs[n_parts]
        if has_prologue:
            a_ref, b_ref = refs[n_parts + 1 : n_parts + 3]
        o_ref = refs[n_parts + 1 + 2 * int(has_prologue)]
        s_ref = refs[n_parts + 2 + 2 * int(has_prologue)]
        scratch = refs[n_parts + 3 + 2 * int(has_prologue) : -1]
        acc_ref = refs[-1]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(jnp.logical_and(i == 0, ni == 0))
        def _zero_acc():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i > 0)
        def _compute():
            g0 = (i - 1) * th - 1  # global image row of xh row 0
            xh_parts = []
            for p in range(n_parts):
                xh = jnp.concatenate([scratch[p][:], cur[p][0:1]], axis=0)
                if has_prologue:  # relu(f1·a+b) in f32, rounded like XLA BN
                    xh = jax.nn.relu(
                        xh.astype(jnp.float32) * a_ref[:] + b_ref[:]
                    ).astype(dtype)
                xh_parts.append(_zero_outside_image(xh, g0, h_img))

            out = _conv3_rows(xh_parts, k_ref[:], th, dtype).astype(dtype)
            o_ref[:] = out
            of = out.astype(jnp.float32)
            acc_ref[0] = acc_ref[0] + jnp.sum(of, axis=(0, 2))
            acc_ref[1] = acc_ref[1] + jnp.sum(of * of, axis=(0, 2))

        s_ref[:] = acc_ref[:]

        for p in range(n_parts):
            tail = scratch[p][th:]  # last 1 row (read before overwrite)

            @pl.when(i == 0)
            def _init(p=p):
                scratch[p][0:1] = jnp.zeros_like(scratch[p][0:1])
                scratch[p][1:] = cur[p]

            @pl.when(i > 0)
            def _roll(p=p, tail=tail):
                scratch[p][0:1] = tail
                scratch[p][1:] = cur[p]

    return kernel


def _conv_stats_call(parts_v, Kp, prologue=None):
    """parts_v: (N, H, Cp, W) views; Kp: (C, 9·ΣCp+1) packed (bias last,
    zeros when none). ``prologue``: optional (A, B) (Cin, W) f32 tiles for
    relu(x·A+B) on the (single-part) input. Returns (out, sums) with sums
    (2, C) f32 = (Σ, Σx²) of out over N,H,W."""
    n, h, _, w = parts_v[0].shape
    c = Kp.shape[0]
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    th = 8
    nh = h // th
    grid = (n, nh + 1)
    dtype = parts_v[0].dtype
    has_prologue = prologue is not None
    if has_prologue:
        assert n_parts == 1, "prologue supports a single input"

    def cur_spec(p):
        return pl.BlockSpec(
            (None, th, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    weights = [Kp] + (list(prologue) if has_prologue else [])
    out, sums = pl.pallas_call(
        _make_conv_kernel(n_parts, th, c, w, part_ch, h, has_prologue, dtype),
        grid=grid,
        in_specs=(
            [cur_spec(p) for p in range(n_parts)]
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=(
            pl.BlockSpec(
                (None, th, c, w),
                lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, c), lambda ni, hi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, c, w), dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((th + 1, part_ch[p], w), dtype) for p in range(n_parts)]
            + [pltpu.VMEM((2, c), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*parts_v, *weights)
    return out, sums


# ---------------------------------------------------------------------------
# K3: bn2-affine + shortcut + relu + SPADE tail (+ optional final head).
# ---------------------------------------------------------------------------


def _make_tail_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                      h_img: int, has_final: bool, dtype):
    def kernel(*refs):
        # operands: f2, [x_p ×P], A2, B2, Ws, K1s, K2s, K3s, [KF],
        #           out, [scratch_f2, scratch_p ×P]
        f2cur = refs[0]
        xcur = refs[1 : 1 + n_parts]
        a_ref, b_ref, ws_ref = refs[1 + n_parts : 4 + n_parts]
        k1s_ref, k2s_ref, k3s_ref = refs[4 + n_parts : 7 + n_parts]
        kf_ref = refs[7 + n_parts] if has_final else None
        o_ref = refs[7 + n_parts + int(has_final)]
        scratch_f2 = refs[8 + n_parts + int(has_final)]
        scratch = refs[9 + n_parts + int(has_final) :]

        i = pl.program_id(1)
        f2c = f2cur[:]
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(i > 0)
        def _compute():
            g0 = (i - 1) * th - 3  # global image row of slab row 0
            f2h = jnp.concatenate([scratch_f2[:], f2c[0:3]], axis=0)
            xh_parts = [
                jnp.concatenate([scratch[p][:], cur[p][0:3]], axis=0)
                for p in range(n_parts)
            ]

            y_rows = []
            for t in range(th + 6):
                xrow = jnp.concatenate(
                    [xh_parts[p][t] for p in range(n_parts)], axis=0
                )  # (ΣCp, W)
                sc = jax.lax.dot_general(
                    ws_ref[:], xrow, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y_rows.append(
                    jax.nn.relu(
                        f2h[t].astype(jnp.float32) * a_ref[:] + b_ref[:] + sc
                    )
                )
            y = jnp.stack(y_rows, axis=0).astype(dtype)
            y = _zero_outside_image(y, g0, h_img)  # (th+6, C, W)

            out = _spade_tail(y, g0, h_img, k1s_ref, k2s_ref, k3s_ref, dtype)
            if not has_final:
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

        tail_f2 = scratch_f2[th:]

        @pl.when(i == 0)
        def _init_f2():
            scratch_f2[0:3] = jnp.zeros_like(scratch_f2[0:3])
            scratch_f2[3:] = f2c

        @pl.when(i > 0)
        def _roll_f2(tail_f2=tail_f2):
            scratch_f2[0:3] = tail_f2
            scratch_f2[3:] = f2c

        for p in range(n_parts):
            tail = scratch[p][th:]

            @pl.when(i == 0)
            def _init(p=p):
                scratch[p][0:3] = jnp.zeros_like(scratch[p][0:3])
                scratch[p][3:] = cur[p]

            @pl.when(i > 0)
            def _roll(p=p, tail=tail):
                scratch[p][0:3] = tail
                scratch[p][3:] = cur[p]

    return kernel


def _tail_call(f2_v, parts_v, A2, B2, Ws, K1s, K2s, K3s, KF=None):
    n, h, c, w = f2_v.shape
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    th = 8
    nh = h // th
    grid = (n, nh + 1)
    dtype = f2_v.dtype
    c_out = c if KF is None else KF.shape[0]

    def band_spec(ch):
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    weights = [A2, B2, Ws, K1s, K2s, K3s] + ([] if KF is None else [KF])
    return pl.pallas_call(
        _make_tail_kernel(n_parts, th, c, w, part_ch, h, KF is not None, dtype),
        grid=grid,
        in_specs=(
            [band_spec(c)]
            + [band_spec(part_ch[p]) for p in range(n_parts)]
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=pl.BlockSpec(
            (None, th, c_out, w),
            lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, c_out, w), dtype),
        scratch_shapes=(
            [pltpu.VMEM((th + 3, c, w), dtype)]
            + [pltpu.VMEM((th + 3, part_ch[p], w), dtype) for p in range(n_parts)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(f2_v, *parts_v, *weights)


# ---------------------------------------------------------------------------
# Packing + the pure stage function with custom VJP.
# ---------------------------------------------------------------------------


def _pack_conv(k, parts, bias=None, dtype=jnp.bfloat16):
    """HWIO 3×3 kernel → (C, 9·ΣCp+1) parts-major tap-major, bias last."""
    c = k.shape[-1]
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    cols = [
        k[:, :, offs[pi] : offs[pi + 1], :].reshape(9 * parts[pi].shape[-1], c).T
        for pi in range(len(parts))
    ]
    b = jnp.zeros((c, 1), k.dtype) if bias is None else bias.reshape(c, 1)
    return jnp.concatenate(cols + [b], axis=1).astype(dtype)


def _pack_spade(sp, c, dtype):
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = sp
    lab = k1s.shape[-1]
    nh = k2s.shape[-1]
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
    return K1s, K2s, K3s


def _stats_from_sums(sums, count):
    mean = sums[0] / count
    var = jnp.maximum(sums[1] / count - mean * mean, 0.0)  # biased
    unbiased = var * (count / max(count - 1, 1))
    return mean, var, unbiased


def _affine(scale, bias, mean, var):
    a = scale * jax.lax.rsqrt(var + BN_EPS)
    return a, bias - mean * a


def _tile(v, w):
    return jnp.tile(v[:, None], (1, w)).astype(jnp.float32)


@jax.custom_vjp
def fused_train_stage(parts: Tuple, bp: Tuple, sp: Tuple, head):
    """Training-mode fused stage. Returns (out, ((μ₁, uσ₁²), (μ₂, uσ₂²)))
    — the batch stats feed the BNs' running-average updates outside.

    ``bp`` = (k1, (γ₁, β₁), k2, (γ₂, β₂), ks) raw train params from
    ``BasicBlock.__call__(None, True)``; ``sp`` as the eval kernel;
    ``head`` = optional (kf, bf) final 1×1 conv fold.
    """
    out, stats, _ = _train_fwd_impl(parts, bp, sp, head)
    return out, stats


def _train_fwd_impl(parts, bp, sp, head):
    k1, (g1, be1), k2, (g2, be2), ks = bp
    dtype = parts[0].dtype
    c = k2.shape[-1]
    n, h, w = parts[0].shape[0], parts[0].shape[1], parts[0].shape[2]
    count = n * h * w

    parts_v = [jnp.swapaxes(p, 2, 3) for p in parts]
    K1 = _pack_conv(k1, parts, dtype=dtype)
    f1_v, sums1 = _conv_stats_call(parts_v, K1)
    mean1, var1, uvar1 = _stats_from_sums(sums1, count)
    a1, b1 = _affine(g1, be1, mean1, var1)

    K2 = _pack_conv(k2, [f1_v.swapaxes(2, 3)], dtype=dtype)
    f2_v, sums2 = _conv_stats_call(
        [f1_v], K2, prologue=(_tile(a1, w), _tile(b1, w))
    )
    mean2, var2, uvar2 = _stats_from_sums(sums2, count)
    a2, b2 = _affine(g2, be2, mean2, var2)

    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    Ws = jnp.concatenate(
        [ks[0, 0, offs[pi] : offs[pi + 1], :].T for pi in range(len(parts))],
        axis=1,
    ).astype(dtype)
    K1s, K2s, K3s = _pack_spade(sp, c, dtype)
    KF = None
    if head is not None:
        kf, bf = head
        KF = jnp.concatenate(
            [kf[0, 0].T, bf.reshape(kf.shape[-1], 1)], axis=1
        ).astype(dtype)

    out_v = _tail_call(
        f2_v, parts_v, _tile(a2, w), _tile(b2, w), Ws, K1s, K2s, K3s, KF=KF
    )
    out = jnp.swapaxes(out_v, 2, 3)
    stats = ((mean1, uvar1), (mean2, uvar2))
    residuals = (f1_v.swapaxes(2, 3), f2_v.swapaxes(2, 3))
    return out, stats, residuals


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dW[c, 9·ΣCp] = Σ_{n,rows} g_row (C, W) ·
# x9_rowᵀ (W, 9·ΣCp) — a deep-K (W-lane) MXU contraction per row,
# accumulated in an f32 VMEM scratch across the sequential grid.
# ---------------------------------------------------------------------------


def _make_wgrad_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                       h_img: int):
    from ssunet_gan_tpu.ops.spade_kernel import _shift_w

    def kernel(*refs):
        xcur = refs[:n_parts]
        g_ref = refs[n_parts]
        o_ref = refs[n_parts + 1]
        scratch = refs[n_parts + 2 : -1]
        acc_ref = refs[-1]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(jnp.logical_and(i == 0, ni == 0))
        def _zero_acc():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i > 0)
        def _compute():
            g0 = (i - 1) * th - 1
            xh_parts = []
            for p in range(n_parts):
                xh = jnp.concatenate([scratch[p][:], cur[p][0:1]], axis=0)
                xh_parts.append(_zero_outside_image(xh, g0, h_img))
            gband = g_ref[:]  # (th, C, W), all rows in-image
            for t in range(th):
                taps = []
                for p in range(n_parts):
                    for dy in range(3):
                        r = xh_parts[p][t + dy]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx))
                x9 = jnp.concatenate(taps, axis=0)  # (9·ΣCp, W)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    gband[t], x9, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        o_ref[:] = acc_ref[:]

        for p in range(n_parts):
            tail = scratch[p][th:]

            @pl.when(i == 0)
            def _init(p=p):
                scratch[p][0:1] = jnp.zeros_like(scratch[p][0:1])
                scratch[p][1:] = cur[p]

            @pl.when(i > 0)
            def _roll(p=p, tail=tail):
                scratch[p][0:1] = tail
                scratch[p][1:] = cur[p]

    return kernel


def _wgrad_supported(g: jax.Array, csum: int) -> bool:
    h, w, c = g.shape[1], g.shape[2], g.shape[3]
    min_w = 8 if _interpret() else 128
    return (h % 8 == 0 and h >= 8 and w >= min_w and c <= 256
            and 9 * csum <= 4608)


def _conv3_wgrad(x_parts, g, w_dtype=jnp.float32):
    """dW (HWIO, (3,3,ΣCp,C)) of ``g = conv3(concat(x_parts), W)`` in the
    weight's dtype (params are f32 even under bf16 activations)."""
    csum = sum(p.shape[-1] for p in x_parts)
    c = g.shape[-1]
    if not _wgrad_supported(g, csum):
        # XLA fallback: transpose the linear map in the weight argument
        k0 = jnp.zeros((3, 3, csum, c), w_dtype)
        return jax.linear_transpose(lambda k: _conv3(list(x_parts), k), k0)(g)[0]

    parts_v = [jnp.swapaxes(p, 2, 3) for p in x_parts]
    g_v = jnp.swapaxes(g, 2, 3)
    n, h, _, w = parts_v[0].shape
    part_ch = tuple(p.shape[2] for p in parts_v)
    th = 8
    nh = h // th
    dtype = parts_v[0].dtype

    def cur_spec(ch):
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _make_wgrad_kernel(len(x_parts), th, c, w, part_ch, h),
        grid=(n, nh + 1),
        in_specs=(
            [cur_spec(part_ch[p]) for p in range(len(x_parts))]
            + [
                pl.BlockSpec(
                    (None, th, c, w),
                    lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
        ),
        out_specs=pl.BlockSpec(
            (c, 9 * sum(part_ch)), lambda ni, hi: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, 9 * sum(part_ch)), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((th + 1, part_ch[p], w), dtype) for p in range(len(x_parts))]
            + [pltpu.VMEM((c, 9 * sum(part_ch)), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*parts_v, g_v)

    # unpack (C, parts-major tap-major cols) → HWIO (3, 3, ΣCp, C)
    blocks = []
    off = 0
    for cp in part_ch:
        blk = out[:, off : off + 9 * cp]  # (C, 9·Cp)
        blocks.append(blk.T.reshape(3, 3, cp, c))
        off += 9 * cp
    return jnp.concatenate(blocks, axis=2).astype(w_dtype)


# ---- backward: linear_transpose for the convs, vjp for the cheap chains ---


def _convT_supported(g: jax.Array) -> bool:
    """Gate for running a conv-transpose through the Pallas conv kernel."""
    h, w, c = g.shape[1], g.shape[2], g.shape[3]
    min_w = 8 if _interpret() else 128
    return h % 8 == 0 and h >= 8 and w >= min_w and c <= 256


def _convT(g: jax.Array, k: jax.Array) -> jax.Array:
    """dx of ``y = conv3(x, k)`` (pad 1, stride 1): a 3×3 conv of the
    cotangent with the 180°-rotated, I/O-swapped kernel — so the backward
    data pass rides the SAME rolling-halo MXU kernel as the forward."""
    kT = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    if not _convT_supported(g) or kT.shape[-1] > 512:
        return conv_apply(g, kT, jnp.zeros((kT.shape[-1],), kT.dtype), 1)
    gv = jnp.swapaxes(g, 2, 3)
    Kp = _pack_conv(kT, [g], dtype=g.dtype)
    out_v, _ = _conv_stats_call([gv], Kp)
    return jnp.swapaxes(out_v, 2, 3)


def _conv3(x_parts, k):
    xcat = (
        x_parts[0]
        if len(x_parts) == 1
        else jnp.concatenate(list(x_parts), axis=-1)
    )
    return conv_apply(xcat, k, jnp.zeros((k.shape[-1],), k.dtype), 1)


def _bn_relu(x, gamma, beta):
    """Train BN (batch stats, two-pass like the module) + relu, f32 in/out
    rounding to x.dtype — matches the composition numerics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    return jax.nn.relu(y.astype(x.dtype))


def _xla_train_stage(parts, bp, sp, head):
    """The pure XLA composition of the same stage (parity oracle)."""
    k1, (g1, be1), k2, (g2, be2), ks = bp
    f1 = _conv3(parts, k1)
    h1r = _bn_relu(f1, g1, be1)
    f2 = _conv3([h1r], k2)
    xf2 = f2.astype(jnp.float32)
    mean2 = jnp.mean(xf2, axis=(0, 1, 2))
    var2 = jnp.mean(jnp.square(xf2 - mean2), axis=(0, 1, 2))
    ynorm = (xf2 - mean2) * jax.lax.rsqrt(var2 + BN_EPS) * g2 + be2
    xcat = parts[0] if len(parts) == 1 else jnp.concatenate(list(parts), axis=-1)
    shortcut = conv_apply(xcat, ks, jnp.zeros((ks.shape[-1],), ks.dtype), 0)
    y = jax.nn.relu(ynorm.astype(f2.dtype) + shortcut)
    out = _xla_self_spade(y, *sp)
    if head is not None:
        kf, bf = head
        out = conv_apply(out, kf, bf, 0)
    uvar = lambda v, n: v * (n / max(n - 1, 1))
    count = parts[0].shape[0] * parts[0].shape[1] * parts[0].shape[2]
    xf1 = f1.astype(jnp.float32)
    mean1 = jnp.mean(xf1, axis=(0, 1, 2))
    var1 = jnp.mean(jnp.square(xf1 - mean1), axis=(0, 1, 2))
    return out, ((mean1, uvar(var1, count)), (mean2, uvar(var2, count)))


def _train_fwd_rule(parts, bp, sp, head):
    out, stats, (f1, f2) = _train_fwd_impl(parts, bp, sp, head)
    return (out, stats), (parts, bp, sp, head, f1, f2)


def _train_bwd_rule(res, cts):
    parts, bp, sp, head, f1, f2 = res
    g_out = cts[0]  # stats cotangents are zero (running-average side channel)
    k1, (g1, be1), k2, (g2, be2), ks = bp

    # --- tail chain: bn2(batch stats) + shortcut + relu + SPADE (+head) ---
    def tail_fn(f2, parts, g2, be2, ks, sp, head):
        xf2 = f2.astype(jnp.float32)
        mean2 = jnp.mean(xf2, axis=(0, 1, 2))
        var2 = jnp.mean(jnp.square(xf2 - mean2), axis=(0, 1, 2))
        ynorm = (xf2 - mean2) * jax.lax.rsqrt(var2 + BN_EPS) * g2 + be2
        xcat = (
            parts[0] if len(parts) == 1 else jnp.concatenate(list(parts), axis=-1)
        )
        shortcut = conv_apply(xcat, ks, jnp.zeros((ks.shape[-1],), ks.dtype), 0)
        y = jax.nn.relu(ynorm.astype(f2.dtype) + shortcut)
        out = _xla_self_spade(y, *sp)
        if head is not None:
            kf, bf = head
            out = conv_apply(out, kf, bf, 0)
        return out

    _, tail_vjp = jax.vjp(tail_fn, f2, tuple(parts), g2, be2, ks, sp, head)
    g_f2, g_parts_a, g_g2, g_be2, g_ks, g_sp, g_head = tail_vjp(g_out)

    # --- conv2: backward-data AND weight grad through rolling-halo Pallas
    # kernels (no forward replay either way) ---
    h1r_fn = lambda f1: _bn_relu(f1, g1, be1)
    h1r, h1r_vjp = jax.vjp(h1r_fn, f1)
    g_h1r = _convT(g_f2, k2)
    g_k2 = _conv3_wgrad([h1r], g_f2, k2.dtype)
    # bn1 params: replay the cheap pointwise chain for their grads
    _, bn1_vjp = jax.vjp(lambda g, b: _bn_relu(f1, g, b), g1, be1)
    g_g1, g_be1 = bn1_vjp(g_h1r)
    (g_f1,) = h1r_vjp(g_h1r)

    # --- conv1: same split ---
    g_xcat = _convT(g_f1, k1)
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    g_parts_b = tuple(
        g_xcat[..., offs[i] : offs[i + 1]] for i in range(len(parts))
    )
    g_k1 = _conv3_wgrad(list(parts), g_f1, k1.dtype)

    g_parts = tuple(
        a + b for a, b in zip(g_parts_a, g_parts_b)
    )
    g_bp = (g_k1, (g_g1, g_be1), g_k2, (g_g2, g_be2), g_ks)
    return g_parts, g_bp, g_sp, g_head


fused_train_stage.defvjp(_train_fwd_rule, _train_bwd_rule)
