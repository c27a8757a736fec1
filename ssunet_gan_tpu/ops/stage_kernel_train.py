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

Backward is a custom VJP that replays NOTHING (v2): the forward kernels
additionally save y (the post-relu block output) and the SPADE seg/actv
intermediates, so the backward reconstructs every pointwise/BN chain
analytically (including the batch-stat terms of the BN gradients) and runs
every heavy contraction — conv backward-data AND the conv weight-grads —
through the same rolling-halo Pallas kernels as the forward. Only γ|β are
recomputed (one cheap nh→2C conv beats storing two more full-width
tensors). Activations and cotangents stay in the kernels' W-minor
orientation end to end (``WTensor`` stage boundaries, ops/wminor.py), so
the NHWC↔W-minor relayouts that made v1 a measured net loss (BASELINE.md
r3 study: +41.8 ms/step boundary copies, +36.7 ms stranded pointwise)
disappear from the step. Gradients match the composition's (same transpose
rules autodiff uses; parity ≤1e-3 rel in f32, tests/test_train_kernel.py).

Running-stat updates stay OUTSIDE this pure function: the stage returns the
batch (mean, unbiased var) pairs and the flax dispatch writes them through
``BatchNorm(..., batch_stats=...)`` (torch momentum-0.1 semantics).

Scope: BasicBlock stages (the R_SS family — archs.py:205-241,469-671).
Multi-chip DP runs under ``jax.shard_map`` (train/step.py ``mesh=``): the
kernels see the local batch shard and SyncBN semantics come from psumming
the inter-kernel stat sums (ops/collectives.py); GSPMD traces keep the XLA
composition (no SPMD rule for the Pallas calls).

References: /root/reference/scripts/train.py:79-120 (the hot loop this
accelerates), archs.py:205-241, normalization.py:94-120.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssunet_gan_tpu.ops import collectives
from ssunet_gan_tpu.ops.acts import WTensor
from ssunet_gan_tpu.ops.spade_kernel import (
    _carried_rows,
    _conv3_rows,
    _interpret,
    _spade_tail,
    _xla_self_spade,
    _zero_outside_image,
    conv_apply,
)
from ssunet_gan_tpu.ops.stage_kernel import (
    _VMEM_LIMIT,
    _wminor_views,
    halo_carry_enabled,
    lookahead_enabled,
)

BN_EPS = 1e-5

# ---------------------------------------------------------------------------
# Mode toggle. Default ON for single-chip TPU: the v2 design (W-minor stage
# boundaries + replay-free analytic backward) MEASURED a 19% device-time win
# on v5e (r3 device trace, flagship b=8 @512² bf16): 163.6 ms/step fused vs
# the XLA composition's 201.8 ms (48.9 vs 39.6 img/s). v1's two regressions
# are gone — boundary relayouts (data formatting 48.7 → 10.4 ms, activations
# cross pool/unpool seams in kernel orientation) and forward replays in the
# VJP (the tail kernel saves y + SPADE intermediates; every pointwise/BN
# chain is reconstructed analytically). Remaining headroom: 47.5 ms of
# backward pointwise loop fusions and 29.6 ms of unfused XLA convs (deep
# levels + heads). Gradient parity ≤1e-3 rel f32 (tests/test_train_kernel.py).
# Multi-chip DP stays on the composition path (cross-device BN stats: under
# a mesh the composition's jnp.mean IS SyncBN; the kernel's in-VMEM stats
# would be per-shard), hence the device_count gate below.
# ---------------------------------------------------------------------------

_FUSED_TRAIN: Optional[bool] = None


def set_fused_train(enabled: Optional[bool]) -> None:
    global _FUSED_TRAIN
    _FUSED_TRAIN = enabled


def fused_train_enabled() -> bool:
    if _FUSED_TRAIN is None:
        # default ON for single-chip TPU, and for multi-chip DP when the
        # shard_map train path is active (collectives.train_axis — each
        # device runs the kernels on its local shard with psummed stats);
        # GSPMD multi-chip traces stay on the composition (no SPMD rule
        # for the Pallas calls)
        return jax.default_backend() == "tpu" and (
            jax.device_count() == 1
            or collectives.current_axis() is not None
        )
    return bool(_FUSED_TRAIN)


# Band height for the train kernels' rolling-halo grids, env/API-tunable
# (SSUNET_GAN_TPU_TRAIN_TH / set_train_band_th). r3 device-trace sweep on
# the flagship b=8 bf16 step (prologue grid): th=8 163.6 ms/step, th=16
# 158.9, th=32 159.4. r4 re-sweep under the lookahead grid: th=16 116.4,
# th=32 114.75 (device traces), th=64 Mosaic stack-OOM (65.5 MB > the
# 64 MB scoped cap — the fwd kernel, not probed like eval's tier).
# Default 32 (the r4 winner).
_TRAIN_TH = int(os.environ.get("SSUNET_GAN_TPU_TRAIN_TH", "32"))


def set_train_band_th(th: int) -> None:
    global _TRAIN_TH
    _TRAIN_TH = int(th)


def _pick_train_th(h: int) -> int:
    t = min(_TRAIN_TH, max(h, 8))
    while t > 8 and h % t:
        t //= 2
    return t


# v3 backward (ops/train_bwd.py): the pointwise/BN chains run INSIDE the
# backward-data/weight-grad kernels as prologues/epilogues instead of as XLA
# loop fusions over full-width f32 tensors (47.5 ms/step in the r3 v2
# profile). Same math/rounding points; env/API-toggleable for A/B sweeps.
_TRAIN_BWD_V3 = os.environ.get("SSUNET_GAN_TPU_TRAIN_BWD", "v3") != "v2"


def set_train_bwd_v3(enabled: bool) -> None:
    global _TRAIN_BWD_V3
    _TRAIN_BWD_V3 = bool(enabled)


# ---------------------------------------------------------------------------
# K1/K2: rolling-halo conv3 with channel-sum epilogue (and optional
# affine+relu prologue for K2).
# ---------------------------------------------------------------------------


def _make_conv_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                      h_img: int, has_prologue: bool, dtype,
                      look: bool = False):
    def kernel(*refs):
        # operands: [x_p ×P], [xlook_p ×P if look], K, [A, B], out, stats,
        #           [scratch_p ×P], acc
        nl = n_parts * (1 + int(look))
        xcur = refs[:n_parts]
        xlook = refs[n_parts:nl]
        k_ref = refs[nl]
        if has_prologue:
            a_ref, b_ref = refs[nl + 1 : nl + 3]
        o_ref = refs[nl + 1 + 2 * int(has_prologue)]
        s_ref = refs[nl + 2 + 2 * int(has_prologue)]
        scratch = refs[nl + 3 + 2 * int(has_prologue) : -1]
        acc_ref = refs[-1]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(jnp.logical_and(i == 0, ni == 0))
        def _zero_acc():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def _compute():
            g0 = (i if look else i - 1) * th - 1  # global row of xh row 0
            xh_parts = []
            for p in range(n_parts):
                if look:  # scratch(1) | cur(th) | lookahead(1)
                    xh = jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:1]], axis=0
                    )
                else:
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

        if look:
            _compute()
            for p in range(n_parts):
                scratch[p][:] = cur[p][th - 1 :]
        else:
            pl.when(i > 0)(_compute)

        s_ref[:] = acc_ref[:]

        if not look:
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
    th = _pick_train_th(h)
    nh = h // th
    look = lookahead_enabled() and th % 8 == 0 and h % 8 == 0
    grid = (n, nh) if look else (n, nh + 1)
    dtype = parts_v[0].dtype
    has_prologue = prologue is not None
    if has_prologue:
        assert n_parts == 1, "prologue supports a single input"

    def cur_spec(p):
        if look:
            return pl.BlockSpec(
                (None, th, part_ch[p], w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(p):
        return pl.BlockSpec(
            (None, 8, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum((hi + 1) * (th // 8), h // 8 - 1),
                            0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    weights = [Kp] + (list(prologue) if has_prologue else [])
    out, sums = pl.pallas_call(
        _make_conv_kernel(n_parts, th, c, w, part_ch, h, has_prologue, dtype,
                          look=look),
        grid=grid,
        in_specs=(
            [cur_spec(p) for p in range(n_parts)]
            + ([look_spec(p) for p in range(n_parts)] if look else [])
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=(
            pl.BlockSpec(
                (None, th, c, w),
                (lambda ni, hi: (ni, hi, 0, 0)) if look
                else (lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, c), lambda ni, hi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, c, w), dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((1 if look else th + 1, part_ch[p], w), dtype)
             for p in range(n_parts)]
            + [pltpu.VMEM((2, c), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*(list(parts_v) + list(parts_v) if look else list(parts_v)), *weights)
    return out, sums


# ---------------------------------------------------------------------------
# K3: bn2-affine + shortcut + relu + SPADE tail (+ optional final head).
# ---------------------------------------------------------------------------


def _make_tail_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                      h_img: int, has_final: bool, dtype,
                      carry: bool = False, look: bool = False):
    def kernel(*refs):
        # operands: f2, [x_p ×P], [f2look, xlook_p ×P if look],
        #           A2, B2, Ws, K1s, K2s, K3s, [KF],
        #           (out, y_sav, seg_sav, actv_sav),
        #           [scratch_f2, scratch_p ×P], [yc, segc, actvc]
        nl = (1 + n_parts) * (1 + int(look))
        f2cur = refs[0]
        xcur = refs[1 : 1 + n_parts]
        f2look = refs[1 + n_parts] if look else None
        xlook = refs[2 + n_parts : nl] if look else ()
        a_ref, b_ref, ws_ref = refs[nl : 3 + nl]
        k1s_ref, k2s_ref, k3s_ref = refs[3 + nl : 6 + nl]
        kf_ref = refs[6 + nl] if has_final else None
        o_base = 6 + nl + int(has_final)
        o_ref, y_ref, seg_ref, actv_ref = refs[o_base : o_base + 4]
        scratch_f2 = refs[o_base + 4]
        scratch = refs[o_base + 5 : o_base + 5 + n_parts]
        cscr = refs[o_base + 5 + n_parts :]  # halo-carry refs (may be empty)

        i = pl.program_id(1)
        f2c = f2cur[:]
        cur = [xcur[p][:] for p in range(n_parts)]

        def _compute():
            g0 = (i if look else i - 1) * th - 3  # global row of slab row 0
            first = i == 0 if look else i == 1
            if look:
                f2h = jnp.concatenate([scratch_f2[:], f2c, f2look[0:3]],
                                      axis=0)
                xh_parts = [
                    jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:3]], axis=0
                    )
                    for p in range(n_parts)
                ]
            else:
                f2h = jnp.concatenate([scratch_f2[:], f2c[0:3]], axis=0)
                xh_parts = [
                    jnp.concatenate([scratch[p][:], cur[p][0:3]], axis=0)
                    for p in range(n_parts)
                ]

            def y_row(t):
                xrow = jnp.concatenate(
                    [xh_parts[p][t] for p in range(n_parts)], axis=0
                )  # (ΣCp, W)
                sc = jax.lax.dot_general(
                    ws_ref[:], xrow, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return jax.nn.relu(
                    f2h[t].astype(jnp.float32) * a_ref[:] + b_ref[:] + sc
                ).astype(dtype)

            if carry:
                y = _carried_rows(y_row, th + 6, 6, cscr[0], first,
                                  g0, h_img)
            else:
                y = jnp.stack([y_row(t) for t in range(th + 6)], axis=0)
                y = _zero_outside_image(y, g0, h_img)  # (th+6, C, W)

            tail_carry = (cscr[1], cscr[2], first) if carry else None
            out, seg_sav, actv_sav = _spade_tail(
                y, g0, h_img, k1s_ref, k2s_ref, k3s_ref, dtype,
                want_saved=True, carry=tail_carry,
            )
            y_ref[:] = y[3 : 3 + th]
            seg_ref[:] = seg_sav
            actv_ref[:] = actv_sav
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

        if look:
            _compute()
            scratch_f2[:] = f2c[th - 3 :]
            for p in range(n_parts):
                scratch[p][:] = cur[p][th - 3 :]
            return

        pl.when(i > 0)(_compute)

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


def _tail_call(f2_v, parts_v, A2, B2, Ws, K1s, K2s, K3s, KF=None,
               lab: int = 0, nhid: int = 0):
    """Returns (out_v, y_v, seg_v, actv_v): the stage output plus the
    post-relu block output and the SPADE seg/actv intermediates the
    replay-free backward needs (``lab``/``nhid`` = their channel counts)."""
    n, h, c, w = f2_v.shape
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    th = _pick_train_th(h)
    nh = h // th
    look = lookahead_enabled() and th % 8 == 0 and h % 8 == 0
    grid = (n, nh) if look else (n, nh + 1)
    dtype = f2_v.dtype
    c_out = c if KF is None else KF.shape[0]

    def band_spec(ch):
        if look:
            return pl.BlockSpec(
                (None, th, ch, w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(ch):
        return pl.BlockSpec(
            (None, 8, ch, w),
            lambda ni, hi: (ni, jnp.minimum((hi + 1) * (th // 8), h // 8 - 1),
                            0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    carry = halo_carry_enabled()
    sc_rows = 3 if look else th + 3
    scratch = (
        [pltpu.VMEM((sc_rows, c, w), dtype)]
        + [pltpu.VMEM((sc_rows, part_ch[p], w), dtype) for p in range(n_parts)]
    )
    if carry:
        scratch += [
            pltpu.VMEM((6, c, w), dtype),     # y carry
            pltpu.VMEM((4, lab, w), dtype),   # seg carry
            pltpu.VMEM((2, nhid, w), dtype),  # actv carry
        ]
    weights = [A2, B2, Ws, K1s, K2s, K3s] + ([] if KF is None else [KF])
    operands = [f2_v] + list(parts_v)
    if look:
        operands = operands + operands
    return pl.pallas_call(
        _make_tail_kernel(n_parts, th, c, w, part_ch, h, KF is not None, dtype,
                          carry=carry, look=look),
        grid=grid,
        in_specs=(
            [band_spec(c)]
            + [band_spec(part_ch[p]) for p in range(n_parts)]
            + (
                [look_spec(c)]
                + [look_spec(part_ch[p]) for p in range(n_parts)]
                if look else []
            )
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=tuple(
            pl.BlockSpec(
                (None, th, ch, w),
                (lambda ni, hi: (ni, hi, 0, 0)) if look
                else (lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
                memory_space=pltpu.VMEM,
            )
            for ch in (c_out, c, lab, nhid)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, h, ch, w), dtype)
            for ch in (c_out, c, lab, nhid)
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands, *weights)


# ---------------------------------------------------------------------------
# Packing + the pure stage function with custom VJP.
# ---------------------------------------------------------------------------


def _pack_conv(k, part_ch, bias=None, dtype=jnp.bfloat16):
    """HWIO 3×3 kernel → (C, 9·ΣCp[+1]) parts-major tap-major, bias last
    when given. ``part_ch``: the per-part input channel counts.

    Bias-free packings carry NO trailing column (r5): the historical zero
    column pushed K past an exact 128-multiple at the flagship decoder
    signatures — a whole wasted MXU K-tile pass per row
    (``spade_kernel._conv3_row_fn`` derives the column's presence from
    the packed K)."""
    c = k.shape[-1]
    offs = [0]
    for cp in part_ch:
        offs.append(offs[-1] + cp)
    cols = [
        k[:, :, offs[pi] : offs[pi + 1], :].reshape(9 * part_ch[pi], c).T
        for pi in range(len(part_ch))
    ]
    if bias is not None:
        cols = cols + [bias.reshape(c, 1)]
    return jnp.concatenate(cols, axis=1).astype(dtype)


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

    ``parts`` may mix NHWC arrays and W-minor :class:`WTensor`\\ s
    (ops/wminor.py); the output is a :class:`WTensor` when no head folds
    (the training graph then stays in the kernels' orientation across the
    pool/unpool/upsample seams, exactly like the eval path), NHWC logits
    otherwise.

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
    # under the shard_map DP path the kernels see the LOCAL batch shard;
    # SyncBN semantics come from psumming the raw (Σx, Σx²) sums between
    # kernels and using the global element count (no-ops single-device)
    count = n * h * w * collectives.axis_size()
    part_ch = [p.shape[-1] for p in parts]

    parts_v = _wminor_views(parts)
    K1 = _pack_conv(k1, part_ch, dtype=dtype)
    f1_v, sums1 = _conv_stats_call(parts_v, K1)
    mean1, var1, uvar1 = _stats_from_sums(collectives.psum_if(sums1), count)
    a1, b1 = _affine(g1, be1, mean1, var1)

    K2 = _pack_conv(k2, [c], dtype=dtype)
    f2_v, sums2 = _conv_stats_call(
        [f1_v], K2, prologue=(_tile(a1, w), _tile(b1, w))
    )
    mean2, var2, uvar2 = _stats_from_sums(collectives.psum_if(sums2), count)
    a2, b2 = _affine(g2, be2, mean2, var2)

    offs = [0]
    for cp in part_ch:
        offs.append(offs[-1] + cp)
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

    lab, nhid = sp[0].shape[-1], sp[2].shape[-1]
    out_v, y_v, seg_v, actv_v = _tail_call(
        f2_v, parts_v, _tile(a2, w), _tile(b2, w), Ws, K1s, K2s, K3s, KF=KF,
        lab=lab, nhid=nhid,
    )
    out = jnp.swapaxes(out_v, 2, 3) if KF is not None else WTensor(out_v)
    stats = ((mean1, uvar1), (mean2, uvar2))
    aux = (f1_v, f2_v, y_v, seg_v, actv_v,
           (mean1, var1), (mean2, var2))
    return out, stats, aux


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dW[c, 9·ΣCp] = Σ_{n,rows} g_row (C, W) ·
# x9_rowᵀ (W, 9·ΣCp) — a deep-K (W-lane) MXU contraction per row,
# accumulated in an f32 VMEM scratch across the sequential grid.
# ---------------------------------------------------------------------------


def _make_wgrad_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                       h_img: int, has_prologue: bool = False,
                       look: bool = False):
    from ssunet_gan_tpu.ops.spade_kernel import _shift_w

    def kernel(*refs):
        nl = n_parts * (1 + int(look))
        xcur = refs[:n_parts]
        xlook = refs[n_parts:nl]
        g_ref = refs[nl]
        if has_prologue:
            a_ref, b_ref = refs[nl + 1 : nl + 3]
        o_ref = refs[nl + 1 + 2 * int(has_prologue)]
        scratch = refs[nl + 2 + 2 * int(has_prologue) : -1]
        acc_ref = refs[-1]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(jnp.logical_and(i == 0, ni == 0))
        def _zero_acc():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def _compute():
            g0 = (i if look else i - 1) * th - 1
            xh_parts = []
            for p in range(n_parts):
                if look:  # scratch(1) | cur(th) | lookahead(1)
                    xh = jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:1]], axis=0
                    )
                else:
                    xh = jnp.concatenate([scratch[p][:], cur[p][0:1]], axis=0)
                if has_prologue:  # relu(x·a+b): conv2's wgrad consumes h1r
                    xh = jax.nn.relu(
                        xh.astype(jnp.float32) * a_ref[:] + b_ref[:]
                    ).astype(xh.dtype)
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

        if look:
            _compute()
            for p in range(n_parts):
                scratch[p][:] = cur[p][th - 1 :]
            o_ref[:] = acc_ref[:]
            return

        pl.when(i > 0)(_compute)

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
    return _wgrad_w(
        [jnp.swapaxes(p, 2, 3) for p in x_parts], jnp.swapaxes(g, 2, 3),
        w_dtype,
    )


def _wgrad_w(parts_v, g_v, w_dtype=jnp.float32, prologue=None):
    """W-minor-native weight grad: dW (HWIO) of
    ``g = conv3(concat(parts), W)`` given (N, H, Cp, W) views. ``prologue``
    = optional (A, B) (Cin, W) f32 tiles: the conv's input was
    ``relu(x·A+B)`` (conv2's h1r), recomputed in-kernel from the raw x.
    Falls back to XLA (via the NHWC linear-transpose) off the support
    envelope."""
    csum = sum(p.shape[2] for p in parts_v)
    c = g_v.shape[2]
    n, h, _, w = parts_v[0].shape
    min_w = 8 if _interpret() else 128
    if not (h % 8 == 0 and h >= 8 and w >= min_w and c <= 256
            and 9 * csum <= 4608):
        x_parts = [jnp.swapaxes(p, 2, 3) for p in parts_v]
        if prologue is not None:
            a, b = prologue
            x_parts = [
                jax.nn.relu(
                    x_parts[0].astype(jnp.float32)
                    * a[:, 0][None, None, None]
                    + b[:, 0][None, None, None]
                ).astype(x_parts[0].dtype)
            ]
        g = jnp.swapaxes(g_v, 2, 3)
        k0 = jnp.zeros((3, 3, csum, c), w_dtype)
        return jax.linear_transpose(lambda k: _conv3(list(x_parts), k), k0)(g)[0]

    part_ch = tuple(p.shape[2] for p in parts_v)
    th = _pick_train_th(h)
    nh = h // th
    look = lookahead_enabled() and th % 8 == 0 and h % 8 == 0
    dtype = parts_v[0].dtype
    if prologue is not None:
        assert len(parts_v) == 1, "prologue supports a single input"

    def cur_spec(ch):
        if look:
            return pl.BlockSpec(
                (None, th, ch, w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(ch):
        return pl.BlockSpec(
            (None, 8, ch, w),
            lambda ni, hi: (ni, jnp.minimum((hi + 1) * (th // 8), h // 8 - 1),
                            0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _make_wgrad_kernel(len(parts_v), th, c, w, part_ch, h,
                           has_prologue=prologue is not None, look=look),
        grid=(n, nh) if look else (n, nh + 1),
        in_specs=(
            [cur_spec(part_ch[p]) for p in range(len(parts_v))]
            + ([look_spec(part_ch[p]) for p in range(len(parts_v))]
               if look else [])
            + [
                pl.BlockSpec(
                    (None, th, c, w),
                    (lambda ni, hi: (ni, hi, 0, 0)) if look
                    else (lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
                    memory_space=pltpu.VMEM,
                )
            ]
            + (
                []
                if prologue is None
                else [
                    pl.BlockSpec(
                        wt.shape, lambda ni, hi: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for wt in prologue
                ]
            )
        ),
        out_specs=pl.BlockSpec(
            (c, 9 * sum(part_ch)), lambda ni, hi: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, 9 * sum(part_ch)), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((1 if look else th + 1, part_ch[p], w), dtype)
             for p in range(len(parts_v))]
            + [pltpu.VMEM((c, 9 * sum(part_ch)), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*(list(parts_v) + list(parts_v) if look else list(parts_v)), g_v,
      *(() if prologue is None else tuple(prologue)))

    # unpack (C, parts-major tap-major cols) → HWIO (3, 3, ΣCp, C)
    blocks = []
    off = 0
    for cp in part_ch:
        blk = out[:, off : off + 9 * cp]  # (C, 9·Cp)
        blocks.append(blk.T.reshape(3, 3, cp, c))
        off += 9 * cp
    return jnp.concatenate(blocks, axis=2).astype(w_dtype)


# ---- backward: linear_transpose for the convs, vjp for the cheap chains ---


def _convT_w(g_v: jax.Array, k: jax.Array) -> jax.Array:
    """W-minor dx of ``y = conv3(x, k)`` (pad 1, stride 1): a 3×3 conv of
    the (N, H, Cout, W) cotangent with the 180°-rotated, I/O-swapped kernel
    — the backward data pass rides the SAME rolling-halo MXU kernel as the
    forward. XLA (NHWC) fallback off the support envelope."""
    kT = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    n, h, cg, w = g_v.shape
    min_w = 8 if _interpret() else 128
    ok = (h % 8 == 0 and h >= 8 and w >= min_w and cg <= 512
          and kT.shape[-1] <= 512)
    if not ok:
        g = jnp.swapaxes(g_v, 2, 3)
        out = conv_apply(g, kT, jnp.zeros((kT.shape[-1],), kT.dtype), 1)
        return jnp.swapaxes(out, 2, 3)
    Kp = _pack_conv(kT, [cg], dtype=g_v.dtype)
    out_v, _ = _conv_stats_call([g_v], Kp)
    return out_v


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
    out, stats, aux = _train_fwd_impl(parts, bp, sp, head)
    return (out, stats), (parts, bp, sp, head, aux)


def _cvec(v):
    """(C,) f32 vector → broadcastable over a W-minor (N, H, C, W) tensor."""
    return v[None, None, :, None]


def _train_bwd_rule(res, cts):
    """Replay-free analytic backward.

    Every heavy contraction (conv backward-data, conv weight-grads) rides
    the same rolling-halo Pallas kernels as the forward; the pointwise/BN
    chains are reconstructed analytically from the residuals the forward
    kernels SAVED (f1, f2, y, seg, actv — all W-minor), so nothing of the
    forward is recomputed except γ|β (one cheap nh→2C conv — cheaper than
    storing two more full-width tensors). Gradients match the composition's
    (same transpose rules autodiff applies; BN backward includes the
    batch-stat terms). All cotangents stay W-minor end to end.
    """
    parts, bp, sp, head, aux = res
    if _TRAIN_BWD_V3:
        from ssunet_gan_tpu.ops.train_bwd import bwd_v3_supported, train_bwd_v3

        if bwd_v3_supported(aux, [p.shape[-1] for p in parts]):
            return train_bwd_v3(res, cts)
    f1_v, f2_v, y_v, seg_v, actv_v, (mean1, var1), (mean2, var2) = aux
    k1, (g1, be1), k2, (g2, be2), ks = bp
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = sp
    g_out = cts[0]  # stats cotangents are zero (running-average side channel)
    g_out_v = g_out.v if isinstance(g_out, WTensor) else jnp.swapaxes(g_out, 2, 3)

    dtype = f1_v.dtype
    c = k2.shape[-1]
    n, hh, _, w = f1_v.shape
    count = n * hh * w * collectives.axis_size()  # global (shard_map DP)
    part_ch = [p.shape[-1] for p in parts]
    csum = sum(part_ch)
    parts_v = _wminor_views(parts)
    nhid = k2s.shape[-1]

    # --- γ|β recompute (one packed nh→2C conv; the kernels saved actv) ---
    k_gb = jnp.concatenate([kgs, kbs], axis=-1)  # (3, 3, nh, 2C)
    b_gb = jnp.concatenate([bgs, bbs])
    K_gb = _pack_conv(k_gb, [nhid], bias=b_gb, dtype=dtype)
    gb_v, _ = _conv_stats_call([actv_v], K_gb)  # (N, H, 2C, W) in dtype
    gamma_v, beta_v = gb_v[:, :, :c], gb_v[:, :, c:]

    # --- folded head: out = kf·out0 + bf ---
    if head is not None:
        kf, bf = head
        one = jnp.ones((), dtype)
        out0_v = (y_v * (one + gamma_v) + beta_v).astype(dtype)
        g_kf = (
            jnp.einsum(
                "nhfw,nhcw->cf",
                g_out_v.astype(jnp.float32),
                out0_v.astype(jnp.float32),
            )
            .reshape(1, 1, c, kf.shape[-1])
            .astype(kf.dtype)
        )
        g_bf = jnp.sum(g_out_v.astype(jnp.float32), axis=(0, 1, 3)).astype(bf.dtype)
        g_out0 = jnp.einsum(
            "cf,nhfw->nhcw", kf[0, 0].astype(dtype), g_out_v
        ).astype(dtype)
        g_head = (g_kf, g_bf)
    else:
        g_out0 = g_out_v
        g_head = None

    # --- SPADE modulate: out0 = y·(1+γ) + β ---
    g_f32 = g_out0.astype(jnp.float32)
    g_y = g_f32 * (1.0 + gamma_v.astype(jnp.float32))
    g_gamma = (g_f32 * y_v.astype(jnp.float32)).astype(dtype)
    g_beta = g_out0

    # --- γ|β convs: one packed convT to actv + one packed wgrad ---
    g_gb_v = jnp.concatenate([g_gamma, g_beta.astype(dtype)], axis=2)
    g_actv = _convT_w(g_gb_v, k_gb)  # (N, H, nh, W)
    g_kgb = _wgrad_w([actv_v], g_gb_v, k_gb.dtype)  # (3, 3, nh, 2C)
    g_kg, g_kb = g_kgb[..., :c], g_kgb[..., c:]
    g_bg = jnp.sum(g_gamma.astype(jnp.float32), axis=(0, 1, 3)).astype(bgs.dtype)
    g_bb = jnp.sum(g_beta.astype(jnp.float32), axis=(0, 1, 3)).astype(bbs.dtype)

    # --- mlp_shared relu + conv (actv = relu(conv(seg))) ---
    g_pre2s = jnp.where(actv_v > 0, g_actv, 0).astype(dtype)
    g_seg = _convT_w(g_pre2s, k2s)  # (N, H, lab, W)
    g_k2s = _wgrad_w([seg_v], g_pre2s, k2s.dtype)
    g_b2s = jnp.sum(g_pre2s.astype(jnp.float32), axis=(0, 1, 3)).astype(b2s.dtype)

    # --- x2map conv (seg = conv(y)) ---
    g_seg_d = g_seg.astype(dtype)
    g_y = g_y + _convT_w(g_seg_d, k1s).astype(jnp.float32)
    g_k1s = _wgrad_w([y_v], g_seg_d, k1s.dtype)
    g_b1s = jnp.sum(g_seg_d.astype(jnp.float32), axis=(0, 1, 3)).astype(b1s.dtype)

    # --- block relu: y = relu(ynorm + shortcut) ---
    g_pre = jnp.where(y_v > 0, g_y, 0.0)  # f32

    # --- shortcut (1×1): W-minor einsums ---
    g_pre_d = g_pre.astype(dtype)
    xcat_v = parts_v[0] if len(parts_v) == 1 else jnp.concatenate(parts_v, axis=2)
    g_xcat_sc = jnp.einsum(
        "ic,nhcw->nhiw", ks[0, 0].astype(dtype), g_pre_d
    ).astype(jnp.float32)
    g_ks = (
        jnp.einsum(
            "nhcw,nhiw->ic",
            g_pre_d.astype(jnp.float32),
            xcat_v.astype(jnp.float32),
        )
        .reshape(1, 1, csum, c)
        .astype(ks.dtype)
    )

    # --- bn2 (batch stats; gradient includes the μ/σ terms) ---
    r2 = jax.lax.rsqrt(var2 + BN_EPS)
    xhat2 = (f2_v.astype(jnp.float32) - _cvec(mean2)) * _cvec(r2)
    # param grads stay LOCAL partial sums (the DP wrapper pmeans the grad
    # tree); the batch-stat terms of the input grad need the GLOBAL sums —
    # that psum is exactly the transpose of the forward's stat psum
    s_g2 = jnp.sum(g_pre, axis=(0, 1, 3))
    s_gx2 = jnp.sum(g_pre * xhat2, axis=(0, 1, 3))
    g_g2 = s_gx2.astype(g2.dtype)
    g_be2 = s_g2.astype(be2.dtype)
    s_g2g, s_gx2g = collectives.psum_if(s_g2), collectives.psum_if(s_gx2)
    g_f2 = (
        _cvec(g2 * r2)
        * (g_pre - _cvec(s_g2g) / count - xhat2 * (_cvec(s_gx2g) / count))
    ).astype(dtype)

    # --- conv2: backward-data + weight grad (h1r recomputed in-kernel) ---
    a1, b1 = _affine(g1, be1, mean1, var1)
    g_h1r = _convT_w(g_f2, k2)
    g_k2 = _wgrad_w([f1_v], g_f2, k2.dtype,
                    prologue=(_tile(a1, w), _tile(b1, w)))

    # --- bn1 + relu (h1r = relu(bn1(f1))) ---
    r1 = jax.lax.rsqrt(var1 + BN_EPS)
    xhat1 = (f1_v.astype(jnp.float32) - _cvec(mean1)) * _cvec(r1)
    pre1 = xhat1 * _cvec(g1) + _cvec(be1)
    g_n1 = jnp.where(pre1 > 0, g_h1r.astype(jnp.float32), 0.0)
    s_g1 = jnp.sum(g_n1, axis=(0, 1, 3))
    s_gx1 = jnp.sum(g_n1 * xhat1, axis=(0, 1, 3))
    g_g1 = s_gx1.astype(g1.dtype)
    g_be1 = s_g1.astype(be1.dtype)
    s_g1g, s_gx1g = collectives.psum_if(s_g1), collectives.psum_if(s_gx1)
    g_f1 = (
        _cvec(g1 * r1)
        * (g_n1 - _cvec(s_g1g) / count - xhat1 * (_cvec(s_gx1g) / count))
    ).astype(dtype)

    # --- conv1: backward-data + weight grad ---
    g_xcat1 = _convT_w(g_f1, k1)  # (N, H, ΣCp, W)
    g_k1 = _wgrad_w(parts_v, g_f1, k1.dtype)

    # --- combine the two input-gradient paths, restore each part's form ---
    g_xcat = g_xcat_sc + g_xcat1.astype(jnp.float32)
    g_parts = []
    off = 0
    for p, cp in zip(parts, part_ch):
        gv = g_xcat[:, :, off : off + cp].astype(p.dtype)
        g_parts.append(
            WTensor(gv) if isinstance(p, WTensor) else jnp.swapaxes(gv, 2, 3)
        )
        off += cp
    g_bp = (g_k1, (g_g1, g_be1), g_k2, (g_g2, g_be2), g_ks)
    g_sp = (g_k1s, g_b1s, g_k2s, g_b2s, g_kg, g_bg, g_kb, g_bb)
    return tuple(g_parts), g_bp, g_sp, g_head


fused_train_stage.defvjp(_train_fwd_rule, _train_bwd_rule)
