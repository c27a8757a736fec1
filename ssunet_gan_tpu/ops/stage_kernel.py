"""Fused eval-mode [BasicBlock + self-SPADE] stage — one Pallas program.

The flagship's runtime is dominated by BasicBlock convs + SPADE per stage
(SURVEY §3; r2 device profile: conv fusions 192 ms of 220 ms/iter at b=32).
XLA runs each conv as a separate HBM round trip at ~25% MXU utilization for
the 64-channel levels; a Pallas custom call in the middle of that chain pays
~5-6 ms/GB relayout copies at the layout boundary (BASELINE.md r2 study).

This kernel fuses the ENTIRE stage

    y   = relu(bn2(conv2(relu(bn1(conv1(x))))) + shortcut_conv(x))
    out = y·(1 + γ(y)) + β(y)                         # self-SPADE

in W-minor orientation with BatchNorm folded to per-channel affines (eval
semantics — training takes the XLA path via the module fallback). Because
EVERY stage is fused, stage outputs feed stage inputs (and the
layout-flexible pools/resizes between them) without conv-layout pinning, so
the boundary-copy tax that killed the SPADE-only kernel disappears from the
graph.

Halo strategy: sequential rolling scratch. The grid walks H-bands lag-one:
step ``i`` loads band ``i`` of x, keeps the previous ``TH+5`` rows in VMEM
scratch, and emits output band ``i-1`` (which needs x rows ±5: 2 convs + 3
SPADE rings). x is read exactly once; the out block for ``i-1`` is revisited
(garbage at step 0 never reaches HBM). Split-concat (tuple) inputs — the
decoder's ``conv(cat(enc, up))`` — ride as separate operand/scratch pairs
with the conv kernels sliced per part, exactly like ``ops.conv.Conv2d``.

References: archs.py:205-241 (BasicBlock), normalization.py:94-120 (SPADE),
archs.py:559-671 (stage structure).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssunet_gan_tpu.ops.spade_kernel import (
    _dotb,
    _interpret,
    _shift_w,
    _spade_tail,
    _zero_outside_image,
)

# ---------------------------------------------------------------------------
# Mode toggle: None = auto (currently off — flip after it measures faster
# end-to-end; see BASELINE.md), False/True explicit.
# ---------------------------------------------------------------------------

_FUSED_STAGE: Optional[bool] = None


def set_fused_stage(enabled: Optional[bool]) -> None:
    global _FUSED_STAGE
    _FUSED_STAGE = enabled


def fused_stage_enabled() -> bool:
    if _FUSED_STAGE is None:
        return False
    return bool(_FUSED_STAGE)


def fused_stage_supported(parts: Sequence[jax.Array], planes: int) -> bool:
    """Static gate: eval-size constraints for the W-minor kernel."""
    h, w = parts[0].shape[1], parts[0].shape[2]
    if any(p.shape[1] != h or p.shape[2] != w for p in parts):
        return False
    min_w = 8 if _interpret() else 128
    return len(parts) <= 2 and h % 8 == 0 and h >= 8 and w >= min_w and planes <= 256


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------


def _make_kernel(n_parts: int, th: int, c: int, w: int, part_ch, h_img: int):
    def kernel(*refs):
        # operand order: [xcur_p ×P] [K1_p ×P] [Ks_p ×P] K2, K1s, b1s, K2s,
        #                K3s, out, [scratch_p ×P]
        xcur = refs[:n_parts]
        k1 = refs[n_parts : 2 * n_parts]
        ksc = refs[2 * n_parts : 3 * n_parts]
        k2_ref, k1s_ref, b1s_ref, k2s_ref, k3s_ref = refs[3 * n_parts : 3 * n_parts + 5]
        o_ref = refs[3 * n_parts + 5]
        scratch = refs[3 * n_parts + 6 :]

        i = pl.program_id(1)
        dtype = o_ref.dtype
        cur = [xcur[p][:] for p in range(n_parts)]

        @pl.when(i > 0)
        def _compute():
            g0 = (i - 1) * th - 5  # global image row of xh row 0
            ones1 = jnp.ones((th + 8, 1, w), dtype)

            # h1 = relu(bn1-folded conv1(x)) over all parts' taps
            h1 = None
            first = True
            xh_parts = []
            for p in range(n_parts):
                xh = jnp.concatenate([scratch[p][:], cur[p][0:5]], axis=0)
                xh = _zero_outside_image(xh, g0, h_img).astype(dtype)
                xh_parts.append(xh)  # (th+10, Cp, W)
                cp = part_ch[p]
                for dy in range(3):
                    slab = xh[dy : dy + th + 8]
                    for dx in range(3):
                        kt = k1[p][:, (dy * 3 + dx) * cp : (dy * 3 + dx + 1) * cp]
                        sl = _shift_w(slab, dx)
                        if first:  # folded bn1 offset rides the first tap
                            kt = jnp.concatenate(
                                [kt, k1[p][:, 9 * cp :]], axis=1
                            )
                            sl = jnp.concatenate([sl, ones1], axis=1)
                            first = False
                        t = _dotb(kt, sl)
                        h1 = t if h1 is None else h1 + t
            h1 = jax.nn.relu(h1).astype(dtype)
            h1 = _zero_outside_image(h1, g0 + 1, h_img)  # (th+8, C, W)

            # h2 = bn2-folded conv2(h1); shortcut = 1×1 conv over parts
            ones2 = jnp.ones((th + 6, 1, w), dtype)
            h2 = None
            for dy in range(3):
                slab = h1[dy : dy + th + 6]
                for dx in range(3):
                    kt = k2_ref[:, (dy * 3 + dx) * c : (dy * 3 + dx + 1) * c]
                    sl = _shift_w(slab, dx)
                    if dy == 0 and dx == 0:
                        kt = jnp.concatenate([kt, k2_ref[:, 9 * c :]], axis=1)
                        sl = jnp.concatenate([sl, ones2], axis=1)
                    t = _dotb(kt, sl)
                    h2 = t if h2 is None else h2 + t
            for p in range(n_parts):
                h2 = h2 + _dotb(ksc[p][:], xh_parts[p][2 : 2 + th + 6])

            y = jax.nn.relu(h2).astype(dtype)
            y = _zero_outside_image(y, g0 + 2, h_img)  # (th+6, C, W)

            o_ref[:] = _spade_tail(
                y, g0 + 2, h_img, k1s_ref, b1s_ref, k2s_ref, k3s_ref, dtype
            )

        # roll the scratch: keep the last th+5 rows of (scratch ∪ cur)
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


def _stage_call(parts_v, K1, Ks, K2, K1s, b1s, K2s, K3s, th: int):
    """parts_v: list of (N, H, Cp, W) views; returns (N, H, C, W)."""
    n, h, _, w = parts_v[0].shape
    c = K2.shape[0]
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    nh = h // th
    grid = (n, nh + 1)
    dtype = parts_v[0].dtype

    def cur_spec(p):
        return pl.BlockSpec(
            (None, th, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        _make_kernel(n_parts, th, c, w, part_ch, h),
        grid=grid,
        in_specs=(
            [cur_spec(p) for p in range(n_parts)]
            + [const(K1[p].shape) for p in range(n_parts)]
            + [const(Ks[p].shape) for p in range(n_parts)]
            + [const(K2.shape), const(K1s.shape), const(b1s.shape),
               const(K2s.shape), const(K3s.shape)]
        ),
        out_specs=pl.BlockSpec(
            (None, th, c, w),
            lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 5, part_ch[p], w), dtype) for p in range(n_parts)
        ],
        interpret=_interpret(),
    )(*parts_v, *K1, *Ks, K2, K1s, b1s, K2s, K3s)


# ---------------------------------------------------------------------------
# Public entry: NHWC parts + module param bundles.
# ---------------------------------------------------------------------------


def fused_eval_stage(
    parts: Sequence[jax.Array],
    block_bundle: Tuple,
    spade_bundle: Tuple,
) -> jax.Array:
    """Eval-mode BasicBlock + self-SPADE stage as one Pallas program.

    ``block_bundle`` comes from ``BasicBlock.__call__(None, ...)``:
    ``(k1, (s1, t1), k2, (s2, t2), ks)`` with the BN eval affines;
    ``spade_bundle`` from ``SPADE.__call__(None, None)``.
    """
    k1, (s1, t1), k2, (s2, t2), ks = block_bundle
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = spade_bundle
    dtype = parts[0].dtype
    c = k2.shape[-1]
    lab = k1s.shape[-1]
    nh = k2s.shape[-1]
    assert ks is not None, "fused stage expects a shortcut conv (in!=out)"

    # fold the BN eval affines into the conv weights / a bias column
    k1f = k1 * s1  # HWIO · (C,) broadcasts over the out axis
    k2f = k2 * s2

    # per-part W-minor packing; bias column appended (rides the first tap)
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    K1 = []
    Ks = []
    for pi in range(len(parts)):
        cp = parts[pi].shape[-1]
        k1_p = k1f[:, :, offs[pi] : offs[pi + 1], :].reshape(9 * cp, c).T
        if pi == 0:
            k1_p = jnp.concatenate([k1_p, t1.reshape(c, 1)], axis=1)
        K1.append(k1_p.astype(dtype))
        Ks.append(ks[0, 0, offs[pi] : offs[pi + 1], :].T.astype(dtype))
    K2 = jnp.concatenate(
        [k2f.reshape(9 * c, c).T, t2.reshape(c, 1)], axis=1
    ).astype(dtype)

    # SPADE packing (same conventions as spade_kernel._stage_fwd_impl)
    K1s = k1s.reshape(9 * c, lab).T.astype(dtype)
    B1s = b1s.reshape(lab, 1).astype(dtype)
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

    parts_v = [jnp.swapaxes(p, 2, 3) for p in parts]  # (N, H, Cp, W)
    h = parts_v[0].shape[1]
    th = 8 if h % 8 == 0 else max(g for g in (4, 2, 1) if h % g == 0)
    outv = _stage_call(parts_v, K1, Ks, K2, K1s, B1s, K2s, K3s, th)
    return jnp.swapaxes(outv, 2, 3)