"""Fused backward (v3) for the training-mode stage — in-kernel chains.

The v2 backward (ops/stage_kernel_train.py:_train_bwd_rule) runs every heavy
contraction through rolling-halo Pallas kernels but reconstructs the
pointwise/BN chains BETWEEN them as XLA loop fusions over full-width f32
tensors — 47.5 ms/step of the r3 device profile, the largest non-kernel
slab. v3 moves each chain INTO the neighbouring conv kernel:

  κ1  γ(|β) recompute           conv(actv, kg[|kb])       [plain forward]
  κ3  g_pre2s = relu-mask ∘ convT(k_gb) ∘ [g·y ; g]
        prologue: build the SPADE-modulate cotangent [g_out0·y ; g_out0]
        epilogue: mask with actv>0; stats Σg_pre2s (→ mlp_shared bias grad)
  κ4  g_seg = convT(g_pre2s, k2s); stats Σg_seg (→ x2map bias grad)
  κ5  g_pre = where(y>0, g_out0·(1+γ) + convT(g_seg, k1s))
        epilogue over (g_out0, γ, y, f2) bands; stats Σg_pre, Σg_pre·x̂₂
        (→ bn2 grads) and Σg_out0·y, Σg_out0 (→ SPADE γ/β bias grads)
  κ6  g_n1 = bn1-relu-mask ∘ convT(k2) ∘ bn2-backward(g_pre, f2)
        prologue: the full BN2 gradient (batch-stat terms as (C, W) const
        tiles from κ5's sums); epilogue: mask with pre₁>0 (recomputed from
        f1); stats Σg_n1, Σg_n1·x̂₁ (→ bn1 grads)
  κ7  g_x = convT(k1) ∘ bn1-backward(g_n1, f1)  +  ksᵀ·g_pre
        prologue: the BN1 gradient; epilogue: the 1×1 shortcut
        backward-data dot folded per row
  wgrads: the same g-side prologues feed the weight-grad kernels, so no
        cotangent tensor is ever materialized for them either.

Everything stays W-minor; the only full-width XLA work left per stage is
the shortcut weight-grad einsum (one well-shaped matmul) and, on the head
stage only, the folded-head einsums. Gradient math is v2's exactly (same
rounding points; BN terms re-associated into affine const tiles — f32
parity ≤1e-5 vs the composition, tests/test_train_kernel.py).

References: /root/reference/scripts/train.py:79-120 (the loop this
accelerates), archs.py:205-241, normalization.py:94-120.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssunet_gan_tpu.ops.spade_kernel import (
    _conv3_rows,
    _interpret,
    _zero_outside_image,
)
from ssunet_gan_tpu.ops import collectives
from ssunet_gan_tpu.ops.stage_kernel import _VMEM_LIMIT, lookahead_enabled


# ---------------------------------------------------------------------------
# Generalized rolling-halo conv3 with prologue/epilogue callbacks.
# ---------------------------------------------------------------------------


def _make_fused_kernel(n_pro: int, n_epi: int, n_const: int, th: int,
                       h_img: int, pro_fn, epi_fn, n_stats: int, dtype,
                       out_chs=None, look: bool = False):
    """Kernel: out = epi(conv3(zero_pad(pro(halo_slabs)), K), epi_bands).

    Operand order: [pro ×n_pro], [pro_look ×n_pro if look], [epi ×n_epi],
    K, [const ×n_const], [out ×n_out], [stats], [scratch ×n_pro], [acc].
    ``out_chs`` (len > 1) splits the epilogue band channel-wise over
    several outputs (e.g. the input gradient of a split-concat conv
    emitted per part — no XLA slices, and each part grad keeps its
    consumer's natural operand). ``look`` = the prologue-free lookahead
    grid (ops/stage_kernel.set_lookahead): 1-row scratch + an 8-row
    lookahead view of the next band, grid (n, nh).
    """
    n_out = 1 if out_chs is None else len(out_chs)

    def kernel(*refs):
        nl = n_pro * (1 + int(look))
        pro = refs[:n_pro]
        pro_look = refs[n_pro:nl]
        epi = refs[nl : nl + n_epi]
        k_ref = refs[nl + n_epi]
        consts = refs[nl + n_epi + 1 : nl + n_epi + 1 + n_const]
        base = nl + n_epi + 1 + n_const
        o_refs = refs[base : base + n_out]
        if n_stats:
            s_ref = refs[base + n_out]
            scratch = refs[base + n_out + 1 : -1]
            acc_ref = refs[-1]
        else:
            scratch = refs[base + n_out :]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [pro[p][:] for p in range(n_pro)]

        if n_stats:

            @pl.when(jnp.logical_and(i == 0, ni == 0))
            def _zero_acc():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        def _compute():
            g0 = (i if look else i - 1) * th - 1  # global row of slab row 0
            if look:
                slabs = [
                    jnp.concatenate(
                        [scratch[p][:], cur[p], pro_look[p][0:1]], axis=0
                    )
                    for p in range(n_pro)
                ]
            else:
                slabs = [
                    jnp.concatenate([scratch[p][:], cur[p][0:1]], axis=0)
                    for p in range(n_pro)
                ]
            cvals = [c[:] for c in consts]
            xin = slabs[0] if pro_fn is None else pro_fn(slabs, cvals)
            xin = _zero_outside_image(xin, g0, h_img)
            out = _conv3_rows([xin], k_ref[:], th, dtype)  # (th, Cout, W) f32
            if epi_fn is None:
                stats = ()
                out = out.astype(dtype)
            else:
                out, stats = epi_fn(out, [e[:] for e in epi], cvals)
            if n_out == 1:
                o_refs[0][:] = out.astype(o_refs[0].dtype)
            else:
                off = 0
                for k, ch in enumerate(out_chs):
                    o_refs[k][:] = out[:, off : off + ch].astype(
                        o_refs[k].dtype
                    )
                    off += ch
            if n_stats:
                for j, sv in enumerate(stats):
                    acc_ref[j] = acc_ref[j] + sv

        if look:
            _compute()
            for p in range(n_pro):
                scratch[p][:] = cur[p][th - 1 :]
            if n_stats:
                s_ref[:] = acc_ref[:]
            return

        pl.when(i > 0)(_compute)

        if n_stats:
            s_ref[:] = acc_ref[:]

        for p in range(n_pro):
            tail = scratch[p][th:]  # last row (read before overwrite)

            @pl.when(i == 0)
            def _init(p=p):
                scratch[p][0:1] = jnp.zeros_like(scratch[p][0:1])
                scratch[p][1:] = cur[p]

            @pl.when(i > 0)
            def _roll(p=p, tail=tail):
                scratch[p][0:1] = tail
                scratch[p][1:] = cur[p]

    return kernel


def fused_conv3_call(
    pro_bands: Sequence[jax.Array],
    Kp: jax.Array,
    *,
    pro_fn: Optional[Callable] = None,
    epi_bands: Sequence[jax.Array] = (),
    epi_fn: Optional[Callable] = None,
    consts: Sequence[jax.Array] = (),
    out_ch: int,
    th: int,
    n_stats: int = 0,
    c_stat: int = 0,
):
    """Run ``epi(conv3(pro(pro_bands)), epi_bands)`` as one rolling-halo
    Pallas program over (N, H, C, W) W-minor views.

    ``pro_bands`` get a 1-row rolling halo (they feed the conv input via
    ``pro_fn(slabs, consts) -> (th+2, Cin, W)`` in the kernel dtype); the
    prologue output is zeroed outside the image (conv zero-padding applies
    AFTER the chain, exactly like the XLA composition). ``epi_bands`` are
    output-aligned (no halo). ``epi_fn(out_f32, epi_slabs, consts) ->
    (band, stat_vecs)`` with stats as (c_stat,) f32 vectors summed across
    the grid. ``out_ch`` may be a tuple: the band splits channel-wise over
    several outputs (returned as a tuple). Returns (out, stats|None).
    """
    n, h, _, w = pro_bands[0].shape
    dtype = Kp.dtype
    nh = h // th
    look = lookahead_enabled() and th % 8 == 0 and h % 8 == 0
    grid = (n, nh) if look else (n, nh + 1)
    pro_ch = tuple(p.shape[2] for p in pro_bands)
    epi_ch = tuple(e.shape[2] for e in epi_bands)
    out_chs = (out_ch,) if isinstance(out_ch, int) else tuple(out_ch)
    split_out = not isinstance(out_ch, int)

    def pro_spec(ch):
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

    def out_aligned_spec(ch):
        if look:
            return pl.BlockSpec(
                (None, th, ch, w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )

    out_specs: tuple = tuple(out_aligned_spec(ch) for ch in out_chs)
    out_shape: tuple = tuple(
        jax.ShapeDtypeStruct((n, h, ch, w), dtype) for ch in out_chs
    )
    if n_stats:
        out_specs += (
            pl.BlockSpec((n_stats, c_stat), lambda ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape += (jax.ShapeDtypeStruct((n_stats, c_stat), jnp.float32),)

    scratch = [pltpu.VMEM((1 if look else th + 1, ch, w), pro_bands[i].dtype)
               for i, ch in enumerate(pro_ch)]
    if n_stats:
        scratch += [pltpu.VMEM((n_stats, c_stat), jnp.float32)]

    single = len(out_specs) == 1
    pro_ops = list(pro_bands) + (list(pro_bands) if look else [])
    res = pl.pallas_call(
        _make_fused_kernel(len(pro_bands), len(epi_bands), len(consts), th,
                           h, pro_fn, epi_fn, n_stats, dtype,
                           out_chs if split_out else None, look=look),
        grid=grid,
        in_specs=(
            [pro_spec(ch) for ch in pro_ch]
            + ([look_spec(ch) for ch in pro_ch] if look else [])
            + [out_aligned_spec(ch) for ch in epi_ch]
            + [const_spec(Kp.shape)]
            + [const_spec(c.shape) for c in consts]
        ),
        out_specs=out_specs[0] if single else out_specs,
        out_shape=out_shape[0] if single else out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*pro_ops, *epi_bands, Kp, *consts)
    if single:
        return ((res,) if split_out else res), None
    outs = res[: len(out_chs)]
    stats = res[len(out_chs)] if n_stats else None
    return (tuple(outs) if split_out else outs[0]), stats

# ---------------------------------------------------------------------------
# Generalized weight-grad: dW[c, 9·ΣCp] accumulated across the grid, with an
# optional x-side prologue (recompute the conv's input from raw bands, e.g.
# conv2's relu(f1·a+b)) and an optional g-side prologue (build the cotangent
# band from flat residual bands — the BN-backward chains).
# ---------------------------------------------------------------------------


def _make_wgrad_fused_kernel(n_x: int, n_g: int, n_const: int, th: int,
                             h_img: int, x_pro_fn, g_pro_fn, dtype,
                             look: bool = False):
    from ssunet_gan_tpu.ops.spade_kernel import _shift_w

    def kernel(*refs):
        nl = n_x * (1 + int(look))
        x = refs[:n_x]
        xlook = refs[n_x:nl]
        g = refs[nl : nl + n_g]
        consts = refs[nl + n_g : nl + n_g + n_const]
        o_ref = refs[nl + n_g + n_const]
        scratch = refs[nl + n_g + n_const + 1 : -1]
        acc_ref = refs[-1]

        i = pl.program_id(1)
        ni = pl.program_id(0)
        cur = [x[p][:] for p in range(n_x)]

        @pl.when(jnp.logical_and(i == 0, ni == 0))
        def _zero_acc():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def _compute():
            g0 = (i if look else i - 1) * th - 1
            if look:
                slabs = [
                    jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:1]], axis=0
                    )
                    for p in range(n_x)
                ]
            else:
                slabs = [
                    jnp.concatenate([scratch[p][:], cur[p][0:1]], axis=0)
                    for p in range(n_x)
                ]
            cvals = [c[:] for c in consts]
            if x_pro_fn is not None:
                slabs = [x_pro_fn(slabs, cvals)]
            xh_parts = [_zero_outside_image(s, g0, h_img) for s in slabs]
            gvals = [e[:] for e in g]
            gband = gvals[0] if g_pro_fn is None else g_pro_fn(gvals, cvals)
            for t in range(th):
                taps = []
                for xp in xh_parts:
                    for dy in range(3):
                        r = xp[t + dy]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx))
                x9 = jnp.concatenate(taps, axis=0)  # (9·ΣCp, W)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    gband[t], x9, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if look:
            _compute()
            for p in range(n_x):
                scratch[p][:] = cur[p][th - 1 :]
            o_ref[:] = acc_ref[:]
            return

        pl.when(i > 0)(_compute)

        o_ref[:] = acc_ref[:]

        for p in range(n_x):
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


def fused_wgrad_call(
    x_bands: Sequence[jax.Array],
    g_bands: Sequence[jax.Array],
    *,
    c_out: int,
    c_in: int,
    th: int,
    x_pro_fn: Optional[Callable] = None,
    g_pro_fn: Optional[Callable] = None,
    consts: Sequence[jax.Array] = (),
    w_dtype=jnp.float32,
):
    """dW (HWIO (3, 3, c_in, c_out)) of ``g = conv3(x, W)`` over W-minor
    views. ``x_bands`` get the rolling halo (``x_pro_fn(slabs, consts)``
    may rebuild the conv's true input — e.g. an affine+relu recompute);
    ``g_bands`` are output-aligned and ``g_pro_fn(gvals, consts)`` builds
    the (th, c_out, W) cotangent band in the kernel dtype."""
    n, h, _, w = x_bands[0].shape
    dtype = x_bands[0].dtype
    nh = h // th
    look = lookahead_enabled() and th % 8 == 0 and h % 8 == 0
    x_ch = tuple(p.shape[2] for p in x_bands)
    g_ch = tuple(p.shape[2] for p in g_bands)

    def halo_spec(ch):
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

    def flat_spec(ch):
        if look:
            return pl.BlockSpec(
                (None, th, ch, w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, ch, w),
            lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )

    x_ops = list(x_bands) + (list(x_bands) if look else [])
    out = pl.pallas_call(
        _make_wgrad_fused_kernel(len(x_bands), len(g_bands), len(consts), th,
                                 h, x_pro_fn, g_pro_fn, dtype, look=look),
        grid=(n, nh) if look else (n, nh + 1),
        in_specs=(
            [halo_spec(ch) for ch in x_ch]
            + ([look_spec(ch) for ch in x_ch] if look else [])
            + [flat_spec(ch) for ch in g_ch]
            + [const_spec(c.shape) for c in consts]
        ),
        out_specs=pl.BlockSpec((c_out, 9 * c_in), lambda ni, hi: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_out, 9 * c_in), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((1 if look else th + 1, ch, w), x_bands[i].dtype)
             for i, ch in enumerate(x_ch)]
            + [pltpu.VMEM((c_out, 9 * c_in), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*x_ops, *g_bands, *consts)

    # unpack (c_out, parts-major tap-major) → HWIO (3, 3, c_in, c_out)
    x_ch_eff = (c_in,) if x_pro_fn is not None else x_ch
    blocks = []
    off = 0
    for cp in x_ch_eff:
        blk = out[:, off : off + 9 * cp]
        blocks.append(blk.T.reshape(3, 3, cp, c_out))
        off += 9 * cp
    return jnp.concatenate(blocks, axis=2).astype(w_dtype)

# ---------------------------------------------------------------------------
# The v3 backward rule (the body ops/stage_kernel_train.py dispatches to).
# ---------------------------------------------------------------------------


def bwd_v3_supported(aux, part_ch) -> bool:
    """Shape envelope for the fused backward programs; off it the v2 rule
    (which has its own per-kernel XLA fallbacks) runs instead."""
    f1_v = aux[0]
    h, w = f1_v.shape[1], f1_v.shape[3]
    c = f1_v.shape[2]
    min_w = 8 if _interpret() else 128
    return (h % 8 == 0 and h >= 8 and w >= min_w and c <= 256
            and sum(part_ch) <= 512)


def train_bwd_v3(res, cts):
    """Replay-free analytic backward with IN-KERNEL chains (see module doc).

    Math and rounding points are `_train_bwd_rule`'s (v2) exactly; the BN
    batch-stat terms enter the kernels as pre-broadcast (C, W) f32 const
    tiles (Mosaic rejects (C, 1) broadcasts), with
    x̂·Σgx̂/count re-associated to ``f·(r·Σgx̂/count) − μ·r·Σgx̂/count``.
    """
    from ssunet_gan_tpu.ops.acts import WTensor
    from ssunet_gan_tpu.ops.stage_kernel import _wminor_views
    from ssunet_gan_tpu.ops.stage_kernel_train import (
        BN_EPS,
        _pack_conv,
        _pick_train_th,
        _tile,
    )

    parts, bp, sp, head, aux = res
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
    lab = k1s.shape[-1]
    nhid = k2s.shape[-1]
    th = _pick_train_th(hh)

    def convT_pack(k):
        """HWIO kernel → packed 180°-rotated I/O-swapped convT weight."""
        kT = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
        return _pack_conv(kT, [kT.shape[2]], dtype=dtype)

    # --- κ1: γ (plus β only when the head needs out0) recompute ---
    if head is not None:
        k_gb_f = jnp.concatenate([kgs, kbs], axis=-1)
        b_gb_f = jnp.concatenate([bgs, bbs])
        gb_v, _ = fused_conv3_call(
            [actv_v], _pack_conv(k_gb_f, [nhid], bias=b_gb_f, dtype=dtype),
            out_ch=2 * c, th=th,
        )
        gamma_v, beta_v = gb_v[:, :, :c], gb_v[:, :, c:]
    else:
        gamma_v, _ = fused_conv3_call(
            [actv_v], _pack_conv(kgs, [nhid], bias=bgs, dtype=dtype),
            out_ch=c, th=th,
        )

    # --- folded head: out = kf·out0 + bf (XLA einsums, one stage only) ---
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
        g_out0_v = jnp.einsum(
            "cf,nhfw->nhcw", kf[0, 0].astype(dtype), g_out_v
        ).astype(dtype)
        g_head = (g_kf, g_bf)
    else:
        g_out0_v = g_out_v
        g_head = None

    # --- κ3: g_pre2s = actv-mask(convT([g·y ; g], k_gb)); Σ → mlp bias ---
    k_gb = jnp.concatenate([kgs, kbs], axis=-1)  # (3, 3, nh, 2C)

    def pro_modgrad(slabs, cv):
        g0s, ys = slabs
        gg = (g0s.astype(jnp.float32) * ys.astype(jnp.float32)).astype(dtype)
        return jnp.concatenate([gg, g0s], axis=1)

    def epi_mask_actv(out_f32, eb, cv):
        # compare in f32: Mosaic rejects bf16 comparisons on v5e
        m = jnp.where(eb[0].astype(jnp.float32) > 0,
                      out_f32.astype(dtype).astype(jnp.float32), 0.0)
        return m.astype(dtype), (jnp.sum(m, axis=(0, 2)),)

    g_pre2s_v, st3 = fused_conv3_call(
        [g_out0_v, y_v], convT_pack(k_gb), pro_fn=pro_modgrad,
        epi_bands=[actv_v], epi_fn=epi_mask_actv,
        out_ch=nhid, th=th, n_stats=1, c_stat=nhid,
    )
    g_b2s = st3[0].astype(b2s.dtype)

    def gpro_modgrad(gv, cv):
        g0b, yb = gv
        gg = (g0b.astype(jnp.float32) * yb.astype(jnp.float32)).astype(dtype)
        return jnp.concatenate([gg, g0b], axis=1)

    g_kgb = fused_wgrad_call(
        [actv_v], [g_out0_v, y_v], c_out=2 * c, c_in=nhid, th=th,
        g_pro_fn=gpro_modgrad, w_dtype=kgs.dtype,
    )
    g_kg, g_kb = g_kgb[..., :c], g_kgb[..., c:]

    # --- κ4: g_seg = convT(g_pre2s, k2s); Σ → x2map bias grad ---
    def epi_sum(out_f32, eb, cv):
        o = out_f32.astype(dtype)
        return o, (jnp.sum(o.astype(jnp.float32), axis=(0, 2)),)

    g_seg_v, st4 = fused_conv3_call(
        [g_pre2s_v], convT_pack(k2s), epi_fn=epi_sum,
        out_ch=lab, th=th, n_stats=1, c_stat=lab,
    )
    g_b1s = st4[0].astype(b1s.dtype)
    g_k2s = fused_wgrad_call(
        [seg_v], [g_pre2s_v], c_out=nhid, c_in=lab, th=th,
        w_dtype=k2s.dtype,
    )

    # --- κ5: g_pre = where(y>0, g·(1+γ) + convT(g_seg, k1s)); 4 stat rows ---
    r2 = jax.lax.rsqrt(var2 + BN_EPS)
    R2t = _tile(r2, w)
    M2R2t = _tile(mean2 * r2, w)

    def epi_pre(out_f32, eb, cv):
        g0b, gm, yb, f2b = eb
        r2t, m2r2t = cv[0], cv[1]
        gf = g0b.astype(jnp.float32)
        gy = gf * (1.0 + gm.astype(jnp.float32)) \
            + out_f32.astype(dtype).astype(jnp.float32)
        yf = yb.astype(jnp.float32)
        gp = jnp.where(yf > 0, gy, 0.0)
        xhat2 = f2b.astype(jnp.float32) * r2t - m2r2t
        return gp.astype(dtype), (
            jnp.sum(gp, axis=(0, 2)),
            jnp.sum(gp * xhat2, axis=(0, 2)),
            jnp.sum(gf * yf, axis=(0, 2)),
            jnp.sum(gf, axis=(0, 2)),
        )

    g_pre_v, st5 = fused_conv3_call(
        [g_seg_v], convT_pack(k1s),
        epi_bands=[g_out0_v, gamma_v, y_v, f2_v], epi_fn=epi_pre,
        consts=[R2t, M2R2t], out_ch=c, th=th, n_stats=4, c_stat=c,
    )
    s_g2, s_gx2 = st5[0], st5[1]
    g_bg = st5[2].astype(bgs.dtype)
    g_bb = st5[3].astype(bbs.dtype)
    g_g2 = s_gx2.astype(g2.dtype)       # param grads: LOCAL partial sums
    g_be2 = s_g2.astype(be2.dtype)      # (the DP wrapper pmeans the tree)
    # input-grad stat terms need the GLOBAL sums (SyncBN backward)
    s_g2, s_gx2 = collectives.psum_if(s_g2), collectives.psum_if(s_gx2)
    g_k1s = fused_wgrad_call(
        [y_v], [g_seg_v], c_out=lab, c_in=c, th=th, w_dtype=k1s.dtype,
    )

    # --- shortcut weight grad: per-part matmuls (concatenating the parts
    # would materialize the ΣCp-channel xcat just for this contraction —
    # XLA lowers that concat as pad+maximum fusions, 2.4 ms/step at L0) ---
    g_ks = (
        jnp.concatenate(
            [
                jnp.einsum(
                    "nhcw,nhiw->ic",
                    g_pre_v.astype(jnp.float32),
                    pv.astype(jnp.float32),
                )
                for pv in parts_v
            ],
            axis=0,
        )
        .reshape(1, 1, csum, c)
        .astype(ks.dtype)
    )

    # --- κ6: g_n1 = pre₁-mask(convT(bn2-backward(g_pre, f2), k2)) ---
    r1 = jax.lax.rsqrt(var1 + BN_EPS)
    a1 = g1 * r1
    P2t = _tile(g2 * r2, w)
    Q2t = _tile(s_g2 / count, w)
    R2pt = _tile(r2 * s_gx2 / count, w)
    M2R2pt = _tile(mean2 * r2 * s_gx2 / count, w)
    A1t = _tile(a1, w)
    B1t = _tile(be1 - mean1 * a1, w)
    R1t = _tile(r1, w)
    M1R1t = _tile(mean1 * r1, w)

    def pro_bn2(slabs, cv):
        gp, f2s = slabs
        p2, q2, r2p, m2r2p = cv[0], cv[1], cv[2], cv[3]
        gf = gp.astype(jnp.float32)
        f2f = f2s.astype(jnp.float32)
        return (p2 * (gf - q2 - (f2f * r2p - m2r2p))).astype(dtype)

    def epi_bn1mask(out_f32, eb, cv):
        f1f = eb[0].astype(jnp.float32)
        a1t, b1t, r1t, m1r1t = cv[4], cv[5], cv[6], cv[7]
        pre1 = f1f * a1t + b1t
        gn = jnp.where(pre1 > 0,
                       out_f32.astype(dtype).astype(jnp.float32), 0.0)
        xhat1 = f1f * r1t - m1r1t
        return gn.astype(dtype), (
            jnp.sum(gn, axis=(0, 2)),
            jnp.sum(gn * xhat1, axis=(0, 2)),
        )

    g_n1_v, st6 = fused_conv3_call(
        [g_pre_v, f2_v], convT_pack(k2), pro_fn=pro_bn2,
        epi_bands=[f1_v], epi_fn=epi_bn1mask,
        consts=[P2t, Q2t, R2pt, M2R2pt, A1t, B1t, R1t, M1R1t],
        out_ch=c, th=th, n_stats=2, c_stat=c,
    )
    s_g1, s_gx1 = st6[0], st6[1]
    g_g1 = s_gx1.astype(g1.dtype)
    g_be1 = s_g1.astype(be1.dtype)
    s_g1, s_gx1 = collectives.psum_if(s_g1), collectives.psum_if(s_gx1)

    def xpro_h1r(slabs, cv):
        xs = slabs[0].astype(jnp.float32)
        return jax.nn.relu(xs * cv[4] + cv[5]).astype(dtype)

    def gpro_bn2(gv, cv):
        gp, f2b = gv
        gf = gp.astype(jnp.float32)
        f2f = f2b.astype(jnp.float32)
        return (cv[0] * (gf - cv[1] - (f2f * cv[2] - cv[3]))).astype(dtype)

    g_k2 = fused_wgrad_call(
        [f1_v], [g_pre_v, f2_v], c_out=c, c_in=c, th=th,
        x_pro_fn=xpro_h1r, g_pro_fn=gpro_bn2,
        consts=[P2t, Q2t, R2pt, M2R2pt, A1t, B1t], w_dtype=k2.dtype,
    )

    # --- κ7: g_x = convT(bn1-backward(g_n1, f1), k1) + ksᵀ·g_pre ---
    P1t = _tile(a1, w)
    Q1t = _tile(s_g1 / count, w)
    R1pt = _tile(r1 * s_gx1 / count, w)
    M1R1pt = _tile(mean1 * r1 * s_gx1 / count, w)
    KS_c = ks[0, 0].astype(dtype)  # (ΣCp, C)

    def pro_bn1(slabs, cv):
        gn, f1s = slabs
        gf = gn.astype(jnp.float32)
        f1f = f1s.astype(jnp.float32)
        return (cv[0] * (gf - cv[1] - (f1f * cv[2] - cv[3]))).astype(dtype)

    def epi_shortcut(out_f32, eb, cv):
        gp = eb[0]
        rows = [
            jax.lax.dot_general(
                cv[4], gp[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for t in range(th)
        ]
        sc = jnp.stack(rows, axis=0)
        return (out_f32.astype(dtype).astype(jnp.float32) + sc).astype(dtype), ()

    g_xparts, _ = fused_conv3_call(
        [g_n1_v, f1_v], convT_pack(k1), pro_fn=pro_bn1,
        epi_bands=[g_pre_v], epi_fn=epi_shortcut,
        consts=[P1t, Q1t, R1pt, M1R1pt, KS_c], out_ch=tuple(part_ch), th=th,
    )

    def gpro_bn1(gv, cv):
        gn, f1b = gv
        gf = gn.astype(jnp.float32)
        f1f = f1b.astype(jnp.float32)
        return (cv[0] * (gf - cv[1] - (f1f * cv[2] - cv[3]))).astype(dtype)

    g_k1 = fused_wgrad_call(
        parts_v, [g_n1_v, f1_v], c_out=c, c_in=csum, th=th,
        g_pro_fn=gpro_bn1, consts=[P1t, Q1t, R1pt, M1R1pt],
        w_dtype=k1.dtype,
    )

    # --- restore each part's activation form (the kernel already split) ---
    g_parts = []
    for p, gv in zip(parts, g_xparts):
        gv = gv.astype(p.dtype)
        g_parts.append(
            WTensor(gv) if isinstance(p, WTensor) else jnp.swapaxes(gv, 2, 3)
        )
    g_bp = (g_k1, (g_g1, g_be1), g_k2, (g_g2, g_be2), g_ks)
    g_sp = (g_k1s, g_b1s, g_k2s, g_b2s, g_kg, g_bg, g_kb, g_bb)
    return tuple(g_parts), g_bp, g_sp, g_head
