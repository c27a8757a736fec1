"""Pallas block-fused SPADE apply (TPU kernel for the profiled #1 hot spot).

SPADE's semantics (reference: /root/reference/scripts/normalization.py:110-120)
are ``out = x * (1 + gamma) + beta`` with ``gamma = conv3(actv)`` and
``beta = conv3(actv)``.  The naive XLA lowering materializes gamma and beta at
full channel width in HBM (write + read each) and re-reads ``x`` for the
elementwise pass — measured at ~40% of flagship runtime, HBM-bound
(BASELINE.md).  ``actv`` however is tiny (``nhidden = C/16`` channels), so the
TPU-first decomposition is:

1. im2col the 3×3 neighborhood of ``actv`` (9·nh channels — cheap, XLA),
2. ONE Pallas kernel per pixel tile: a single MXU matmul
   ``(tile, 9·nh) @ (9·nh, 2C)`` producing gamma|beta in VMEM, immediately
   consumed by the VPU elementwise ``x*(1+γ)+β`` — gamma/beta never touch HBM.

HBM traffic per stage drops from ~7 full-width arrays to ~2 (x in, out out)
plus the 9·nh/16·nh-width im2col. The backward is one fused kernel too:
``dx = g·(1+γ)`` (γ recomputed on-chip), ``dA9 = [g·x, g] @ Wᵀ``,
``dW += A9ᵀ @ [g·x, g]``, ``db += Σ [g·x, g]`` — again without materializing
gamma, beta, or g·x in HBM.

Used by :class:`ssunet_gan_tpu.ops.spade.SPADE` when fused mode is on (auto
on TPU). Runs in Pallas interpret mode on CPU so the parity suite exercises
the exact kernel code path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Mode toggle: None = auto (fused on TPU, reference XLA path elsewhere).
# ---------------------------------------------------------------------------

_FUSED: Optional[bool] = None


def set_fused_spade(enabled: Optional[bool]) -> None:
    """Force the fused SPADE kernel on/off; ``None`` restores auto (TPU-only)."""
    global _FUSED
    _FUSED = enabled


def fused_spade_enabled() -> bool:
    if _FUSED is not None:
        return _FUSED
    # Auto currently OFF: the first-cut kernel (im2col materialized in HBM)
    # measured 101 vs 143 tiles/s on the flagship — narrow-minor-dim arrays
    # pay heavy lane padding in HBM. Opt in via set_fused_spade(True) or the
    # 'fused_spade' config key while the v2 kernel (VMEM-resident actv, no
    # HBM im2col) is developed.
    return False


def _interpret() -> bool:
    # Pallas TPU kernels run via the interpreter on non-TPU backends so the
    # CPU test suite covers the exact kernel bodies.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Host-side (XLA) helpers around the kernel.
# ---------------------------------------------------------------------------


def im2col_3x3(a: jax.Array) -> jax.Array:
    """(N,H,W,nh) → (N,H,W,9·nh): 3×3 neighborhoods, zero-padded border.

    Tap order is (dy, dx) row-major to match an HWIO kernel reshaped to
    (9·nh, C) — column ``t·nh + i`` holds tap ``t = dy*3+dx`` of channel i.
    """
    n, h, w, _ = a.shape
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [ap[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def pack_gamma_beta(
    kg: jax.Array, bg: jax.Array, kb: jax.Array, bb: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Two HWIO (3,3,nh,C) kernels (+biases) → one (9·nh, 2C) matmul weight."""
    nh, c = kg.shape[2], kg.shape[3]
    w = jnp.concatenate([kg.reshape(9 * nh, c), kb.reshape(9 * nh, c)], axis=1)
    b = jnp.concatenate([bg, bb], axis=0)
    return w, b


def _pick_tile(p: int, c: int, k: int) -> int:
    """Pixel-tile size: VMEM-bounded (x, a9, out, gamma|beta live per tile)."""
    # ~4 bytes/pixel/channel of live f32 intermediates across ~5 buffers.
    budget = 6 * 1024 * 1024
    per_pixel = 4 * (3 * c + 2 * k) + 2 * (2 * c + k)
    pt = budget // max(per_pixel, 1)
    pt = max(128, min(2048, (pt // 128) * 128))
    return min(pt, _round_up(p, 128))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(arr: jax.Array, rows: int) -> jax.Array:
    if arr.shape[0] == rows:
        return arr
    return jnp.pad(arr, ((0, rows - arr.shape[0]),) + ((0, 0),) * (arr.ndim - 1))


# ---------------------------------------------------------------------------
# Kernels.
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, a9_ref, w_ref, b_ref, o_ref):
    c = x_ref.shape[-1]
    gb = jnp.dot(a9_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    gb = gb + b_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    out = x * (1.0 + gb[:, :c]) + gb[:, c:]
    o_ref[:] = out.astype(o_ref.dtype)


def _bwd_kernel(g_ref, x_ref, a9_ref, w_ref, b_ref, dx_ref, da9_ref, dw_ref, db_ref):
    i = pl.program_id(0)
    c = x_ref.shape[-1]
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    a9 = a9_ref[:]
    w = w_ref[:]

    gamma = (
        jnp.dot(a9, w[:, :c], preferred_element_type=jnp.float32)
        + b_ref[:, :c].astype(jnp.float32)
    )
    dx_ref[:] = (g * (1.0 + gamma)).astype(dx_ref.dtype)

    u = jnp.concatenate([g * x, g], axis=1)  # (pt, 2C), f32
    u_lo = u.astype(w.dtype)
    # dA9 = u @ Wᵀ — contract the 2C axis of both operands.
    da9 = jax.lax.dot_general(
        u_lo, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    da9_ref[:] = da9.astype(da9_ref.dtype)

    # dW = A9ᵀ @ u, db = Σ_pixels u — accumulated across the pixel grid
    # (sequential on TPU; @pl.when zero-init on the first step).
    dw_t = jax.lax.dot_general(
        a9, u_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_t = jnp.sum(u, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += dw_t
    db_ref[:] += db_t


# ---------------------------------------------------------------------------
# custom_vjp core on flattened (pixels, channels) arrays.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _spade_apply_2d(x2, a92, w, b2):
    return _fwd_call(x2, a92, w, b2)


def _fwd_call(x2, a92, w, b2):
    p, c = x2.shape
    k = a92.shape[1]
    pt = _pick_tile(p, c, k)
    pp = _round_up(p, pt)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(pp // pt,),
        in_specs=[
            pl.BlockSpec((pt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp, c), x2.dtype),
        interpret=_interpret(),
    )(_pad_rows(x2, pp), _pad_rows(a92, pp), w, b2)
    return out[:p] if pp != p else out


def _fwd_rule(x2, a92, w, b2):
    return _fwd_call(x2, a92, w, b2), (x2, a92, w, b2)


def _bwd_rule(res, g):
    x2, a92, w, b2 = res
    p, c = x2.shape
    k = a92.shape[1]
    pt = _pick_tile(p, c, k)
    pp = _round_up(p, pt)
    dx, da9, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(pp // pt,),
        in_specs=[
            pl.BlockSpec((pt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((pt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pp, c), x2.dtype),
            jax.ShapeDtypeStruct((pp, k), a92.dtype),
            jax.ShapeDtypeStruct((k, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
        ),
        interpret=_interpret(),
    )(_pad_rows(g, pp), _pad_rows(x2, pp), _pad_rows(a92, pp), w, b2)
    if pp != p:
        dx, da9 = dx[:p], da9[:p]
    return dx, da9, dw.astype(w.dtype), db.astype(b2.dtype)


_spade_apply_2d.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Public entry: NHWC tensors + the two HWIO conv params.
# ---------------------------------------------------------------------------


def fused_spade_apply(
    x: jax.Array,
    actv: jax.Array,
    kg: jax.Array,
    bg: jax.Array,
    kb: jax.Array,
    bb: jax.Array,
) -> jax.Array:
    """``x*(1 + conv3(actv; kg,bg)) + conv3(actv; kb,bb)`` as one fused kernel.

    Exact math of the reference's mlp_gamma/mlp_beta convs + modulation
    (normalization.py:114-120) with gamma/beta kept VMEM-resident. Matmul
    accumulation is f32 regardless of activation dtype (matches Conv2d's
    ``preferred_element_type`` in f32; slightly more accurate than the XLA
    path under bf16, where the reference rounds gamma/beta to bf16 first).
    """
    n, h, wd, c = x.shape
    nh = actv.shape[-1]
    a9 = im2col_3x3(actv).reshape(n * h * wd, 9 * nh)
    w2, b2 = pack_gamma_beta(kg, bg, kb, bb)
    w2 = w2.astype(x.dtype)
    out2 = _spade_apply_2d(x.reshape(n * h * wd, c), a9, w2, b2.reshape(1, 2 * c))
    return out2.reshape(n, h, wd, c)
