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

from ssunet_gan_tpu.ops.acts import (
    DownQTensor,
    DownTensor,
    UpTensor,
    WTensor,
    materialize_down,
    materialize_up,
)
from ssunet_gan_tpu.ops.spade_kernel import (
    _carried_rows,
    _conv3_row_fn,
    _conv3_rows,
    _interpret,
    _shift_w,
    _spade_tail,
    _zero_outside_image,
    pack_seg_stacked,
    pick_seg_r,
)


def _wminor_views(parts):
    """(N, H, C, W) views of a part list (WTensor parts are already there;
    an UpTensor yields its HALF-H payload, a DownTensor its FULL-res
    payload — the caller must carry the up/down flags; plain NHWC arrays
    get the boundary swap)."""
    return [
        p.v if isinstance(p, (WTensor, UpTensor, DownTensor))
        else p.q if isinstance(p, DownQTensor)
        else jnp.swapaxes(p, 2, 3)
        for p in parts
    ]

# ---------------------------------------------------------------------------
# Mode toggle: None = auto (ON for TPU backends — measured 169.6 vs 142.6
# tiles/s on the flagship b=32 @512² bf16, and f32-parity-tested against the
# module composition; interpret mode is too slow to default on for CPU).
# ---------------------------------------------------------------------------

_FUSED_STAGE: Optional[bool] = None


def set_fused_stage(enabled: Optional[bool]) -> None:
    global _FUSED_STAGE
    _FUSED_STAGE = enabled


def fused_stage_enabled() -> bool:
    if _FUSED_STAGE is None:
        return jax.default_backend() == "tpu"
    return bool(_FUSED_STAGE)


import os as _os

_VMEM_LIMIT = int(
    _os.environ.get("SSUNET_GAN_TPU_VMEM_LIMIT", str(96 * 1024 * 1024))
)  # scoped-VMEM cap for the fat stages (v5e has 128 MB VMEM). 96 MB
# admits th=64 for the two decoder signatures that stack-OOM at the old
# 64 MB cap: measured 242.5 → 248.3 bf16 tiles/s (+2.4%), int8 neutral
# (r4 A/B, reproduced twice); the remaining 32 MB is XLA's room for the
# op's I/O double-buffering, which the same A/B shows is still enough.
# Env knob for sweeps. The packed deep levels need ~29-45 MB of stack.
_PROBE_MARGIN = 6 * 1024 * 1024  # probes compile against a TIGHTER cap: the
# r3 OOM showed the in-model schedule can need ~1 MB more stack than the
# isolated probe program, so probe-pass must imply model-pass with headroom.

# ---------------------------------------------------------------------------
# Deep-level lane packing. The W ≤ 64 levels starve the 128-lane vector unit
# (r2 measured fusing L3 unpacked at 143 vs 169 tiles/s end-to-end), so the
# eval path packs f = 128/W batch images side by side on the lane axis and
# runs ONE kernel at full lane occupancy; `_shift_w`'s seam masking keeps the
# conv halos of neighbouring images independent. Packing is eval-only
# (pack=True call sites) — the train kernels don't thread sub_w yet.
# ---------------------------------------------------------------------------

_PACK_W = 128

# Widest stage admitted via lane packing. MEASURED NEGATIVE at every depth
# (r3 sweep, flagship 512² b=32 on v5e): adding packed deep levels is
# monotonically slower in both modes — bf16 170.3 → 159.1 → 154.2 → 153.7
# tiles/s and int8-cal 224.2 → 215.4 → 212.5 → 210.1 for pmax 256/384/512/
# 768 — XLA's deep convs beat the packed rolling-halo kernels at W ≤ 64
# (the pack/unpack relayouts around each kernel eat the lane-occupancy win).
# Default therefore stays at the shallow-only gate; deeper packing remains a
# working opt-in (set_pack_max_planes) with the kernels parity-tested.
_PACK_MAX_PLANES = 256


# Stacked seg-conv dots (see spade_kernel.pack_seg_stacked): the x2map
# conv's M=num_classes per-row dots pay conv2-grade tile passes for ~3% of
# the FLOPs; stacking r rows per dot cuts them ~3×. Measured (flagship
# b=32 @512², BASELINE.md): SLOWER in bf16 (163.5 vs 201.5 tiles/s — the
# wider rhs assembly loses to the bf16 kernels' VMEM economics) but a WIN
# in int8 (295.3 → 300.6) — so auto (None) resolves to "int8 mode only";
# set_seg_stack forces either way (sweeps / the "seg_stack" card key).
_SEG_STACK: Optional[bool] = None


def set_seg_stack(enabled: Optional[bool]) -> None:
    global _SEG_STACK
    _SEG_STACK = enabled


def seg_stack_enabled(int8: bool = False) -> bool:
    if _SEG_STACK is None:
        return int8
    return bool(_SEG_STACK)


def set_pack_max_planes(planes: int) -> None:
    global _PACK_MAX_PLANES
    _PACK_MAX_PLANES = int(planes)


# Pair dots (r5): the C ≤ 64 stages' per-row conv1/conv2 dots occupy only
# C of the MXU's 128 M-rows — the level-0 stages (the model's largest
# FLOP slab) run at ≤50% M-occupancy. Stacking TWO adjacent output rows
# per dot with a 2-row-block lhs (row block j contracts window rows
# j..j+2 — the taps of adjacent rows overlap, so the rhs is 12 taps per
# pair instead of 2×9) fills M = 2C = 128. The bias leaves the
# contraction (its +1 column pushed K=9·ΣCp over a 128 multiple at the
# busiest signatures) and rides as a pre-broadcast (2C, W) tile added to
# the f32 accumulator — Mosaic rejects (f,1) broadcasts, full-width
# operand tiles are the sanctioned form (CLAUDE.md r2 finding).
# MXU tile passes per output row at the level-0 decoder signature
# (C=64, ΣCp=128, W=512): conv1 40 → 12, conv2 24 → 8.
_PAIR_DOTS: Optional[bool] = None


def set_pair_dots(enabled: Optional[bool]) -> None:
    global _PAIR_DOTS
    _PAIR_DOTS = enabled


def pair_dots_enabled(c: int) -> bool:
    """Pair-stacked conv1/conv2 dots for this stage width? Requires
    2C ≤ 128 (the pair fills the MXU's M rows) and excludes halo-carry
    (per-row by construction). Auto (None) = OFF: MEASURED NEGATIVE on the
    flagship (bf16-fused 245.8 → 235.4 tiles/s, r5 A/B) — the M axis
    STREAMS through the systolic array, so the per-row C-high dots waste
    no M, and the pair's 4-row tap window costs +33% real K work. Ships
    as a tested opt-in (set_pair_dots(True))."""
    if _PAIR_DOTS is None or _PAIR_DOTS is False:
        return False
    return 2 * c <= 128 and not halo_carry_enabled()


# Bias-tile mode: drop the +1 bias ones-column from the conv1/conv2
# contractions and add the bias as a pre-broadcast (C, W) tile on the f32
# accumulator instead. At the flagship's decoder signatures 9·ΣCp is an
# EXACT multiple of 128 (1152/2304/4608), so the ones-column costs a whole
# extra K-tile MXU pass per row — 10/9 on conv0_1's conv1, 19/18 on
# conv1_1's, 12/11 and 23/22 on their conv2 dots. (The int8 kernel never
# had the column — its biases ride the dequant vectors — which is part of
# its efficiency edge.) Default ON.
_BIAS_TILE: Optional[bool] = None


def set_bias_tile(enabled: Optional[bool]) -> None:
    global _BIAS_TILE
    _BIAS_TILE = enabled


def bias_tile_enabled() -> bool:
    return True if _BIAS_TILE is None else bool(_BIAS_TILE)


def _pair_lhs_conv3(kp: jax.Array, cp9: Sequence[int]) -> jax.Array:
    """Per-row packed 3×3 lhs → 2-row-block pair lhs.

    ``kp``: (C, Σ9·Cp) parts-major (dy, dx, ci)-column packing (NO bias
    column). Returns (2C, Σ12·Cp): per part, row block j's (dy, dx, ci)
    weight lands at window-row m = j + dy — the rhs is the part's 4-row
    window, m-major (dx, ci)-minor."""
    c = kp.shape[0]
    blocks = []
    off = 0
    for n9 in cp9:
        k = kp[:, off : off + n9].reshape(c, 3, n9 // 3)
        z = jnp.zeros((c, 1, n9 // 3), kp.dtype)
        top = jnp.concatenate([k, z], axis=1).reshape(c, n9 // 3 * 4)
        bot = jnp.concatenate([z, k], axis=1).reshape(c, n9 // 3 * 4)
        blocks.append(jnp.concatenate([top, bot], axis=0))
        off += n9
    return jnp.concatenate(blocks, axis=1)


def _pair_lhs_rows(ks_parts: Sequence[jax.Array]) -> jax.Array:
    """Shortcut (1×1) columns of the pair lhs: row block j contracts the
    j-th of the 2 stacked x rows. (C, Cp) per part → (2C, 2·Cp)."""
    blocks = []
    for ksp in ks_parts:
        c, cp = ksp.shape
        z = jnp.zeros((c, cp), ksp.dtype)
        blocks.append(
            jnp.concatenate(
                [
                    jnp.concatenate([ksp, z], axis=1),
                    jnp.concatenate([z, ksp], axis=1),
                ],
                axis=0,
            )
        )
    return jnp.concatenate(blocks, axis=1)


def _pair_bias_tile(b: jax.Array, w: int, dtype) -> jax.Array:
    """(C,) bias → (2C, W) pre-broadcast tile in the activation dtype (the
    ones-column path's numerics: bias quantized to dtype, added in f32)."""
    b2 = jnp.concatenate([b, b]).astype(dtype)
    return jnp.broadcast_to(b2[:, None], (b2.shape[0], w))


# Halo carry (see spade_kernel._carried_rows): the eval kernels' per-band
# intermediates overlap the next band's by a fixed row count (h1 by 8, y by
# 6, seg by 4, actv by 2); carrying those rows in scratch instead of
# recomputing removes the rolling-halo's redundant MXU work (1.25×/1.19×/
# 1.13×/1.06× per intermediate at th=32) — bit-exact, each row is a pure
# function of the same image rows. MEASURED NEGATIVE on the bench scene
# (same-session A/B, 512² tiles): bf16-fused 213.2 → 205.7 tiles/s with the
# carry ON; int8 ≈ neutral (302.1 vs 301.4). The per-row serialization
# around the scratch read/modify/write costs more than the ~12% saved MXU
# work at th=32. Ships default OFF as an A/B lever (set_halo_carry(True)),
# parity-pinned by tests/test_stage_kernel.py::test_halo_carry_matches_recompute.
_HALO_CARRY: Optional[bool] = None


def set_halo_carry(enabled: Optional[bool]) -> None:
    global _HALO_CARRY
    _HALO_CARRY = enabled


def halo_carry_enabled() -> bool:
    return False if _HALO_CARRY is None else bool(_HALO_CARRY)


# Lookahead grid: the historical grid ran nh+1 steps per image with step 0
# a compute-free prologue that seeds the rolling scratch. With an extra
# 8-row lookahead BlockSpec on the NEXT band's first rows, band i computes
# from (prev-block scratch | block i | lookahead) directly — grid (n, nh),
# no prologue steps, and the rolling scratch shrinks th+5 → 5 rows, at
# +8/th of input DMA (the lookahead re-fetch). Bit-exact (parity pinned in
# tests/test_stage_kernel.py); MEASURED on the flagship b=32 @512² bench:
# bf16-fused 213.0 → 220.5 tiles/s, int8-calibrated 303.8 → 330.5.
# Default ON (set_lookahead(False) restores the prologue grid for A/B).
_LOOKAHEAD: Optional[bool] = None


def set_lookahead(enabled: Optional[bool]) -> None:
    global _LOOKAHEAD
    _LOOKAHEAD = enabled


def lookahead_enabled() -> bool:
    return True if _LOOKAHEAD is None else bool(_LOOKAHEAD)


def _pack_factor(n: int, w: int) -> int:
    """Images packed per lane vector (1 = no packing)."""
    if w >= _PACK_W or _PACK_W % w or n % (_PACK_W // w):
        return 1
    return _PACK_W // w


def _pack_lanes(pv: jax.Array, f: int) -> jax.Array:
    """(N, H, Cp, W) W-minor view → (N/f, H, Cp, f·W), image-major lanes."""
    n, h, cp, w = pv.shape
    return (
        pv.reshape(n // f, f, h, cp, w)
        .transpose(0, 2, 3, 1, 4)
        .reshape(n // f, h, cp, f * w)
    )


def _unpack_lanes(ov: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`_pack_lanes`."""
    n, h, c, wf = ov.shape
    w = wf // f
    return (
        ov.reshape(n, h, c, f, w)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n * f, h, c, w)
    )

# VMEM gate tiers. The byte-sum heuristic over-counts ~2× vs the compiler's
# scheduled liveness, so three tiers replace a single folklore bound:
#   est < _TRUST_BYTES   — the measured region (every flagship stage incl.
#                          f32 sums to ≤ 23.2 MB at th=8 and compiles + runs;
#                          the th=16/32 bands below re-measured it): accept.
#   est < _REJECT_BYTES  — uncertain: PROBE-compile the kernel once for this
#                          shape signature (cached); a Mosaic failure means a
#                          clean fallback to the XLA composition, not a crash.
#   otherwise            — reject without probing (a doomed Mosaic compile is
#                          itself a remote-compiler crash risk).
#
# Threshold calibration (r3, measured): every flagship stage at th=32 sums
# to ≤ 42.4 MB and compiles + runs in both bf16 and int8; at th=64 the
# estimate (80 MB) matched Mosaic's actual stack OOM report (78.1 MB), i.e.
# the ~2× overcount of the th=8 era shrinks toward 1× at tall bands — so
# est < 44 MB ⇒ real ≲ 45 MB, comfortably under the 64 MB scoped cap.
_TRUST_BYTES = 44 * 1024 * 1024
_REJECT_BYTES = int(2.5 * _VMEM_LIMIT)

# Band heights tried largest-first: taller bands amortize the rolling-halo
# redundancy (at th the kernel computes th+8 conv1 rows per th output rows —
# 2.0× excess MXU work at th=8, 1.25× at th=32) against a linearly larger
# VMEM working set. Measured on the flagship b=32 @512² (r3 sweep):
# bf16-fused 170.3 / 195.2 / 207.7 tiles/s and int8-calibrated 250.3 /
# 285.7 / 295.6 at th = 8 / 16 / 32; th=64 exceeds the 64 MB scoped-VMEM
# cap in bf16 (Mosaic stack OOM at 78 MB; re-confirmed post-downcast-
# epilogues via the probe tier — clean XLA fallback, no crash). The int8
# kernel's slabs are 1-2 bytes/elem, so ``int8=True`` additionally tries
# th=64 through the NEVER-TRUSTED probe tier (the s8 probe program below).
# ``set_band_rows`` forces one height (perf sweeps).
# th=64 is probe-gated (never trusted). Under the prologue grid it
# stack-OOM'd the bf16 programs (BASELINE.md r3 tall-band study); the
# lookahead grid's 5-row scratch brings it back under the cap — probes
# pass for every flagship stage in both dtypes.
_TH_CANDIDATES = (64, 32, 16, 8)
_TH_CANDIDATES_INT8 = (64, 32, 16, 8)
_BAND_ROWS: Optional[int] = None


def set_band_rows(th: Optional[int]) -> None:
    global _BAND_ROWS
    _BAND_ROWS = th


def _vmem_estimate(h: int, w: int, c: int, part_ch, itemsize: int,
                   th: int = 8, int8: bool = False) -> int:
    # halo-carry scratch (h1c 8 + yc 6 rows of C, plus the small seg/actv
    # carries — folded into a 16-row bound; activation dtype in both modes)
    carry_b = 16 * c * w * itemsize if halo_carry_enabled() else 0
    if int8:
        # s8 x-slabs (1 B), bf16 h1 after the per-row downcast + its s8
        # requant copy, bf16 y / SPADE gb / out (×2 buf), f32 DQ vectors
        sc8 = (5 + 16) if lookahead_enabled() else (th + 5)
        parts_b = sum(
            (sc8 + 2 * th + (th + 10)) * cp * w * 1 for cp in part_ch
        )
        mid_b = (
            (th + 8) * c * w * (itemsize + 1)
            + (th + 6) * c * w * itemsize
            + th * 2 * c * w * itemsize
            + 2 * th * c * w * itemsize
            + 5 * c * w * 4
        )
        return parts_b + mid_b + carry_b
    # per part: rolling scratch + double-buffered cur block + xh slab
    # (lookahead mode: 5-row scratch + 2×8-row lookahead buffers instead
    # of the th+5 scratch — strictly smaller for th ≥ 16)
    sc_rows = (5 + 16) if lookahead_enabled() else (th + 5)
    parts_b = sum(
        (sc_rows + 2 * th + (th + 10)) * cp * w * itemsize for cp in part_ch
    )
    # h1 (f32 acc + dtype), h2/y (f32 + dtype), spade gb, out (×2 buf)
    mid_b = (th + 8) * c * w * (4 + itemsize) + (th + 6) * c * w * (4 + itemsize) \
        + th * 2 * c * w * itemsize + 2 * th * c * w * itemsize
    return parts_b + mid_b + carry_b


def _th_candidates(h: int, w: int, c: int, part_ch, itemsize: int,
                   int8: bool = False) -> tuple:
    """Feasible band heights, largest first (below the reject tier; the
    rolling-halo lookahead needs th ≥ 5 rows from exactly one future block,
    so every candidate is ≥ 8)."""
    if _BAND_ROWS is not None:
        cands = (_BAND_ROWS,)
    else:
        cands = _TH_CANDIDATES_INT8 if int8 else _TH_CANDIDATES
    return tuple(
        th
        for th in cands
        if h % th == 0
        and _vmem_estimate(h, w, c, part_ch, itemsize, th, int8) < _REJECT_BYTES
    )


def _pick_th(h: int, w: int, c: int, part_ch, itemsize: int = 2,
             int8: bool = False) -> Optional[int]:
    """Static feasibility pick (no probing): the largest TRUSTED candidate,
    else the smallest feasible one.  Only a pre-gate — the resolved height
    the kernels actually run at comes from :func:`resolve_band_th`."""
    feasible = None
    for th in _th_candidates(h, w, c, part_ch, itemsize, int8):
        if (
            th <= 32
            and _vmem_estimate(h, w, c, part_ch, itemsize, th, int8)
            < _TRUST_BYTES
        ):
            return th
        feasible = th  # last = smallest feasible
    return feasible


def fused_stage_supported(
    parts: Sequence[jax.Array], planes: int, pack: bool = False,
    int8: bool = False,
) -> bool:
    """Static gate: eval-size constraints for the W-minor kernel.

    ``pack=True`` (eval call sites) additionally admits deep levels via
    lane packing — W ≤ 64 with a divisible batch, and planes up to 768
    (anything past the r2-measured 256 region MUST clear the probe tier,
    see :func:`fused_stage_probe_ok`)."""
    h, w = parts[0].shape[1], parts[0].shape[2]
    if any(p.shape[1] != h or p.shape[2] != w for p in parts):
        return False
    f = _pack_factor(parts[0].shape[0], w) if pack else 1
    wp = w * f
    min_w = 8 if _interpret() else 128
    return (
        len(parts) <= 2
        and h % 8 == 0
        and h >= 8
        and wp >= min_w
        and planes <= (max(_PACK_MAX_PLANES, 256) if pack else 256)
        and len(
            _th_candidates(
                h, wp, planes, [p.shape[-1] for p in parts],
                jnp.dtype(parts[0].dtype).itemsize, int8,
            )
        )
        > 0
    )


# Resolved band heights (trusted or probe-passed), keyed by the kernel's
# full shape signature; False-y value = no feasible height (XLA fallback).
# Verdicts persist on disk (probe_th.json next to the XLA cache): FAILED
# probe compiles are not XLA-disk-cacheable, so without this every process
# re-pays ~40-60 s per doomed th=64 remote compile before falling back —
# several minutes of every bench/entry-point cold start. The file is
# salted with a source hash of the kernel modules (stale verdicts after a
# kernel edit could stack-OOM or under-resolve).
_TH_CACHE: dict = {}
_TH_CACHE_LOADED = False


def _th_cache_file():
    cache = _os.environ.get("SSUNET_GAN_TPU_XLA_CACHE")
    if cache == "0":
        return None
    if not cache:
        cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "ssunet_gan_tpu", "xla"
        )
    return _os.path.join(cache, "probe_th.json")


def _th_cache_salt() -> str:
    import hashlib

    h = hashlib.sha256()
    base = _os.path.dirname(_os.path.abspath(__file__))
    for mod in ("spade_kernel.py", "stage_kernel.py", "stage_kernel_int8.py"):
        try:
            with open(_os.path.join(base, mod), "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(mod.encode())
    return h.hexdigest()[:16]


def _th_cache_load() -> None:
    global _TH_CACHE_LOADED
    _TH_CACHE_LOADED = True
    path = _th_cache_file()
    if not path:
        return
    import ast
    import json

    try:
        with open(path) as f:
            blob = json.load(f)
        if blob.get("salt") != _th_cache_salt():
            return
        for k, v in blob.get("verdicts", {}).items():
            _TH_CACHE[ast.literal_eval(k)] = v  # reprs of literal tuples
    except Exception:
        pass


def _th_cache_store(key, value) -> None:
    path = _th_cache_file()
    if not path:
        return
    import json

    try:
        blob = {"salt": _th_cache_salt(), "verdicts": {}}
        try:
            with open(path) as f:
                old = json.load(f)
            if old.get("salt") == _th_cache_salt():
                blob = old
        except Exception:
            pass
        blob["verdicts"][repr(key)] = value
        tmp = path + f".tmp{_os.getpid()}"
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(blob, f)
        _os.replace(tmp, path)
    except Exception:
        pass


def resolve_band_th(
    parts: Sequence[jax.Array],
    planes: int,
    label_nc: int,
    nhidden: int,
    num_out: Optional[int] = None,
    pack: bool = False,
    int8: bool = False,
) -> Optional[int]:
    """The band height the fused kernel will run at for this stage shape:
    candidates are tried LARGEST first — the trust tier admits the measured
    region (th ≤ 32, planes ≤ 256, byte-sum under the calibrated bound),
    anything else probe-compiles the actual kernel program (bf16 or int8)
    once per signature; a Mosaic failure falls through to the next smaller
    height, and ``None`` (nothing compiles) means the XLA composition.

    Deep levels (planes > 256, reachable only with ``pack=True``) and the
    int8-only th=64 never take the trust tier — their VMEM economics sit
    outside the r2/r3 measured calibration."""
    h, w = parts[0].shape[1], parts[0].shape[2]
    part_ch = tuple(p.shape[-1] for p in parts)
    dtype = jnp.dtype(parts[0].dtype)
    f = _pack_factor(parts[0].shape[0], w) if pack else 1
    wp = w * f
    sub_w = w if f > 1 else 0
    up = tuple(isinstance(p, UpTensor) for p in parts)
    down = tuple(isinstance(p, (DownTensor, DownQTensor)) for p in parts)
    if f > 1:
        # lane-packed stages materialize their lazy pool seams before the
        # kernel (fused_eval_stage*), so the probe must model them as
        # plain parts
        down = (False,) * len(parts)
    key = (h, wp, sub_w, part_ch, planes, label_nc, nhidden, num_out,
           dtype.name, seg_stack_enabled(int8), int8, _BAND_ROWS,
           halo_carry_enabled(), lookahead_enabled(), up, _VMEM_LIMIT,
           pair_dots_enabled(planes), down, bias_tile_enabled())
    if not _TH_CACHE_LOADED and not _interpret():
        # interpret-mode (CPU) programs must not inherit real-hardware
        # probe verdicts: a TPU-resolved None/th would silently change
        # which code path the CPU suite exercises (stores are already
        # gated on _interpret in _th_cache_store)
        _th_cache_load()
    if key in _TH_CACHE:
        return _TH_CACHE[key]
    resolved = None
    for th in _th_candidates(h, wp, planes, part_ch, dtype.itemsize, int8):
        if any(up) and th % 16 != 0:
            continue  # half bands must stay 8-row-aligned
        if (
            planes <= 256
            and th <= 32
            # upsample/pool-on-read programs are never trusted
            and not any(up)
            and not any(down)
            and _vmem_estimate(h, wp, planes, part_ch, dtype.itemsize, th,
                               int8)
            < _TRUST_BYTES
        ):
            resolved = th
            break
        if int8:
            from ssunet_gan_tpu.ops.stage_kernel_int8 import (
                _probe_compile_int8,
            )

            ok = _probe_compile_int8(
                h, wp, part_ch, planes, label_nc, nhidden, num_out,
                dtype, sub_w, th=th, up=up, down=down,
            )
        else:
            ok = _probe_compile(
                h, wp, part_ch, planes, label_nc, nhidden, num_out, dtype,
                sub_w, th=th, up=up, down=down,
            )
        if ok:
            resolved = th
            break
    _TH_CACHE[key] = resolved
    if not _interpret():  # interpret-mode probes always "pass" — don't
        _th_cache_store(key, resolved)  # poison the real-hardware cache
    return resolved


def fused_stage_probe_ok(
    parts: Sequence[jax.Array],
    planes: int,
    label_nc: int,
    nhidden: int,
    num_out: Optional[int] = None,
    pack: bool = False,
    int8: bool = False,
) -> bool:
    """Second-tier gate: True iff :func:`resolve_band_th` finds a band
    height that is trusted or probe-compiles cleanly.  Callers (the model
    stage dispatch) fall back to the XLA module composition on False — the
    failure mode the old guard-band heuristic turned into a Mosaic crash."""
    return (
        resolve_band_th(parts, planes, label_nc, nhidden, num_out, pack,
                        int8)
        is not None
    )


def _probe_compile(h, w, part_ch, c, lab, nh, num_out, dtype, sub_w=0,
                   th=8, up=(), down=()) -> bool:
    if _interpret():
        return True  # no Mosaic/VMEM on the interpreter path
    s = jax.ShapeDtypeStruct
    csum = sum(part_ch)
    up = tuple(up) if up else (False,) * len(part_ch)
    down = tuple(down) if down else (False,) * len(part_ch)
    # batch 2, not 1: a multi-image grid forces the same cross-block
    # double-buffering schedule the real model call gets (r3: an n=1 probe
    # under-scheduled and passed where the in-model kernel OOMed)
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    k1s_shape = (
        (seg_r * 8, 3 * (seg_r + 2) * c + 1) if seg_r else (lab, 9 * c + 1)
    )
    pair = pair_dots_enabled(c)
    btile = pair or bias_tile_enabled()
    if pair:
        conv_shapes = [
            s((2 * c, 12 * csum), dtype),          # K1 pair lhs
            s((2 * c, w), dtype),                  # B1 tile
            s((2 * c, 12 * c + 2 * csum), dtype),  # K2+shortcut pair lhs
            s((2 * c, w), dtype),                  # B2 tile
        ]
    elif btile:
        conv_shapes = [
            s((c, 9 * csum), dtype),           # K1cat (no bias column)
            s((c, w), dtype),                  # B1 tile
            s((c, 9 * c + csum), dtype),       # K2SC (no bias column)
            s((c, w), dtype),                  # B2 tile
        ]
    else:
        conv_shapes = [
            s((c, 9 * csum + 1), dtype),       # K1cat
            s((c, 9 * c + csum + 1), dtype),   # K2SC
        ]
    def part_shape(pi, cp):
        if up[pi]:
            return s((2, h // 2, cp, w), dtype)
        if down[pi]:
            return s((2, 2 * h, cp, 2 * w), dtype)
        return s((2, h, cp, w), dtype)

    args = (
        [part_shape(pi, cp) for pi, cp in enumerate(part_ch)]
        + conv_shapes
        + [
            s(k1s_shape, dtype),               # K1s (per-row or seg-stacked)
            s((nh, 9 * lab + 1), dtype),       # K2s
            s((2 * c, 9 * nh + 1), dtype),     # K3s
        ]
        + ([] if num_out is None else [s((num_out, c + 1), dtype)])
    )

    def fn(*arrs):
        pv = list(arrs[: len(part_ch)])
        rest = arrs[len(part_ch) :]
        if btile:
            k1, b1, k2sc, b2, k1s, k2s, k3s = rest[:7]
            kf = rest[7] if num_out is not None else None
            pb = (b1, b2)
        else:
            k1, k2sc, k1s, k2s, k3s = rest[:5]
            kf = rest[5] if num_out is not None else None
            pb = None
        return _stage_call(pv, k1, k2sc, k1s, k2s, k3s, th, KF=kf, sub_w=sub_w,
                           vmem_limit=_VMEM_LIMIT - _PROBE_MARGIN,
                           seg_r=seg_r, seg_lab=lab, up=up, pair_b=pb,
                           pair=pair, down=down)

    try:
        jax.jit(fn).lower(*args).compile()
        return True
    except Exception as e:  # Mosaic RESOURCE_EXHAUSTED / lowering failures
        import sys

        print(
            "fused-stage probe failed for shape %s th=%d (%s); trying the "
            "next band height" % ((h, w, part_ch, c), th, type(e).__name__),
            file=sys.stderr,
        )
        return False


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------


def _upsample_on_read(scr, cur, lookr, i, th: int, h_img: int, dtype,
                      L: int = 5):
    """Expand a HALF-H part's band window to full-res rows in VMEM.

    The part stores the 2×-bilinear upsample's half-res payload (W-interp
    done, H-interp pending — :class:`ops.acts.UpTensor`). Band ``i``'s
    full-res window rows [i·th−5, i·th+th+5) pull half rows j0 = (p−1)//2
    and j0+1, all inside the assembled half window
    scratch(5) | cur(th/2) | look(5) = half rows [i·th/2−5, i·th/2+th/2+5):
    the band-to-band full-res stride th maps exactly to th/2 half rows, so
    the LOCAL source index per window row is static — only the two scalar
    weights depend on the (dynamic) absolute row. Out-of-image half rows
    are zero-masked and the unclipped-stencil weights provably route edge
    rows' full weight onto the in-range source (ops/acts.up_weights_exact,
    checked by the producer before any UpTensor exists).

    Weights are quantized to the operand dtype before the f32 lerp, so the
    expansion matches a bf16-weight H-einsum over the same payload
    bit-for-bit (pinned in tests/test_stage_kernel.py)."""
    thh = th // 2
    hh = h_img // 2
    xh_half = jnp.concatenate([scr[:], cur[:], lookr[0:L]], axis=0)
    g0h = i * thh - L
    xh_half = _zero_outside_image(xh_half, g0h, hh).astype(jnp.float32)
    rows = []
    for t in range(th + 2 * L):
        lj = (t - L - 1) // 2 + L        # static local index of j0
        pf = i * th + (t - L)            # absolute full-res row (traced)
        j0g = i * thh + ((t - L - 1) // 2)  # absolute half row of lj (traced)
        # exact-integer numerators over ONE correctly-rounded f32 division:
        # bit-identical to the f64-derived einsum weights after bf16
        # rounding (ops/acts.up_weights_exact verifies per size)
        w1f = (pf * (hh - 1) - j0g * (2 * hh - 1)).astype(jnp.float32) \
            / jnp.float32(2 * hh - 1)
        w0f = ((j0g + 1) * (2 * hh - 1) - pf * (hh - 1)).astype(jnp.float32) \
            / jnp.float32(2 * hh - 1)
        # quantize to the operand dtype (the einsum path's bf16 weights),
        # accumulate the 2-term lerp in f32 — exactly the einsum's numerics
        w0 = w0f.astype(dtype).astype(jnp.float32)
        w1 = w1f.astype(dtype).astype(jnp.float32)
        rows.append(xh_half[lj] * w0 + xh_half[lj + 1] * w1)
    xh = jnp.stack(rows, axis=0).astype(dtype)
    return _zero_outside_image(xh, i * th - L, h_img)


def _pool_on_read(scr, cur, lookr, sel, i, th: int, h_img: int, dtype):
    """Expand a FULL-res part's band window to POOLED rows in VMEM.

    The part stores the producer's full-res output (:class:`DownTensor`);
    pooled band ``i`` needs pooled window rows [i·th−5, i·th+th+5), i.e.
    full rows [2(i·th−5), 2(i·th+th+5)) — assembled from scratch(10) |
    cur(2·th) | lookahead(10 of 16). Each pooled row is the 2×2 window max:
    the H pair is two adjacent full rows (free), the W pair a 1-column
    left-shift (the duplicated edge column is discarded by decimation —
    even W keeps the last anchor at W−2), and the even-column decimation
    rides ``sel`` (a one-hot (2W, W) matrix) as an exact MXU selection,
    two pooled rows per dot so the lhs fills 2·Cp of the MXU's M rows.
    Max association order and value semantics equal ops/wminor's
    ``reshape6`` lowering (max(max(TL,TR), max(BL,BR)))."""
    xf = jnp.concatenate([scr[:], cur[:], lookr[0:10]], axis=0)
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
        outs.append(d.astype(dtype))
    cp = xf.shape[1]
    mp = jnp.concatenate(outs, axis=0).reshape(th + 10, cp, sel.shape[1])
    return _zero_outside_image(mp, i * th - 5, h_img)


def _make_kernel(n_parts: int, th: int, c: int, w: int, part_ch, h_img: int,
                 has_final: bool, sub_w: int = 0, seg_r: int = 0,
                 seg_lab: int = 0, carry: bool = False, look: bool = False,
                 up: Tuple[bool, ...] = (), pair: bool = False,
                 btile: bool = False, down: Tuple[bool, ...] = ()):
    up = tuple(up) if up else (False,) * n_parts
    down = tuple(down) if down else (False,) * n_parts

    def kernel(*refs):
        # operand order: [xcur_p ×P] [xlook_p ×P if look] K1cat, [B1 btile],
        #                K2SC, [B2 btile], K1s, K2s, K3s, [KF], [SEL down],
        #                out, [scratch_p ×P], [h1c, yc, [segc], actvc]
        nl = n_parts * (1 + int(look))
        xcur = refs[:n_parts]
        xlook = refs[n_parts:nl]
        if btile:
            k1_ref, b1_ref, k2sc_ref, b2_ref, k1s_ref, k2s_ref, k3s_ref = (
                refs[nl : nl + 7]
            )
            nl += 2
        else:
            k1_ref, k2sc_ref, k1s_ref, k2s_ref, k3s_ref = refs[nl : nl + 5]
        kf_ref = refs[nl + 5] if has_final else None
        nl += int(has_final)
        sel_ref = refs[nl + 5] if any(down) else None
        nl += int(any(down))
        o_ref = refs[nl + 5]
        scratch = refs[nl + 6 :]
        cscr = scratch[n_parts:]  # halo-carry refs (empty when carry=False)

        i = pl.program_id(1)
        dtype = o_ref.dtype
        cur = [xcur[p][:] for p in range(n_parts)]

        def _compute():
            # global image row of xh row 0 (band rows are masked against
            # [0, h_img), so garbage in the first band's top halo — stale
            # scratch in lookahead mode — and past-the-end lookahead rows
            # both zero out)
            g0 = (i if look else i - 1) * th - 5
            xh_parts = []
            for p in range(n_parts):
                if up[p]:
                    xh_parts.append(
                        _upsample_on_read(
                            scratch[p], cur[p], xlook[p], i, th, h_img, dtype
                        )
                    )  # (th+10, Cp, W) — expanded from th/2+10 half rows
                    continue
                if down[p]:
                    xh_parts.append(
                        _pool_on_read(
                            scratch[p], cur[p], xlook[p], sel_ref, i, th,
                            h_img, dtype,
                        )
                    )  # (th+10, Cp, W) — pooled from 2·th+20 full rows
                    continue
                if look:  # scratch(5) | cur(th) | lookahead(5)
                    xh = jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:5]], axis=0
                    )
                else:  # scratch(th+5) | cur(5)
                    xh = jnp.concatenate([scratch[p][:], cur[p][0:5]], axis=0)
                xh_parts.append(
                    _zero_outside_image(xh, g0, h_img).astype(dtype)
                )  # (th+10, Cp, W)

            # h1 = relu(bn1-folded conv1 over all parts): one deep-K packed
            # dot per output row (contraction 9·ΣCp + 1); the per-row relu+
            # downcast keeps the f32 accumulators out of the live set (the
            # tall-band VMEM high-water, see _conv3_rows). With halo carry
            # the top 8 rows come from the previous band's scratch.
            # Pair mode (2C ≤ 128): TWO rows per dot — the 2-row-block lhs
            # contracts the 4-row tap window (12 taps/pair vs 2×9), the
            # bias rides as a pre-broadcast (2C, W) tile on the f32
            # accumulator; fills the MXU's M rows the per-row C-high dot
            # leaves half-idle (see the module note).
            first = i == 0 if look else i == 1
            b1t = b1_ref[:].astype(jnp.float32) if btile else None
            if pair:

                def h1_pair(g):
                    taps = []
                    for p in range(n_parts):
                        for m in range(4):
                            r = xh_parts[p][2 * g + m]
                            for dx in range(3):
                                taps.append(_shift_w(r, dx, sub_w))
                    x12 = jnp.concatenate(taps, axis=0)  # (12·ΣCp, W)
                    acc = jnp.dot(k1_ref[:], x12,
                                  preferred_element_type=jnp.float32)
                    return jax.nn.relu(acc + b1t).astype(dtype)  # (2C, W)

                h1 = jnp.concatenate(
                    [h1_pair(g) for g in range((th + 8) // 2)], axis=0
                ).reshape(th + 8, c, w)
                h1 = _zero_outside_image(h1, g0 + 1, h_img)
            else:
                if btile:
                    h1_row = _conv3_row_fn(
                        xh_parts, k1_ref[:], dtype, sub_w,
                        post=lambda r: jax.nn.relu(r + b1t).astype(dtype),
                        ones=False)
                else:
                    h1_row = _conv3_row_fn(
                        xh_parts, k1_ref[:], dtype, sub_w,
                        post=lambda r: jax.nn.relu(r).astype(dtype))
                if carry:
                    h1 = _carried_rows(h1_row, th + 8, 8, cscr[0], first,
                                       g0 + 1, h_img)
                else:
                    h1 = jnp.stack([h1_row(t) for t in range(th + 8)], axis=0)
                    h1 = _zero_outside_image(h1, g0 + 1, h_img)  # (th+8, C, W)

            # conv2 + 1×1 shortcut + bn2 bias fused into ONE per-row dot:
            # row input = [9 taps of h1 | per-part x row | ones]
            ones_row = jnp.ones((1, w), dtype)

            b2t = b2_ref[:].astype(jnp.float32) if btile else None
            if pair:

                def y_pair(g):
                    taps = []
                    for m in range(4):
                        r = h1[2 * g + m]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx, sub_w))
                    for p in range(n_parts):
                        taps.append(xh_parts[p][2 * g + 2])
                        taps.append(xh_parts[p][2 * g + 3])
                    xp = jnp.concatenate(taps, axis=0)  # (12C + 2ΣCp, W)
                    acc = jnp.dot(k2sc_ref[:], xp,
                                  preferred_element_type=jnp.float32)
                    return jax.nn.relu(acc + b2t).astype(dtype)  # (2C, W)

                y = jnp.concatenate(
                    [y_pair(g) for g in range((th + 6) // 2)], axis=0
                ).reshape(th + 6, c, w)
                y = _zero_outside_image(y, g0 + 2, h_img)
            else:
                def y_row(t):
                    taps = []
                    for dy in range(3):
                        r = h1[t + dy]
                        for dx in range(3):
                            taps.append(_shift_w(r, dx, sub_w))
                    for p in range(n_parts):
                        taps.append(xh_parts[p][t + 2])
                    if not btile:
                        taps.append(ones_row)
                    x9 = jnp.concatenate(taps, axis=0)  # (9C + ΣCp [+1], W)
                    acc = jnp.dot(k2sc_ref[:], x9,
                                  preferred_element_type=jnp.float32)
                    if btile:
                        acc = acc + b2t
                    return jax.nn.relu(acc).astype(dtype)

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
            if not has_final:
                o_ref[:] = out
            else:
                # fold the model's final 1×1 conv in: the full-res stage
                # output has no other consumer, so only logits leave VMEM
                fin_rows = []
                for t in range(th):
                    xr = jnp.concatenate([out[t], ones_row], axis=0)
                    acc = jnp.dot(kf_ref[:], xr,
                                  preferred_element_type=jnp.float32)
                    fin_rows.append(acc.astype(dtype))
                o_ref[:] = jnp.stack(fin_rows, axis=0)

        if look:
            # no prologue step: band i computes from scratch (last 5 rows
            # of block i−1; stale for i=0, masked), block i and the 8-row
            # lookahead view of block i+1
            _compute()
            for p in range(n_parts):
                if down[p]:
                    scratch[p][:] = cur[p][2 * th - 10 :]
                else:
                    scratch[p][:] = cur[p][(th // 2 if up[p] else th) - 5 :]
        else:
            pl.when(i > 0)(_compute)

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


def _stage_call(parts_v, K1cat, K2SC, K1s, K2s, K3s, th: int, KF=None,
                sub_w: int = 0, vmem_limit: Optional[int] = None,
                seg_r: int = 0, seg_lab: int = 0,
                up: Optional[Tuple[bool, ...]] = None,
                pair_b: Optional[Tuple[jax.Array, jax.Array]] = None,
                pair: bool = False,
                down: Optional[Tuple[bool, ...]] = None):
    """parts_v: list of (N, H, Cp, W) views; returns (N, H, C_out, W)
    where C_out is the stage width, or the final head's class count when
    ``KF`` folds the model's last 1×1 conv in.

    ``up[p]`` marks a HALF-H part (an :class:`UpTensor` payload,
    (N, H/2, Cp, W)) whose pending 2× bilinear H-interp runs on read inside
    the kernel: its blocks/scratch/lookahead use the identical rolling
    structure at th/2 granularity (band-to-band stride th maps exactly to
    th/2 half-rows, so the in-band source indices are static), and the
    full-res tensor never exists in HBM. Requires the lookahead grid and
    th % 16 == 0 (the half bands must stay 8-row-aligned).

    ``pair_b`` = (B1, B2) pre-broadcast bias tiles moves the conv biases
    out of the contractions (bias-tile mode, K = exactly 9·ΣCp — see
    :func:`bias_tile_enabled`); ``K1cat``/``K2SC`` must then have no bias
    column. With ``pair=True`` additionally two rows per dot: the tiles
    are (2C, W) and the lhs the ``_pair_lhs_conv3``/``_pair_lhs_rows``
    2-row-block packings (see :func:`pair_dots_enabled`).

    ``down[p]`` marks a FULL-res part (a :class:`DownTensor` payload,
    (N, 2H, Cp, 2W)) whose pending 2×2 max-pool runs on read: bands of
    2·th full rows pair-max in VMEM (H pair free, W pair via a 1-column
    shift) and decimate even columns through a one-hot MXU dot — the
    pooled tensor never exists in HBM. Requires the lookahead grid."""
    n = parts_v[0].shape[0]
    up = tuple(bool(u) for u in (up or (False,) * len(parts_v)))
    down = tuple(bool(u) for u in (down or (False,) * len(parts_v)))
    # logical (pooled-space) image dims: up parts store H/2 rows, down
    # parts store 2H rows and 2W columns
    w = parts_v[0].shape[3] // (2 if down[0] else 1)
    h = parts_v[0].shape[1] * (2 if up[0] else 1) // (2 if down[0] else 1)
    # pair mode: the conv lhs matrices are 2-row blocks (2C rows)
    c = K2SC.shape[0] // (2 if pair else 1)
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    nh = h // th
    look = lookahead_enabled()
    assert not any(up) or (look and th % 16 == 0), (up, look, th)
    assert not any(down) or look, (down, look)
    assert not (any(down) and sub_w), "lane packing excludes pool-on-read"
    grid = (n, nh) if look else (n, nh + 1)
    dtype = parts_v[0].dtype
    c_out = c if KF is None else KF.shape[0]
    carry = halo_carry_enabled()

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
        # 8-row window at the next band's first rows ((hi+1)·tb; tb % 8 ==
        # 0 so the block index is exact), clamped into the image for the
        # last band — those rows are ≥ h and masked in-kernel. Down parts
        # need 10 full-res rows of lookahead → a 16-row window.
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
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    scratch = [
        pltpu.VMEM(
            (10, part_ch[p], 2 * w) if down[p]
            else (5 if look else th + 5, part_ch[p], w),
            dtype,
        )
        for p in range(n_parts)
    ]
    if carry:
        lab = seg_lab if seg_r else K1s.shape[0]
        scratch += [
            pltpu.VMEM((8, c, w), dtype),          # h1 carry
            pltpu.VMEM((6, c, w), dtype),          # y carry
        ]
        if not seg_r:
            scratch += [pltpu.VMEM((4, lab, w), dtype)]  # seg carry
        scratch += [pltpu.VMEM((2, K2s.shape[0], w), dtype)]  # actv carry

    if pair_b is not None:
        weights = [K1cat, pair_b[0], K2SC, pair_b[1], K1s, K2s, K3s]
    else:
        weights = [K1cat, K2SC, K1s, K2s, K3s]
    weights += [] if KF is None else [KF]
    if any(down):
        # even-column decimation matrix for pool-on-read (one-hot rows —
        # the dot is an exact selection in any dtype used here)
        import numpy as _np

        sel = _np.zeros((2 * w, w), _np.float32)
        sel[_np.arange(0, 2 * w, 2), _np.arange(w)] = 1.0
        weights += [jnp.asarray(sel, dtype)]
    return pl.pallas_call(
        _make_kernel(n_parts, th, c, w, part_ch, h, KF is not None, sub_w,
                     seg_r, seg_lab, carry=carry, look=look, up=up,
                     pair=pair, btile=pair_b is not None, down=down),
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
        out_shape=jax.ShapeDtypeStruct((n, h, c_out, w), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or _VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(*((list(parts_v) + list(parts_v)) if look else parts_v), *weights)


# ---------------------------------------------------------------------------
# Public entry: NHWC parts + module param bundles.
# ---------------------------------------------------------------------------


def fused_eval_stage(
    parts: Sequence[jax.Array],
    block_bundle: Tuple,
    spade_bundle: Tuple,
    final_head: Optional[Tuple] = None,
    emit_wminor: bool = False,
) -> jax.Array:
    """Eval-mode BasicBlock + self-SPADE stage as one Pallas program.

    ``block_bundle`` comes from ``BasicBlock.__call__(None, ...)``:
    ``(k1, (s1, t1), k2, (s2, t2), ks)`` with the BN eval affines;
    ``spade_bundle`` from ``SPADE.__call__(None, None)``. ``final_head``
    (kernel (1,1,C,ncls), bias) folds the model's final 1×1 conv in and
    makes the LOGITS the kernel's only output (the full-res stage output
    never leaves VMEM).

    ``parts`` may mix NHWC arrays and W-minor :class:`WTensor`\\ s;
    ``emit_wminor=True`` returns a :class:`WTensor` (unpacked lane layouts
    and folded-head logits always come back NHWC) — see ops/wminor.py.
    """
    k1, (s1, t1), k2, (s2, t2), ks = block_bundle
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = spade_bundle
    dtype = parts[0].dtype
    c = k2.shape[-1]
    lab = k1s.shape[-1]
    nh = k2s.shape[-1]

    # fold the BN eval affines into the conv weights / a bias column
    k1f = k1 * s1  # HWIO · (C,) broadcasts over the out axis
    k2f = k2 * s2

    # W-minor packing, per-row packed-tap layout: parts-major tap-major
    # columns, bias LAST (matches _conv3_rows / the kernel's row assembly)
    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    k1_parts = [
        k1f[:, :, offs[pi] : offs[pi + 1], :].reshape(9 * parts[pi].shape[-1], c).T
        for pi in range(len(parts))
    ]
    K1cat = jnp.concatenate(k1_parts + [t1.reshape(c, 1)], axis=1).astype(dtype)
    if ks is None:
        # shortcut-free stage (VGGBlock): the kernel's conv2 row assembly
        # always appends the x taps, so pack zero shortcut columns — the
        # wasted contraction depth is ΣCp ≪ 9C
        ks_parts = [jnp.zeros((c, p.shape[-1]), k2f.dtype) for p in parts]
    else:
        ks_parts = [
            ks[0, 0, offs[pi] : offs[pi + 1], :].T for pi in range(len(parts))
        ]
    # conv2 + shortcut + bn2 bias in one contraction: [9 taps of h1 | x | 1]
    K2SC = jnp.concatenate(
        [k2f.reshape(9 * c, c).T] + ks_parts + [t2.reshape(c, 1)], axis=1
    ).astype(dtype)

    # SPADE packing (same conventions as spade_kernel._stage_fwd_impl)
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

    # logical image dims come from the part list (UpTensor/DownTensor
    # report the logical NHWC shape), not the raw views
    n, h, w = parts[0].shape[0], parts[0].shape[1], parts[0].shape[2]
    f = _pack_factor(n, w)
    if f > 1 and any(isinstance(p, DownTensor) for p in parts):
        # lane packing (deep levels) excludes pool-on-read — materialize
        parts = tuple(
            materialize_down(p) if isinstance(p, DownTensor) else p
            for p in parts
        )
    up = tuple(isinstance(p, UpTensor) for p in parts)
    down = tuple(isinstance(p, DownTensor) for p in parts)
    parts_v = _wminor_views(parts)  # (N, H, Cp, W); up parts: (N, H/2, Cp, W)
    sub_w = w if f > 1 else 0
    if f > 1:  # deep level: fill the lanes with f images side by side
        # (lane packing is W-axis-only, so half-H up parts pack unchanged)
        parts_v = [_pack_lanes(pv, f) for pv in parts_v]
    th = resolve_band_th(
        parts, c, lab, nh, None if KF is None else KF.shape[0], pack=True,
    )
    assert th is not None, "caller must gate with fused_stage_supported"
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    if seg_r:
        K1s = pack_seg_stacked(k1s, b1s, seg_r, dtype)
    pair_b = None
    pair = pair_dots_enabled(c)
    wp = w * f
    if pair:
        # pair mode: 2-row-block conv lhs (no bias columns) + (2C, W)
        # pre-broadcast bias tiles — see the module note at set_pair_dots
        cp9 = [9 * p.shape[-1] for p in parts]
        K1cat = _pair_lhs_conv3(
            jnp.concatenate(k1_parts, axis=1).astype(dtype), cp9
        )
        K2SC = jnp.concatenate(
            [
                _pair_lhs_conv3(k2f.reshape(9 * c, c).T.astype(dtype), [9 * c]),
                _pair_lhs_rows([kp.astype(dtype) for kp in ks_parts]),
            ],
            axis=1,
        )
        pair_b = (
            _pair_bias_tile(t1, wp, dtype),
            _pair_bias_tile(t2, wp, dtype),
        )
    elif bias_tile_enabled():
        # bias-tile mode (default): per-row dots with K = exactly 9·ΣCp —
        # the biases leave the contraction (see set_bias_tile)
        K1cat = jnp.concatenate(k1_parts, axis=1).astype(dtype)
        K2SC = jnp.concatenate(
            [k2f.reshape(9 * c, c).T] + ks_parts, axis=1
        ).astype(dtype)
        pair_b = (
            jnp.broadcast_to(t1.astype(dtype)[:, None], (c, wp)),
            jnp.broadcast_to(t2.astype(dtype)[:, None], (c, wp)),
        )
    outv = _stage_call(
        parts_v, K1cat, K2SC, K1s, K2s, K3s, th, KF=KF, sub_w=sub_w,
        seg_r=seg_r, seg_lab=lab, up=up, pair_b=pair_b, pair=pair,
        down=down,
    )
    if f > 1:
        outv = _unpack_lanes(outv, f)
    elif emit_wminor and KF is None:
        return WTensor(outv)
    return jnp.swapaxes(outv, 2, 3)

# ---------------------------------------------------------------------------
# Bottleneck stage variant (UNet_B_SS, archs.py:346-406): conv1(1×1)-bn-relu
# → conv2(3×3)-bn-relu → conv3(1×1)-bn (+shortcut conv+bn or identity) →
# relu → self-SPADE — the same rolling-halo program with a per-row 1×1
# prologue dot and conv3+shortcut+biases folded into ONE deep contraction
# ([h2 | x parts | 1]).  Lookahead 4 (1 conv2 ring + 3 SPADE rings).
# ---------------------------------------------------------------------------


def _make_bneck_kernel(n_parts: int, th: int, c: int, w: int, part_ch,
                       h_img: int, has_final: bool, sub_w: int = 0,
                       seg_r: int = 0, seg_lab: int = 0, carry: bool = False,
                       look: bool = False, up: Tuple[bool, ...] = ()):
    L = 4
    up = tuple(up) if up else (False,) * n_parts

    def kernel(*refs):
        # operand order: [xcur_p ×P] [xlook_p ×P if look] weights..., out,
        #                [scratch_p ×P], [carry refs]
        nl = n_parts * (1 + int(look))
        xcur = refs[:n_parts]
        xlook = refs[n_parts:nl]
        k1b_ref, k2b_ref, k3sc_ref = refs[nl : nl + 3]
        k1s_ref, k2s_ref, k3s_ref = refs[nl + 3 : nl + 6]
        kf_ref = refs[nl + 6] if has_final else None
        o_ref = refs[nl + 6 + int(has_final)]
        scratch = refs[nl + 7 + int(has_final) :]
        cscr = scratch[n_parts:]  # halo-carry refs (empty when carry=False)

        i = pl.program_id(1)
        dtype = o_ref.dtype
        cur = [xcur[p][:] for p in range(n_parts)]

        def _compute():
            first = i == 0 if look else i == 1
            g0 = (i if look else i - 1) * th - L  # global row of xh row 0
            xh_parts = []
            for p in range(n_parts):
                if up[p]:
                    # half-res UpTensor part: 2× H-interp on read (same
                    # lerp machinery as the basic kernel, halo L=4)
                    xh_parts.append(
                        _upsample_on_read(scratch[p], cur[p], xlook[p], i,
                                          th, h_img, dtype, L=L)
                    )
                    continue
                if look:  # scratch(4) | cur(th) | lookahead(4)
                    xh = jnp.concatenate(
                        [scratch[p][:], cur[p], xlook[p][0:L]], axis=0
                    )
                else:  # scratch(th+4) | cur(4)
                    xh = jnp.concatenate([scratch[p][:], cur[p][0:L]], axis=0)
                xh_parts.append(
                    _zero_outside_image(xh, g0, h_img).astype(dtype)
                )
            ones_row = jnp.ones((1, w), dtype)

            # conv1 (1×1) + bn1 + relu, per-row dot over [x parts | 1];
            # per-row relu+downcast keeps f32 accumulators off the live set
            def h1_row(t):
                xr = jnp.concatenate(
                    [xh_parts[p][t] for p in range(n_parts)] + [ones_row], axis=0
                )
                acc = jnp.dot(k1b_ref[:], xr,
                              preferred_element_type=jnp.float32)
                return jax.nn.relu(acc).astype(dtype)

            if carry:
                h1 = _carried_rows(h1_row, th + 2 * L, 2 * L, cscr[0], first,
                                   g0, h_img)
            else:
                h1 = jnp.stack([h1_row(t) for t in range(th + 2 * L)], axis=0)
                h1 = _zero_outside_image(h1, g0, h_img)  # (th+8, C, W)

            # conv2 (3×3) + bn2 + relu
            h2_row = _conv3_row_fn([h1], k2b_ref[:], dtype, sub_w,
                                   post=lambda r: jax.nn.relu(r).astype(dtype))
            if carry:
                h2 = _carried_rows(h2_row, th + 6, 6, cscr[1], first,
                                   g0 + 1, h_img)
            else:
                h2 = jnp.stack([h2_row(t) for t in range(th + 6)], axis=0)
                h2 = _zero_outside_image(h2, g0 + 1, h_img)  # (th+6, C, W)

            # conv3 (1×1) + bn3 + shortcut(+bn / identity) + relu: one dot
            # over [h2 | x parts | 1] (identity shortcut packs I_C columns)
            def y_row(t):
                # y row t is global row g0+1+t → x slab index t+1
                xr = jnp.concatenate(
                    [h2[t]]
                    + [xh_parts[p][t + 1] for p in range(n_parts)]
                    + [ones_row],
                    axis=0,
                )
                acc = jnp.dot(k3sc_ref[:], xr,
                              preferred_element_type=jnp.float32)
                return jax.nn.relu(acc).astype(dtype)

            if carry:
                y = _carried_rows(y_row, th + 6, 6, cscr[2], first,
                                  g0 + 1, h_img)
            else:
                y = jnp.stack([y_row(t) for t in range(th + 6)], axis=0)
                y = _zero_outside_image(y, g0 + 1, h_img)

            tail_carry = None
            if carry:
                tail_carry = (None if seg_r else cscr[3], cscr[-1], first)
            out = _spade_tail(
                y, g0 + 1, h_img, k1s_ref, k2s_ref, k3s_ref, dtype, sub_w,
                seg_r=seg_r, seg_lab=seg_lab, carry=tail_carry,
            )
            if not has_final:
                o_ref[:] = out
            else:
                fin_rows = []
                for t in range(th):
                    xr = jnp.concatenate([out[t], ones_row], axis=0)
                    acc = jnp.dot(kf_ref[:], xr,
                                  preferred_element_type=jnp.float32)
                    fin_rows.append(acc.astype(dtype))
                o_ref[:] = jnp.stack(fin_rows, axis=0)

        if look:
            # no prologue step: band i computes from scratch (last 4 rows of
            # block i−1; stale for i=0, masked), block i and the 4-row
            # lookahead view of block i+1
            _compute()
            for p in range(n_parts):
                scratch[p][:] = cur[p][(th // 2 if up[p] else th) - L :]
        else:
            pl.when(i > 0)(_compute)

            for p in range(n_parts):
                tail = scratch[p][th:]

                @pl.when(i == 0)
                def _init(p=p):
                    scratch[p][0:L] = jnp.zeros_like(scratch[p][0:L])
                    scratch[p][L:] = cur[p]

                @pl.when(i > 0)
                def _roll(p=p, tail=tail):
                    scratch[p][0:L] = tail
                    scratch[p][L:] = cur[p]

    return kernel


def _bneck_trust_est(h, wp, planes, part_ch, itemsize, th: int = 8) -> int:
    """Byte-sum estimate for the bneck program (the r3-calibrated basic
    estimate + the h1 slab this variant keeps live + the packed weights)."""
    est = _vmem_estimate(h, wp, planes, part_ch, itemsize, th)
    est += (8 + 8) * planes * wp * itemsize
    csum = sum(part_ch)
    est += (planes * (9 * csum + 9 * planes + planes + csum + 2)) * itemsize
    return est


_TH_CANDIDATES_BNECK = (32, 16, 8)


def resolve_band_th_bneck(
    parts: Sequence[jax.Array],
    planes: int,
    label_nc: int,
    nhidden: int,
    num_out: Optional[int] = None,
) -> Optional[int]:
    """Band height for the bneck kernel (r5: was fixed th=8): candidates
    largest-first; th=8 with no lazy parts takes the r3-calibrated trust
    estimate (the old gate's behaviour), taller bands and upsample-on-read
    programs probe-compile once per signature (cached + persisted)."""
    h, w = parts[0].shape[1], parts[0].shape[2]
    part_ch = tuple(p.shape[-1] for p in parts)
    dtype = jnp.dtype(parts[0].dtype)
    f = _pack_factor(parts[0].shape[0], w)
    wp = w * f
    sub_w = w if f > 1 else 0
    up = tuple(isinstance(p, UpTensor) for p in parts)
    look = lookahead_enabled() and h % 8 == 0
    key = ("bneck", h, wp, sub_w, part_ch, planes, label_nc, nhidden,
           num_out, dtype.name, seg_stack_enabled(), _BAND_ROWS,
           halo_carry_enabled(), look, up, _VMEM_LIMIT)
    if not _TH_CACHE_LOADED and not _interpret():
        _th_cache_load()
    if key in _TH_CACHE:
        return _TH_CACHE[key]
    resolved = None
    cands = (_BAND_ROWS,) if _BAND_ROWS else _TH_CANDIDATES_BNECK
    for th in cands:
        if h % th or (not look and th != 8):
            continue  # the prologue grid keeps the r3 shape (th=8 only)
        if any(up) and th % 16 != 0:
            continue  # half bands must stay 8-row-aligned
        if (
            th == 8
            and not any(up)
            and _bneck_trust_est(h, wp, planes, part_ch, dtype.itemsize, th)
            < _TRUST_BYTES
        ):
            resolved = th
            break
        if _probe_compile_bneck(h, wp, part_ch, planes, label_nc, nhidden,
                                num_out, dtype, sub_w, th=th, up=up):
            resolved = th
            break
    _TH_CACHE[key] = resolved
    if not _interpret():
        _th_cache_store(key, resolved)
    return resolved


def _probe_compile_bneck(h, w, part_ch, c, lab, nh, num_out, dtype, sub_w=0,
                         th=8, up=()) -> bool:
    if _interpret():
        return True
    s = jax.ShapeDtypeStruct
    csum = sum(part_ch)
    up = tuple(up) if up else (False,) * len(part_ch)
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    k1s_shape = (
        (seg_r * 8, 3 * (seg_r + 2) * c + 1) if seg_r else (lab, 9 * c + 1)
    )
    args = (
        [s((2, h // 2 if up[pi] else h, cp, w), dtype)
         for pi, cp in enumerate(part_ch)]
        + [
            s((c, csum + 1), dtype),        # K1B
            s((c, 9 * c + 1), dtype),       # K2B
            s((c, c + csum + 1), dtype),    # K3SC
            s(k1s_shape, dtype),            # K1s
            s((nh, 9 * lab + 1), dtype),    # K2s
            s((2 * c, 9 * nh + 1), dtype),  # K3s
        ]
        + ([] if num_out is None else [s((num_out, c + 1), dtype)])
    )

    def fn(*arrs):
        pv = list(arrs[: len(part_ch)])
        k1b, k2b, k3sc, k1s, k2s, k3s = arrs[len(part_ch) : len(part_ch) + 6]
        kf = arrs[len(part_ch) + 6] if num_out is not None else None
        return _bneck_call(pv, k1b, k2b, k3sc, k1s, k2s, k3s, th, KF=kf,
                           sub_w=sub_w, seg_r=seg_r, seg_lab=lab, up=up,
                           vmem_limit=_VMEM_LIMIT - _PROBE_MARGIN)

    try:
        jax.jit(fn).lower(*args).compile()
        return True
    except Exception as e:
        import sys

        print(
            "fused-bneck probe failed for shape %s th=%d (%s); trying the "
            "next band height" % ((h, w, part_ch, c), th, type(e).__name__),
            file=sys.stderr,
        )
        return False


def fused_bneck_supported(parts: Sequence[jax.Array], planes: int,
                          label_nc: Optional[int] = None,
                          nhidden: Optional[int] = None,
                          num_out: Optional[int] = None) -> bool:
    """Gate for the bottleneck stage kernel: eval-size constraints plus
    (when ``label_nc`` is given) a resolvable band height — trusted th=8
    or a probe-passed taller band (:func:`resolve_band_th_bneck`)."""
    if not fused_stage_supported(parts, planes, pack=True):
        return False
    if label_nc is None:
        return True  # static pre-gate only
    return (
        resolve_band_th_bneck(parts, planes, label_nc, nhidden, num_out)
        is not None
    )


def fused_eval_stage_bneck(
    parts: Sequence[jax.Array],
    block_bundle: Tuple,
    spade_bundle: Tuple,
    final_head: Optional[Tuple] = None,
    emit_wminor: bool = False,
) -> jax.Array:
    """Eval-mode Bottleneck + self-SPADE stage as one Pallas program.

    ``block_bundle`` comes from ``Bottleneck.__call__(None, ...)``:
    ``(k1, (s1, t1), k2, (s2, t2), k3, (s3, t3), ks, (ss, ts))`` with the
    BN eval affines (``ks``/``(ss, ts)`` None ⇒ identity shortcut).
    """
    k1, (s1, t1), k2, (s2, t2), k3, (s3, t3), ks, asb = block_bundle
    k1s, b1s, k2s, b2s, kgs, bgs, kbs, bbs = spade_bundle
    dtype = parts[0].dtype
    c = k2.shape[-1]
    lab = k1s.shape[-1]
    nh = k2s.shape[-1]

    offs = [0]
    for p in parts:
        offs.append(offs[-1] + p.shape[-1])
    csum = offs[-1]

    K1B = jnp.concatenate(
        [(k1[0, 0] * s1).T, t1.reshape(c, 1)], axis=1
    ).astype(dtype)  # (C, ΣCp+1)
    K2B = jnp.concatenate(
        [(k2 * s2).reshape(9 * c, c).T, t2.reshape(c, 1)], axis=1
    ).astype(dtype)  # (C, 9C+1)
    if ks is None:
        assert csum == c, "identity shortcut needs in_planes == planes"
        sc_cols = jnp.eye(c, dtype=k3.dtype)
        bias3 = t3
    else:
        ss, ts = asb
        sc_cols = (ks[0, 0] * ss).T
        bias3 = t3 + ts
    K3SC = jnp.concatenate(
        [(k3[0, 0] * s3).T, sc_cols, bias3.reshape(c, 1)], axis=1
    ).astype(dtype)  # (C, C+ΣCp+1)

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
        ).astype(dtype)

    # lane packing excludes lazy seams (deep levels only; materialize)
    n, h, w = parts[0].shape[0], parts[0].shape[1], parts[0].shape[2]
    f = _pack_factor(n, w)
    if f > 1 and any(isinstance(p, UpTensor) for p in parts):
        parts = tuple(
            materialize_up(p) if isinstance(p, UpTensor) else p for p in parts
        )
    up = tuple(isinstance(p, UpTensor) for p in parts)
    parts_v = _wminor_views(parts)
    sub_w = w if f > 1 else 0
    if f > 1:
        parts_v = [_pack_lanes(pv, f) for pv in parts_v]
    th = resolve_band_th_bneck(
        parts, c, lab, nh, None if KF is None else KF.shape[0]
    )
    assert th is not None, "caller must gate with fused_bneck_supported"
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    if seg_r:
        K1s = pack_seg_stacked(k1s, b1s, seg_r, dtype)
    outv = _bneck_call(parts_v, K1B, K2B, K3SC, K1s, K2s, K3s, th, KF=KF,
                       sub_w=sub_w, seg_r=seg_r, seg_lab=lab, up=up)
    if f > 1:
        outv = _unpack_lanes(outv, f)
    elif emit_wminor and KF is None:
        return WTensor(outv)
    return jnp.swapaxes(outv, 2, 3)


def _bneck_call(parts_v, K1B, K2B, K3SC, K1s, K2s, K3s, th: int, KF=None,
                sub_w: int = 0, seg_r: int = 0, seg_lab: int = 0,
                up: Optional[Tuple[bool, ...]] = None,
                vmem_limit: Optional[int] = None):
    """parts_v: (N, H, Cp, W) views (``up[p]``: half-H UpTensor payloads
    expanded on read, halo L=4); shared by the public entry and the probe
    compiler — see :func:`_stage_call` for the structure."""
    up = tuple(bool(u) for u in (up or (False,) * len(parts_v)))
    n = parts_v[0].shape[0]
    w = parts_v[0].shape[3]
    h = parts_v[0].shape[1] * (2 if up[0] else 1)
    c = K2B.shape[0]
    lab = seg_lab if seg_r else K1s.shape[0]
    nh = K2s.shape[0]
    dtype = parts_v[0].dtype
    part_ch = tuple(p.shape[2] for p in parts_v)
    L_BN = 4  # bneck halo rows (conv2 ring + 3 SPADE rings)
    nh_grid = h // th
    c_out = c if KF is None else KF.shape[0]
    look = lookahead_enabled() and h % 8 == 0
    assert not any(up) or (look and th % 16 == 0), (up, look, th)

    def cur_spec(p):
        tb = th // 2 if up[p] else th
        if look:
            return pl.BlockSpec(
                (None, tb, part_ch[p], w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, tb, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh_grid - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(p):
        # 8-row window at the next band's first rows, clamped into the image
        # for the last band — those rows are ≥ h and masked in-kernel
        tb = th // 2 if up[p] else th
        hp = h // 2 if up[p] else h
        return pl.BlockSpec(
            (None, 8, part_ch[p], w),
            lambda ni, hi, tb=tb, hp=hp: (
                ni, jnp.minimum((hi + 1) * (tb // 8), hp // 8 - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    carry = halo_carry_enabled()
    scratch = [
        pltpu.VMEM((L_BN if look else th + L_BN, part_ch[p], w), dtype)
        for p in range(len(parts_v))
    ]
    if carry:
        scratch += [
            pltpu.VMEM((8, c, w), dtype),   # h1 carry
            pltpu.VMEM((6, c, w), dtype),   # h2 carry
            pltpu.VMEM((6, c, w), dtype),   # y carry
        ]
        if not seg_r:
            scratch += [pltpu.VMEM((4, lab, w), dtype)]  # seg carry
        scratch += [pltpu.VMEM((2, nh, w), dtype)]       # actv carry
    weights = [K1B, K2B, K3SC, K1s, K2s, K3s] + ([] if KF is None else [KF])
    return pl.pallas_call(
        _make_bneck_kernel(len(parts_v), th, c, w, part_ch, h, KF is not None,
                           sub_w, seg_r, lab, carry=carry, look=look, up=up),
        grid=(n, nh_grid) if look else (n, nh_grid + 1),
        in_specs=(
            [cur_spec(p) for p in range(len(parts_v))]
            + ([look_spec(p) for p in range(len(parts_v))] if look else [])
            + [const(wt.shape) for wt in weights]
        ),
        out_specs=pl.BlockSpec(
            (None, th, c_out, w),
            (lambda ni, hi: (ni, hi, 0, 0)) if look
            else (lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, c_out, w), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or _VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(*((list(parts_v) + list(parts_v)) if look else parts_v), *weights)
