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

from ssunet_gan_tpu.ops.acts import UpTensor, WTensor, materialize_up
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
    an UpTensor yields its HALF-H payload — the caller must carry the up
    flag; plain NHWC arrays get the boundary swap)."""
    return [
        p.v if isinstance(p, (WTensor, UpTensor)) else jnp.swapaxes(p, 2, 3)
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
    key = (h, wp, sub_w, part_ch, planes, label_nc, nhidden, num_out,
           dtype.name, seg_stack_enabled(int8), int8, _BAND_ROWS,
           halo_carry_enabled(), lookahead_enabled(), up, _VMEM_LIMIT)
    if not _TH_CACHE_LOADED:
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
            and not any(up)  # upsample-on-read programs are never trusted
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
                dtype, sub_w, th=th, up=up,
            )
        else:
            ok = _probe_compile(
                h, wp, part_ch, planes, label_nc, nhidden, num_out, dtype,
                sub_w, th=th, up=up,
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
                   th=8, up=()) -> bool:
    if _interpret():
        return True  # no Mosaic/VMEM on the interpreter path
    s = jax.ShapeDtypeStruct
    csum = sum(part_ch)
    up = tuple(up) if up else (False,) * len(part_ch)
    # batch 2, not 1: a multi-image grid forces the same cross-block
    # double-buffering schedule the real model call gets (r3: an n=1 probe
    # under-scheduled and passed where the in-model kernel OOMed)
    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    k1s_shape = (
        (seg_r * 8, 3 * (seg_r + 2) * c + 1) if seg_r else (lab, 9 * c + 1)
    )
    args = (
        [s((2, h // 2 if up[pi] else h, cp, w), dtype)
         for pi, cp in enumerate(part_ch)]
        + [
            s((c, 9 * csum + 1), dtype),       # K1cat
            s((c, 9 * c + csum + 1), dtype),   # K2SC
            s(k1s_shape, dtype),               # K1s (per-row or seg-stacked)
            s((nh, 9 * lab + 1), dtype),       # K2s
            s((2 * c, 9 * nh + 1), dtype),     # K3s
        ]
        + ([] if num_out is None else [s((num_out, c + 1), dtype)])
    )

    def fn(*arrs):
        pv = list(arrs[: len(part_ch)])
        k1, k2sc, k1s, k2s, k3s = arrs[len(part_ch) : len(part_ch) + 5]
        kf = arrs[len(part_ch) + 5] if num_out is not None else None
        return _stage_call(pv, k1, k2sc, k1s, k2s, k3s, th, KF=kf, sub_w=sub_w,
                           vmem_limit=_VMEM_LIMIT - _PROBE_MARGIN,
                           seg_r=seg_r, seg_lab=lab, up=up)

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


def _upsample_on_read(scr, cur, lookr, i, th: int, h_img: int, dtype):
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
    xh_half = jnp.concatenate([scr[:], cur[:], lookr[0:5]], axis=0)
    g0h = i * thh - 5
    xh_half = _zero_outside_image(xh_half, g0h, hh).astype(jnp.float32)
    rows = []
    for t in range(th + 10):
        lj = (t - 6) // 2 + 5            # static local index of j0
        pf = i * th + (t - 5)            # absolute full-res row (traced)
        j0g = i * thh + ((t - 6) // 2)   # absolute half row of lj (traced)
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
    return _zero_outside_image(xh, i * th - 5, h_img)


def _make_kernel(n_parts: int, th: int, c: int, w: int, part_ch, h_img: int,
                 has_final: bool, sub_w: int = 0, seg_r: int = 0,
                 seg_lab: int = 0, carry: bool = False, look: bool = False,
                 up: Tuple[bool, ...] = ()):
    up = tuple(up) if up else (False,) * n_parts

    def kernel(*refs):
        # operand order: [xcur_p ×P] [xlook_p ×P if look] K1cat, K2SC, K1s,
        #                K2s, K3s, [KF], out, [scratch_p ×P],
        #                [h1c, yc, [segc], actvc]
        nl = n_parts * (1 + int(look))
        xcur = refs[:n_parts]
        xlook = refs[n_parts:nl]
        k1_ref, k2sc_ref, k1s_ref, k2s_ref, k3s_ref = refs[nl : nl + 5]
        kf_ref = refs[nl + 5] if has_final else None
        o_ref = refs[nl + 5 + int(has_final)]
        scratch = refs[nl + 6 + int(has_final) :]
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
            first = i == 0 if look else i == 1
            h1_row = _conv3_row_fn(xh_parts, k1_ref[:], dtype, sub_w,
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

            def y_row(t):
                taps = []
                for dy in range(3):
                    r = h1[t + dy]
                    for dx in range(3):
                        taps.append(_shift_w(r, dx, sub_w))
                for p in range(n_parts):
                    taps.append(xh_parts[p][t + 2])
                taps.append(ones_row)
                x9 = jnp.concatenate(taps, axis=0)  # (9C + ΣCp + 1, W)
                acc = jnp.dot(k2sc_ref[:], x9,
                              preferred_element_type=jnp.float32)
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
                up: Optional[Tuple[bool, ...]] = None):
    """parts_v: list of (N, H, Cp, W) views; returns (N, H, C_out, W)
    where C_out is the stage width, or the final head's class count when
    ``KF`` folds the model's last 1×1 conv in.

    ``up[p]`` marks a HALF-H part (an :class:`UpTensor` payload,
    (N, H/2, Cp, W)) whose pending 2× bilinear H-interp runs on read inside
    the kernel: its blocks/scratch/lookahead use the identical rolling
    structure at th/2 granularity (band-to-band stride th maps exactly to
    th/2 half-rows, so the in-band source indices are static), and the
    full-res tensor never exists in HBM. Requires the lookahead grid and
    th % 16 == 0 (the half bands must stay 8-row-aligned)."""
    n = parts_v[0].shape[0]
    w = parts_v[0].shape[3]
    up = tuple(bool(u) for u in (up or (False,) * len(parts_v)))
    # logical image height: up parts store H/2 rows
    h = parts_v[0].shape[1] * (2 if up[0] else 1)
    c = K2SC.shape[0]
    n_parts = len(parts_v)
    part_ch = tuple(p.shape[2] for p in parts_v)
    nh = h // th
    look = lookahead_enabled()
    assert not any(up) or (look and th % 16 == 0), (up, look, th)
    grid = (n, nh) if look else (n, nh + 1)
    dtype = parts_v[0].dtype
    c_out = c if KF is None else KF.shape[0]
    carry = halo_carry_enabled()

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
            lambda ni, hi: (ni, jnp.minimum(hi, nh - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(p):
        # 8-row window at the next band's first rows ((hi+1)·tb; tb % 8 ==
        # 0 so the block index is exact), clamped into the image for the
        # last band — those rows are ≥ h and masked in-kernel
        tb = th // 2 if up[p] else th
        hp = h // 2 if up[p] else h
        return pl.BlockSpec(
            (None, 8, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum((hi + 1) * (tb // 8), hp // 8 - 1),
                            0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    scratch = [
        pltpu.VMEM((5 if look else th + 5, part_ch[p], w), dtype)
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

    weights = [K1cat, K2SC, K1s, K2s, K3s] + ([] if KF is None else [KF])
    return pl.pallas_call(
        _make_kernel(n_parts, th, c, w, part_ch, h, KF is not None, sub_w,
                     seg_r, seg_lab, carry=carry, look=look, up=up),
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

    up = tuple(isinstance(p, UpTensor) for p in parts)
    parts_v = _wminor_views(parts)  # (N, H, Cp, W); up parts: (N, H/2, Cp, W)
    # logical image dims come from the part list (UpTensor reports the
    # full-res NHWC shape), not the possibly-half-H raw views
    n, h, w = parts[0].shape[0], parts[0].shape[1], parts[0].shape[2]
    f = _pack_factor(n, w)
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
    outv = _stage_call(
        parts_v, K1cat, K2SC, K1s, K2s, K3s, th, KF=KF, sub_w=sub_w,
        seg_r=seg_r, seg_lab=lab, up=up,
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
                       look: bool = False):
    L = 4

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
            if look:  # scratch(4) | cur(th) | lookahead(4)
                xh_parts = [
                    _zero_outside_image(
                        jnp.concatenate(
                            [scratch[p][:], cur[p], xlook[p][0:L]], axis=0
                        ),
                        g0, h_img,
                    ).astype(dtype)
                    for p in range(n_parts)
                ]
            else:  # scratch(th+4) | cur(4)
                xh_parts = [
                    _zero_outside_image(
                        jnp.concatenate([scratch[p][:], cur[p][0:L]], axis=0),
                        g0, h_img,
                    ).astype(dtype)
                    for p in range(n_parts)
                ]
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
                scratch[p][:] = cur[p][th - L :]
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


def fused_bneck_supported(parts: Sequence[jax.Array], planes: int) -> bool:
    """Gate for the bottleneck stage kernel: the eval-size constraints plus
    the conservative (trust-tier-only) VMEM bound — this variant has no
    probe path, so only the measured-safe region fuses (lane-packed deep
    levels included, at the packed width)."""
    if not fused_stage_supported(parts, planes, pack=True):
        return False
    h, w = parts[0].shape[1], parts[0].shape[2]
    wp = w * _pack_factor(parts[0].shape[0], w)
    part_ch = [p.shape[-1] for p in parts]
    est = _vmem_estimate(h, wp, planes, part_ch, parts[0].dtype.itemsize)
    # + the h1 slab this variant keeps live, + the packed weight operands
    # (which dominate at the deep widths the byte-sum wasn't calibrated for)
    est += (8 + 8) * planes * wp * parts[0].dtype.itemsize
    csum = sum(part_ch)
    est += (planes * (9 * csum + 9 * planes + planes + csum + 2)) \
        * parts[0].dtype.itemsize
    return est < _TRUST_BYTES


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

    parts_v = _wminor_views(parts)
    n, h, _, w = parts_v[0].shape
    f = _pack_factor(n, w)
    sub_w = w if f > 1 else 0
    if f > 1:
        parts_v = [_pack_lanes(pv, f) for pv in parts_v]
        n, w = n // f, w * f
    part_ch = tuple(p.shape[2] for p in parts_v)
    th = 8
    L_BN = 4  # bneck halo rows (conv2 ring + 3 SPADE rings)
    nh_grid = h // th
    c_out = c if KF is None else KF.shape[0]
    look = lookahead_enabled() and h % 8 == 0

    def cur_spec(p):
        if look:
            return pl.BlockSpec(
                (None, th, part_ch[p], w),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (None, th, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi, nh_grid - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def look_spec(p):
        # 8-row window at the next band's first rows, clamped into the image
        # for the last band — those rows are ≥ h and masked in-kernel
        return pl.BlockSpec(
            (None, 8, part_ch[p], w),
            lambda ni, hi: (ni, jnp.minimum(hi + 1, nh_grid - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    const = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0, 0), memory_space=pltpu.VMEM
    )

    seg_r = pick_seg_r(th + 4) if seg_stack_enabled() else 0
    if seg_r:
        K1s = pack_seg_stacked(k1s, b1s, seg_r, dtype)
    carry = halo_carry_enabled()
    scratch = [
        pltpu.VMEM((L_BN if look else th + L_BN, part_ch[p], w), dtype)
        for p in range(len(parts))
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
    outv = pl.pallas_call(
        _make_bneck_kernel(len(parts), th, c, w, part_ch, h, KF is not None,
                           sub_w, seg_r, lab, carry=carry, look=look),
        grid=(n, nh_grid) if look else (n, nh_grid + 1),
        in_specs=(
            [cur_spec(p) for p in range(len(parts))]
            + ([look_spec(p) for p in range(len(parts))] if look else [])
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(*((list(parts_v) + list(parts_v)) if look else parts_v), *weights)
    if f > 1:
        outv = _unpack_lanes(outv, f)
    elif emit_wminor and KF is None:
        return WTensor(outv)
    return jnp.swapaxes(outv, 2, 3)
