"""Sliding-window tiling: 4-pass patch grid + coverage-averaged merge.

The reference tiles giant scenes with four grid passes — top-left anchored,
bottom-right anchored, bottom-left, top-right — guaranteeing full coverage
including the right/bottom edges (patch_gen, dataset.py:147-220 and its
duplicate api:45-116), then merges per-patch predictions by accumulating a
sum canvas and a per-pixel coverage counter, averaging, and re-binarizing
(patch_merge, api:119-217).

TPU-native split of responsibilities:

- **coordinates** are pure host math (:func:`grid_coords`);
- **extraction** is host numpy slicing into one (N, p, p, C) batch —
  scenes live in host RAM; patches ship to the device as a single array;
- **merge runs on device** (:func:`make_merge_fn`): per-patch prob→uint8
  quantization, ×2 bilinear upsample (MXU matmuls), >127 binarization, and
  a `lax.scan` of dynamic-slice adds into sum/coverage canvases.  This
  replaces the reference's per-patch cv2 resize + numpy `+=` host loop
  (SURVEY.md §3 hot-loop rank 2).

Quantization parity: the reference casts sigmoid probs with
``(p*255).astype(uint8)`` (truncation), cv2-resizes the *uint8* mask, then
thresholds ``>127`` (post_process_resized_mask, api:33-42).  We reproduce
floor-quantization and threshold exactly; the bilinear resample is float
matmuls where cv2 rounds intermediates, so isolated boundary pixels whose
interpolated value sits exactly on the 127/128 edge may differ.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.ops.resize import _linear_matrix


def grid_coords(img_h: int, img_w: int, p_size: int, overlap: float = 0.5) -> np.ndarray:
    """(N, 2) array of (y, x) patch origins in reference pass order
    (patch_gen, dataset.py:147-220): TL, BR, BL, TR anchored grids."""
    if not 0 <= overlap < 1:
        # the reference divides by zero at overlap=1 (dataset.py:150-152);
        # its preprocess scripts use a different stride convention entirely
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    shift = 1 - overlap
    step = int(math.ceil(shift * p_size))
    i_w = int(math.floor((img_w - p_size) / step)) + 1
    i_h = int(math.floor((img_h - p_size) / step)) + 1

    coords: List[Tuple[int, int]] = []
    for i in range(i_w):  # pass 1: top-left anchored
        for j in range(i_h):
            coords.append((j * step, i * step))
    for i in range(i_w):  # pass 2: bottom-right anchored
        for j in range(i_h):
            coords.append((img_h - j * step - p_size, img_w - i * step - p_size))
    for i in range(i_w):  # pass 3: bottom-left (corner case)
        for j in range(i_h):
            coords.append((img_h - j * step - p_size, i * step))
    for i in range(i_w):  # pass 4: top-right
        for j in range(i_h):
            coords.append((j * step, img_w - i * step - p_size))

    arr = np.asarray(coords, np.int32).reshape(-1, 2)
    if len(arr) == 0 or (arr < 0).any() or (arr[:, 0] + p_size > img_h).any() or (arr[:, 1] + p_size > img_w).any():
        # the reference prints 'err' for out-of-range patches; we refuse
        raise ValueError(
            f"scene {img_h}x{img_w} smaller than patch {p_size} (or bad overlap)"
        )
    return arr


def extract_patches(img: np.ndarray, coords: np.ndarray, p_size: int) -> np.ndarray:
    """Host gather of (N, p, p, C) patches from an HWC scene."""
    out = np.empty((len(coords), p_size, p_size, img.shape[2]), img.dtype)
    for k, (y, x) in enumerate(coords):
        out[k] = img[y : y + p_size, x : x + p_size]
    return out


def patch_gen(img: np.ndarray, mask: np.ndarray, p_size: int, overlap: float = 0.5):
    """Reference-shaped API: returns (image_patches, mask_patches) lists
    (patch_gen, dataset.py:147-220)."""
    coords = grid_coords(img.shape[0], img.shape[1], p_size, overlap)
    imgs = extract_patches(img, coords, p_size)
    masks = extract_patches(mask, coords, p_size)
    return list(imgs), list(masks)


def post_process_resized_mask(resized_mask: np.ndarray) -> np.ndarray:
    """uint8 {0..255} → {0, 255} at threshold 127 (api:33-42)."""
    out = resized_mask.copy()
    out[(out > 127) & (out < 255)] = 255
    out[(out > 0) & (out <= 127)] = 0
    return out


def mask_convert(p_mask: np.ndarray, idx: int, p_size: int) -> np.ndarray:
    """Color-coded BGR label → per-class binary mask resized to p_size
    (api:220-236): (255,255,255)→c0, (255,0,0)→c1, (0,0,255)→c2 in BGR."""
    import cv2

    keys = {
        0: (255, 255, 255),
        1: (255, 0, 0),
        2: (0, 0, 255),
    }
    b, g, r = keys.get(idx, (255, 255, 255))
    mask_ = (
        (p_mask[:, :, 0] == b) & (p_mask[:, :, 1] == g) & (p_mask[:, :, 2] == r)
    )
    mask = np.where(mask_, 255, 0).astype(np.uint8)
    resized = cv2.resize(mask, (p_size, p_size))
    return post_process_resized_mask(resized)


@functools.lru_cache(maxsize=8)
def _merge_jit(scene_h: int, scene_w: int, in_size: int, p_size: int, num_classes: int):
    """Compiled device merge for one (scene shape, patch config)."""
    rm = jnp.asarray(_linear_matrix(in_size, p_size, False))
    cm = rm

    def merge(probs: jax.Array, coords: jax.Array) -> jax.Array:
        # probs: (N, in_size, in_size, C) sigmoid outputs — or the SAME
        # values already floor-quantized to uint8 by the forward
        # (infer/api quantize_probs: 4× fewer prob bytes, identical math)
        # 1. reference quantization: floor to uint8 (api:144 truncating cast)
        if probs.dtype == jnp.uint8:
            q = probs.astype(jnp.float32)
        else:
            q = jnp.floor(probs.astype(jnp.float32) * 255.0)
        # 2. bilinear resize in_size→p_size (cv2 default half-pixel centers),
        #    rounding like cv2's uint8 output
        q = jnp.einsum("ph,nhwc->npwc", rm, q)
        q = jnp.round(jnp.einsum("qw,npwc->npqc", cm, q))
        # 3. binarize >127 (post_process_resized_mask)
        binary = (q > 127.0).astype(jnp.float32)

        canvas = jnp.zeros((scene_h, scene_w, num_classes), jnp.float32)
        cover = jnp.zeros((scene_h, scene_w, 1), jnp.float32)

        def body(carry, inp):
            canvas, cover = carry
            patch, yx = inp
            y, x = yx[0], yx[1]
            cur = jax.lax.dynamic_slice(canvas, (y, x, 0), (p_size, p_size, num_classes))
            canvas = jax.lax.dynamic_update_slice(canvas, cur + patch, (y, x, 0))
            curc = jax.lax.dynamic_slice(cover, (y, x, 0), (p_size, p_size, 1))
            cover = jax.lax.dynamic_update_slice(cover, curc + 1.0, (y, x, 0))
            return (canvas, cover), None

        (canvas, cover), _ = jax.lax.scan(body, (canvas, cover), (binary, coords))
        cover = jnp.where(cover == 0, 1.0, cover)
        avg = canvas / cover
        # final re-binarize: (avg*255).astype(uint8) then >127 (api:212-215)
        final = jnp.floor(avg * 255.0) > 127.0
        return final.astype(jnp.uint8) * 255

    return jax.jit(merge)


def _grid_geometry(img_h: int, img_w: int, p_size: int, overlap: float):
    shift = 1 - overlap
    step = int(math.ceil(shift * p_size))
    i_w = int(math.floor((img_w - p_size) / step)) + 1
    i_h = int(math.floor((img_h - p_size) / step)) + 1
    return step, i_w, i_h


@functools.lru_cache(maxsize=8)
def _merge_grid_jit(scene_h: int, scene_w: int, in_size: int, p_size: int,
                    num_classes: int, step: int, i_w: int, i_h: int,
                    mesh=None):
    """O(canvas) overlap-add merge for the structured 4-pass grid.

    The scan-based merge (:func:`_merge_jit`) is O(N_patches × canvas) —
    each dynamic-slice add rewrites the whole canvas, ~13 s for a 4096²
    scene.  But :func:`grid_coords` emits four *regular lattices* (stride
    ``step``, patch ``p_size`` with ``p_size % step == 0``), so each pass
    reduces to a classic overlap-add: split every patch into q=p/step
    subtiles and accumulate q² statically-shifted block grids — pure
    reshapes plus q² static-slice adds, fully vectorized.  Passes 2–4 are
    pass 1 with flipped patch order and an edge-anchored origin.
    """
    q = p_size // step
    rm = jnp.asarray(_linear_matrix(in_size, p_size, False))
    oy_br = scene_h - p_size - (i_h - 1) * step
    ox_br = scene_w - p_size - (i_w - 1) * step

    def overlap_add(pass_block):
        """(i_w, i_h, P, P, C') i-major pass → ((i_h+q-1)·s, (i_w+q-1)·s, C')."""
        c = pass_block.shape[-1]
        x = pass_block.transpose(1, 0, 2, 3, 4)  # (i_h, i_w, P, P, C')
        x = x.reshape(i_h, i_w, q, step, q, step, c)
        rows, cols = i_h + q - 1, i_w + q - 1
        acc = jnp.zeros((rows, cols, step, step, c), jnp.float32)
        for a in range(q):
            for b in range(q):
                acc = acc.at[a : a + i_h, b : b + i_w].add(x[:, :, a, :, b, :, :])
        return acc.transpose(0, 2, 1, 3, 4).reshape(rows * step, cols * step, c)

    def accumulate(canvas, pass_block, oy, ox):
        block = overlap_add(pass_block)
        h, w, c = block.shape
        return canvas.at[oy : oy + h, ox : ox + w].add(block)

    # pass index → (i-flip, j-flip, origin) mapping grid_coords' 4 passes
    # onto ascending lattices
    PASS_SPECS = [
        ((slice(None), slice(None)), 0, 0),                       # TL
        ((slice(None, None, -1), slice(None, None, -1)), oy_br, ox_br),  # BR
        ((slice(None), slice(None, None, -1)), oy_br, 0),         # BL
        ((slice(None, None, -1), slice(None)), 0, ox_br),         # TR
    ]

    # Spatial-axis sharding (docs/ROADMAP "sharded merge canvases"): with a
    # mesh, the sum/coverage canvases shard ROW-wise over the 'data' axis —
    # scene size is then bounded by the mesh's aggregate HBM, not one
    # chip's.  The overlap-adds are static-slice adds, so XLA's SPMD
    # partitioner lowers the cross-shard rows to halo exchanges on ICI.
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows_sharding = NamedSharding(mesh, P("data"))
        constrain = lambda x: jax.lax.with_sharding_constraint(x, rows_sharding)
    else:
        constrain = lambda x: x

    def merge(probs: jax.Array) -> jax.Array:
        if probs.dtype == jnp.uint8:  # pre-quantized by the forward
            q_ = probs.astype(jnp.float32)
        else:
            q_ = jnp.floor(probs.astype(jnp.float32) * 255.0)
        q_ = jnp.einsum("ph,nhwc->npwc", rm, q_)
        q_ = jnp.round(jnp.einsum("qw,npwc->npqc", rm, q_))
        binary = (q_ > 127.0).astype(jnp.float32)

        passes = binary.reshape(4, i_w, i_h, p_size, p_size, num_classes)
        canvas = constrain(jnp.zeros((scene_h, scene_w, num_classes), jnp.float32))
        cover = constrain(jnp.zeros((scene_h, scene_w, 1), jnp.float32))
        ones = jnp.ones((i_w, i_h, p_size, p_size, 1), jnp.float32)
        for k, ((si, sj), oy, ox) in enumerate(PASS_SPECS):
            canvas = constrain(accumulate(canvas, passes[k][si, sj], oy, ox))
            cover = constrain(accumulate(cover, ones, oy, ox))

        cover = jnp.where(cover == 0, 1.0, cover)
        avg = canvas / cover
        final = jnp.floor(avg * 255.0) > 127.0
        return final.astype(jnp.uint8) * 255

    return jax.jit(merge)


def merge_patches_device(
    probs,
    coords: np.ndarray,
    scene_h: int,
    scene_w: int,
    p_size: int,
    num_classes: int,
    overlap: Optional[float] = None,
    mesh=None,
    return_device: bool = False,
):
    """Device-resident patch_merge: returns the (H, W, C) uint8 {0,255} mask.

    With ``overlap`` given and ``p_size`` divisible by the grid step, the
    O(canvas) overlap-add fast path runs; otherwise the general scan.
    ``mesh`` (fast path only) shards the canvases row-wise over the 'data'
    axis for scenes larger than one chip's HBM.

    ``return_device=True`` returns the device array without the D2H fetch
    (serving pipelines that keep consuming on-device, and the bench's
    device-only leg — its contract excludes D2H).
    """
    in_size = int(probs.shape[1])
    out = None
    if overlap is not None:
        step, i_w, i_h = _grid_geometry(scene_h, scene_w, p_size, overlap)
        if p_size % step == 0 and len(probs) == 4 * i_w * i_h:
            fn = _merge_grid_jit(scene_h, scene_w, in_size, p_size, num_classes,
                                 step, i_w, i_h, mesh=mesh)
            out = fn(jnp.asarray(probs))
    if out is None:
        fn = _merge_jit(scene_h, scene_w, in_size, p_size, num_classes)
        out = fn(jnp.asarray(probs), jnp.asarray(coords, jnp.int32))
    if return_device:
        return out
    return np.asarray(jax.device_get(out))


def patch_merge(img: np.ndarray, masks, p_size: int, config: dict, p_overlap: float):
    """Reference-shaped API (api:119-217): ``masks`` is a list of (C, h, w)
    prob arrays in grid order; returns a list of C (H, W) uint8 masks."""
    coords = grid_coords(img.shape[0], img.shape[1], p_size, p_overlap)
    probs = np.stack([np.transpose(np.asarray(m), (1, 2, 0)) for m in masks])
    merged = merge_patches_device(
        probs, coords, img.shape[0], img.shape[1], p_size, config["num_classes"],
        overlap=p_overlap,
    )
    return [merged[..., c] for c in range(config["num_classes"])]
