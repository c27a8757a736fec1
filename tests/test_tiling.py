"""Tiling tests: grid/patch parity vs the reference patch_gen, merge
behaviour vs a reference-faithful numpy oracle, mask_convert semantics."""

import numpy as np
import pytest

from ssunet_gan_tpu.data.tiling import (
    extract_patches,
    grid_coords,
    mask_convert,
    merge_patches_device,
    patch_gen,
    patch_merge,
    post_process_resized_mask,
)
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("shape,p,ov", [((96, 128), 32, 0.5), ((70, 70), 32, 0.5),
                                        ((64, 64), 32, 0.75), ((100, 90), 32, 0.25)])
def test_patch_gen_matches_reference(reference_path, rng, shape, p, ov):
    import dataset as ref_dataset

    img = rng.integers(0, 255, (*shape, 3), np.uint8)
    mask = rng.integers(0, 255, (*shape, 3), np.uint8)
    ref_imgs, ref_masks = ref_dataset.patch_gen(img, mask, p, ov)
    our_imgs, our_masks = patch_gen(img, mask, p, ov)
    assert len(ref_imgs) == len(our_imgs)
    for a, b in zip(ref_imgs, our_imgs):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(ref_masks, our_masks):
        np.testing.assert_array_equal(a, b)


def _numpy_merge_oracle(scene_hw, probs, coords, p_size, num_classes):
    """Reference patch_merge (api:119-217) restricted to in_size == p_size
    (identity resize): quantize→binarize>127→sum/coverage→avg→binarize."""
    h, w = scene_hw
    out = np.zeros((h, w, num_classes), np.uint8)
    for c in range(num_classes):
        merged = np.zeros((h, w))
        div = np.zeros((h, w))
        for k, (y, x) in enumerate(coords):
            m = (probs[k][..., c] * 255).astype(np.uint8)
            m = post_process_resized_mask(m) / 255.0
            merged[y : y + p_size, x : x + p_size] += m
            div[y : y + p_size, x : x + p_size] += 1.0
        div[div == 0] = 1.0
        full = ((merged / div) * 255).astype(np.uint8)
        out[..., c] = post_process_resized_mask(full)
    return out


def test_merge_matches_oracle_identity_resize(rng):
    h, w, p, C = 64, 96, 32, 3
    coords = grid_coords(h, w, p, 0.5)
    probs = rng.random((len(coords), p, p, C)).astype(np.float32)
    ours = merge_patches_device(probs, coords, h, w, p, C)
    oracle = _numpy_merge_oracle((h, w), probs, coords, p, C)
    np.testing.assert_array_equal(ours, oracle)


def test_merge_with_upscale_close_to_cv2(rng):
    """in_size 16 → p_size 32 exercises the device resize path; compare to a
    cv2-based oracle allowing rare threshold-edge flips."""
    import cv2

    h, w, p, in_size, C = 64, 64, 32, 16, 2
    coords = grid_coords(h, w, p, 0.5)
    probs = rng.random((len(coords), in_size, in_size, C)).astype(np.float32)
    ours = merge_patches_device(probs, coords, h, w, p, C)

    out = np.zeros((h, w, C), np.uint8)
    for c in range(C):
        merged = np.zeros((h, w))
        div = np.zeros((h, w))
        for k, (y, x) in enumerate(coords):
            m = (probs[k][..., c] * 255).astype(np.uint8)
            m = cv2.resize(m, (p, p))
            m = post_process_resized_mask(m) / 255.0
            merged[y : y + p, x : x + p] += m
            div[y : y + p, x : x + p] += 1.0
        div[div == 0] = 1.0
        full = ((merged / div) * 255).astype(np.uint8)
        out[..., c] = post_process_resized_mask(full)

    diff = (ours != out).mean()
    assert diff < 0.02, f"{diff:.4f} of pixels differ from cv2 oracle"


def test_coverage_complete(rng):
    """Every scene pixel is covered by at least one patch (the reason for
    the 4-pass grid)."""
    for h, w in [(70, 70), (100, 130), (64, 100)]:
        coords = grid_coords(h, w, 32, 0.5)
        cover = np.zeros((h, w))
        for y, x in coords:
            cover[y : y + 32, x : x + 32] += 1
        assert (cover > 0).all()


def test_patch_merge_reference_shaped_api(rng):
    h, w, p, C = 64, 64, 32, 2
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    coords = grid_coords(h, w, p, 0.5)
    masks = [rng.random((C, p, p)).astype(np.float32) for _ in range(len(coords))]
    out = patch_merge(img, masks, p, {"num_classes": C}, 0.5)
    assert len(out) == C
    assert out[0].shape == (h, w)
    assert set(np.unique(out[0])) <= {0, 255}


def test_mask_convert_colors():
    p = np.zeros((4, 4, 3), np.uint8)
    p[0, 0] = (255, 255, 255)  # class 0 (BGR white)
    p[1, 1] = (255, 0, 0)      # class 1 (BGR blue-channel 255)
    p[2, 2] = (0, 0, 255)      # class 2 (red)
    m0 = mask_convert(p, 0, 4)
    m1 = mask_convert(p, 1, 4)
    m2 = mask_convert(p, 2, 4)
    assert m0[0, 0] == 255 and m0[1, 1] == 0
    assert m1[1, 1] == 255 and m1[0, 0] == 0
    assert m2[2, 2] == 255 and m2[1, 1] == 0


def test_grid_coords_rejects_small_scene():
    with pytest.raises(ValueError):
        grid_coords(16, 16, 32, 0.5)


def test_sharded_tile_inference_matches_single_device(rng):
    """segmentation_inference with a mesh shards the tile grid over the
    'data' axis and produces the same masks as the unsharded path."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ssunet_gan_tpu.infer.api import segmentation_inference
    from ssunet_gan_tpu.ops.conv import Conv2d
    from ssunet_gan_tpu.parallel import make_mesh

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return Conv2d(2, 3, padding=1, name="c")(x)

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    config = {"patch_size": 64, "input_w": 32, "input_h": 32,
              "patch_overlap": 0.5, "num_classes": 2, "deep_supervision": False}
    img_input = rng.integers(0, 255, (128, 160, 3), np.uint8)
    from ssunet_gan_tpu.data.tiling import grid_coords as gc, extract_patches as ep
    coords = gc(128, 160, 64, 0.5)
    patch_set = ep(img_input, coords, 64).astype(np.float32)[:, ::2, ::2] / 255.0

    single, _ = segmentation_inference(
        model, variables, img_input, patch_set, patch_set, config, False
    )
    mesh = make_mesh()
    sharded, _ = segmentation_inference(
        model, variables, img_input, patch_set, patch_set, config, False, mesh=mesh
    )
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sharded_inference_fused_kernels_match_unfused(rng):
    """The mesh path runs the forward under shard_map because the fused
    Pallas stage kernels have no SPMD partitioning rule (r2 ADVICE): with
    fused stages + stacked seg dots ON, the 8-device sharded flagship
    forward must match the single-device unfused one (each device traces
    the interpret-mode kernel on its local shard)."""
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.infer.api import _chunked_forward
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.ops.stage_kernel import set_fused_stage, set_seg_stack
    from ssunet_gan_tpu.parallel import make_mesh
    from ssunet_gan_tpu.utils import jit_init

    model = build_model("UNet_R_SS_v2", num_classes=2, input_channels=3)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x0, train=False)
    patches = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)

    want = _chunked_forward(model, variables, patches, False)
    set_fused_stage(True)
    set_seg_stack(True)
    try:
        got = _chunked_forward(model, variables, patches, False,
                               mesh=make_mesh())
    finally:
        set_fused_stage(None)
        set_seg_stack(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("hw,p,ov", [((64, 96), 32, 0.5), ((70, 70), 32, 0.5),
                                     ((128, 100), 32, 0.75), ((96, 96), 32, 0.5)])
def test_grid_merge_fast_path_matches_scan(rng, hw, p, ov):
    """The O(canvas) overlap-add merge equals the general scan merge."""
    h, w = hw
    coords = grid_coords(h, w, p, ov)
    probs = rng.random((len(coords), p // 2, p // 2, 2)).astype(np.float32)
    scan = merge_patches_device(probs, coords, h, w, p, 2)           # scan path
    fast = merge_patches_device(probs, coords, h, w, p, 2, overlap=ov)  # fast path
    np.testing.assert_array_equal(scan, fast)


def test_forward_cache_reused_across_scenes(rng):
    """Repeat calls with the same (model, variables) must reuse one jitted
    forward + device variables — no per-scene recompilation (VERDICT r1 #4)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ssunet_gan_tpu.infer import api as infer_api
    from ssunet_gan_tpu.ops.conv import Conv2d

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return Conv2d(2, 3, padding=1, name="c")(x)

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), False)

    f1, v1 = infer_api._get_forward(model, variables, None)
    f2, v2 = infer_api._get_forward(model, variables, None)
    assert f1 is f2 and v1 is v2

    # and the cached pair actually drives _chunked_forward for many "scenes"
    patches = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    out1 = infer_api._chunked_forward(model, variables, patches, False)
    out2 = infer_api._chunked_forward(model, variables, patches, False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert len(infer_api._FORWARD_CACHE) >= 1


def test_uint8_device_normalize_matches_host_path(rng):
    """The uint8-transfer fast path (device-fused Normalize + /255) must
    reproduce the host-normalized float32 pipeline."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ssunet_gan_tpu.infer import api as infer_api
    from ssunet_gan_tpu.ops.conv import Conv2d

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return Conv2d(2, 3, padding=1, name="c")(x)

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), False)

    scene = rng.integers(0, 255, (64, 64, 3), np.uint8)
    config = {"patch_size": 32, "input_h": 16, "input_w": 16,
              "patch_overlap": 0.5, "num_classes": 2, "deep_supervision": False}

    host, _ = infer_api.patch_and_preprocess(scene, scene, config)
    raw, _ = infer_api.patch_and_preprocess(scene, scene, config, raw_uint8=True)
    assert host.dtype == np.float32 and raw.dtype == np.uint8

    out_host = infer_api._chunked_forward(model, variables, host, False)
    out_raw = infer_api._chunked_forward(model, variables, raw, False)
    np.testing.assert_allclose(
        np.asarray(out_host), np.asarray(out_raw), rtol=1e-5, atol=1e-6
    )


def test_raw_uint8_non_square_input(rng):
    """raw_uint8 tiles must land exactly on an (input_h, input_w) buffer for
    rectangular model inputs (round-2 advisor finding: the fast path once
    resized to (input_w, input_w) and broadcast-crashed; the host float path
    mirrors the reference's square-first resize, api:361, then fixes the
    aspect, so only shape — not values — can be asserted across the two)."""
    from ssunet_gan_tpu.infer import api as infer_api

    scene = rng.integers(0, 255, (96, 64, 3), np.uint8)
    config = {"patch_size": 32, "input_h": 24, "input_w": 16,
              "patch_overlap": 0.5, "num_classes": 2, "deep_supervision": False}

    raw, _ = infer_api.patch_and_preprocess(scene, scene, config, raw_uint8=True)
    assert raw.dtype == np.uint8
    assert raw.shape[1:] == (24, 16, 3)

    # the pure-python cv2 fallback (native tile server unavailable) must
    # land on the same rectangular buffer
    from unittest import mock

    from ssunet_gan_tpu import native

    with mock.patch.object(native, "extract_resize_u8", return_value=None):
        raw_py, _ = infer_api.patch_and_preprocess(
            scene, scene, config, raw_uint8=True
        )
    assert raw_py.shape == raw.shape and raw_py.dtype == np.uint8

    host, _ = infer_api.patch_and_preprocess(scene, scene, config)
    assert host.dtype == np.float32
    assert host.shape == (raw.shape[0], 24, 16, 3)


def test_pipelined_scene_forward_matches_plain_path(rng):
    """The overlapped prep/H2D/compute pipeline must produce the same probs
    as patch_and_preprocess(raw_uint8) -> _chunked_forward."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ssunet_gan_tpu.infer.api import (
        _chunked_forward,
        patch_and_preprocess,
        pipelined_scene_forward,
    )
    from ssunet_gan_tpu.ops.conv import Conv2d

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return Conv2d(2, 3, padding=1, name="c")(x)

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    config = {"patch_size": 64, "input_w": 32, "input_h": 32,
              "patch_overlap": 0.5, "num_classes": 2, "deep_supervision": False}
    scene = rng.integers(0, 255, (128, 160, 3), np.uint8)

    patches, _ = patch_and_preprocess(scene, scene, config, raw_uint8=True)
    want = np.asarray(_chunked_forward(model, variables, patches, False))
    got, coords, p_size = pipelined_scene_forward(model, variables, scene, config)
    assert p_size == 64 and len(coords) == len(want)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_sharded_merge_canvas_matches_unsharded(rng):
    """Fast-path merge with row-sharded canvases (mesh) must be bit-equal
    to the single-device merge — the >16k^2-scene scale-out path where the
    canvases exceed one chip's HBM (sharding correctness is what's under
    test; the 8-device CPU mesh stands in for the real slice)."""
    from ssunet_gan_tpu.data.tiling import merge_patches_device
    from ssunet_gan_tpu.parallel import make_mesh

    hw, p, ov = 512, 64, 0.5
    coords = grid_coords(hw, hw, p, ov)
    probs = rng.random((len(coords), 32, 32, 2)).astype(np.float32)

    want = merge_patches_device(probs, coords, hw, hw, p, 2, overlap=ov)
    mesh = make_mesh()
    got = merge_patches_device(probs, coords, hw, hw, p, 2, overlap=ov,
                               mesh=mesh)
    np.testing.assert_array_equal(got, want)


def test_merge_accepts_prequantized_uint8_probs(rng):
    """r5: the forward can emit floor(sigmoid·255) uint8 (infer/api
    quantize_probs) — the merge's own first step, so merging the uint8
    tensor must be bit-equal to merging the f32 probabilities."""
    from ssunet_gan_tpu.data.tiling import merge_patches_device

    hw, p, ov = 256, 64, 0.5
    coords = grid_coords(hw, hw, p, ov)
    probs = rng.random((len(coords), 32, 32, 3)).astype(np.float32)
    q8 = np.floor(probs * 255.0).astype(np.uint8)

    want = merge_patches_device(probs, coords, hw, hw, p, 3, overlap=ov)
    got = merge_patches_device(q8, coords, hw, hw, p, 3, overlap=ov)
    np.testing.assert_array_equal(got, want)
    # the general scan path too
    want_s = merge_patches_device(probs, coords, hw, hw, p, 3)
    got_s = merge_patches_device(q8, coords, hw, hw, p, 3)
    np.testing.assert_array_equal(got_s, want_s)
    # return_device keeps the result on device, values unchanged
    dev = merge_patches_device(q8, coords, hw, hw, p, 3, overlap=ov,
                               return_device=True)
    assert not isinstance(dev, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev), want)


def test_forward_quantize_probs_matches_merge_quantization(rng):
    """infer/api._get_forward(quantize_probs=True) emits exactly
    floor(sigmoid·255) as uint8 (and the dtype cast hook works)."""
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.infer.api import _get_forward
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.utils import jit_init

    model = build_model("UNet", num_classes=2, input_channels=3)
    x8 = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), sample, train=False)

    fwd, dv = _get_forward(model, variables, None, normalize=True)
    fwd8, dv8 = _get_forward(model, variables, None, normalize=True,
                             quantize_probs=True)
    p = np.asarray(fwd(dv, jnp.asarray(x8)), np.float32)
    q = np.asarray(fwd8(dv8, jnp.asarray(x8)))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q, np.floor(p * 255.0).astype(np.uint8))
