"""Resize tests: MATLAB bicubic properties + interior match vs torch
antialiased bicubic; dynamic resample vs torch F.interpolate per mode."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from real_esrgan_tpu.ops.resize import (
    METHOD_AREA, METHOD_BICUBIC, METHOD_BILINEAR, make_matlab_resize_matrix,
    matlab_resize, resize_dynamic, upsample_nearest_2x,
)

RNG = np.random.default_rng(1)


def test_matlab_matrix_rows_sum_to_one():
    for in_len, out_len, scale in [(100, 25, 0.25), (64, 16, 0.25), (32, 128, 4.0),
                                   (100, 50, 0.5), (17, 9, 9 / 17)]:
        m = make_matlab_resize_matrix(in_len, out_len, scale)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_matlab_resize_preserves_constant():
    img = np.full((40, 40, 3), 0.37, np.float32)
    out = np.array(matlab_resize(jnp.asarray(img), 0.25))
    assert out.shape == (10, 10, 3)
    np.testing.assert_allclose(out, 0.37, atol=1e-5)


def test_matlab_resize_interior_matches_torch_antialias():
    """torch's antialiased bicubic implements the same Keys a=-0.5 kernel with
    the same antialias scaling; only border handling differs (replicate vs
    symmetric), so interior pixels must agree closely."""
    img = RNG.random((64, 64, 3)).astype(np.float32)
    ours = np.array(matlab_resize(jnp.asarray(img), 0.25))
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    theirs = F.interpolate(t, scale_factor=0.25, mode="bicubic",
                           antialias=True)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=2e-3)


def test_matlab_resize_upscale_matches_torch_bicubic_interior():
    img = RNG.random((16, 16, 1)).astype(np.float32)
    ours = np.array(matlab_resize(jnp.asarray(img), 2.0))
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    # no antialias on upscale; MATLAB cubic == Keys a=-0.5, torch uses a=-0.75
    # -> only check shape & range here, exact kernel differs by design.
    assert ours.shape == (32, 32, 1)
    assert np.isfinite(ours).all()


def _torch_resize(img_hwc, out_h, out_w, mode):
    t = torch.from_numpy(img_hwc.transpose(2, 0, 1))[None]
    if mode == "area":
        r = F.interpolate(t, size=(out_h, out_w), mode="area")
    else:
        r = F.interpolate(t, size=(out_h, out_w), mode=mode)
    return r[0].numpy().transpose(1, 2, 0)


def test_dynamic_resize_matches_torch_all_modes():
    img = RNG.random((48, 48, 3)).astype(np.float32)
    canvas = np.pad(img, ((0, 16), (0, 16), (0, 0)), mode="edge")  # 64x64 canvas
    for (oh, ow) in [(20, 20), (33, 17), (60, 60), (64, 48)]:
        for mode, idx in [("area", METHOD_AREA), ("bilinear", METHOD_BILINEAR),
                          ("bicubic", METHOD_BICUBIC)]:
            out = np.array(resize_dynamic(
                jnp.asarray(canvas),
                (jnp.int32(48), jnp.int32(48)),
                (jnp.int32(oh), jnp.int32(ow)),
                (64, 64), jnp.int32(idx)))
            exp = _torch_resize(img, oh, ow, mode)
            np.testing.assert_allclose(out[:oh, :ow], exp, atol=3e-5,
                                       err_msg=f"{mode} {oh}x{ow}")


def test_dynamic_resize_upscale_bilinear():
    img = RNG.random((16, 16, 3)).astype(np.float32)
    canvas = np.pad(img, ((0, 48), (0, 48), (0, 0)), mode="edge")
    out = np.array(resize_dynamic(
        jnp.asarray(canvas), (jnp.int32(16), jnp.int32(16)),
        (jnp.int32(40), jnp.int32(40)), (64, 64), jnp.int32(METHOD_BILINEAR)))
    exp = _torch_resize(img, 40, 40, "bilinear")
    np.testing.assert_allclose(out[:40, :40], exp, atol=3e-5)


def test_upsample_nearest():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 2, 2)
    y = np.array(upsample_nearest_2x(x))
    assert y.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(y[0, :2, :2, 0], np.array(x)[0, 0, 0, 0])


def test_area_resize_edge_fills_beyond_extent():
    """Canvas rows/cols past the valid output extent must replicate edge
    values, not zeros (regression: blur after an area resize blended zeros
    into the valid region's border)."""
    from real_esrgan_tpu.ops.resize import resize_dynamic_static_method

    img = np.full((32, 32, 3), 0.7, np.float32)
    canvas = np.pad(img, ((0, 32), (0, 32), (0, 0)), mode="edge")
    out = np.array(resize_dynamic_static_method(
        jnp.asarray(canvas), (jnp.int32(32), jnp.int32(32)),
        (jnp.int32(16), jnp.int32(16)), (64, 64), method=0))
    np.testing.assert_allclose(out[:16, :16], 0.7, atol=1e-6)  # valid region
    assert out.min() > 0.5, "garbage region must hold edge values, not zeros"
