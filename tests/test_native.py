"""Native C++ frame codec vs the numpy reference path."""

import os

import numpy as np
import pytest

from sphfluidsimulation_tpu.native.build import (
    load_framecodec,
    splat_points_native,
    write_ply_native,
)

pytestmark = pytest.mark.skipif(load_framecodec() is None,
                                reason="native toolchain unavailable")


def test_splat_draws_discs():
    img = np.zeros((64, 64, 3), np.uint8)
    xy = np.array([[32.0, 32.0], [5.0, 5.0]], np.float32)
    z = np.array([1.0, 2.0], np.float32)
    r = np.array([4.0, 2.0], np.float32)
    rgb = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    drawn = splat_points_native(xy, z, r, rgb, img)
    assert drawn == 2
    assert tuple(img[32, 32]) == (255, 0, 0)
    assert tuple(img[5, 5]) == (0, 0, 255)
    assert tuple(img[0, 63]) == (0, 0, 0)


def test_painters_order_near_wins():
    img = np.zeros((16, 16, 3), np.uint8)
    xy = np.array([[8.0, 8.0], [8.0, 8.0]], np.float32)
    z = np.array([1.0, 3.0], np.float32)     # first is nearer
    r = np.array([2.0, 2.0], np.float32)
    rgb = np.array([[10, 20, 30], [200, 200, 200]], np.uint8)
    splat_points_native(xy, z, r, rgb, img)
    assert tuple(img[8, 8]) == (10, 20, 30)


def _numpy_render(pos, col):
    """render_frame_png with both native rasterizers disabled."""
    from sphfluidsimulation_tpu.render.export import render_frame_png

    import sphfluidsimulation_tpu.native.build as nb
    orig = nb.splat_points_native, nb.splat_points_alpha_native
    try:
        nb.splat_points_native = lambda *a, **k: None
        nb.splat_points_alpha_native = lambda *a, **k: None
        return render_frame_png(pos, col)
    finally:
        nb.splat_points_native, nb.splat_points_alpha_native = orig


@pytest.mark.parametrize("translucent", [False, True])
def test_native_matches_numpy_render(translucent):
    from sphfluidsimulation_tpu.render.export import render_frame_png

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (500, 4)).astype(np.float32)
    if not translucent:
        col[:, 3] = 1.0
    native_img = render_frame_png(pos, col)  # takes the native path
    numpy_img = _numpy_render(pos, col)
    # identical pixel sets up to disc-edge rasterization differences:
    # demand >= 97% identical pixels and identical background
    same = (native_img == numpy_img).all(axis=-1).mean()
    assert same > 0.97


def test_translucent_compositing_sequential():
    """SrcAlpha src-over in depth order (InstancedIndirectColor.shader:6-7):
    two coincident half-alpha discs must blend far-then-near, and the
    native and numpy compositors must agree exactly on the stack."""
    from sphfluidsimulation_tpu.native.build import splat_points_alpha_native

    xy = np.array([[8.0, 8.0], [8.0, 8.0]], np.float32)
    z = np.array([1.0, 3.0], np.float32)          # first is NEARER
    r = np.array([3.0, 3.0], np.float32)
    rgb = np.array([[200, 0, 0], [0, 200, 0]], np.uint8)
    alpha = np.array([0.5, 0.5], np.float32)
    img = np.zeros((16, 16, 3), np.uint8)
    splat_points_alpha_native(xy, z, r, rgb, alpha, img)
    # far green over black -> (0, 100, 0); near red over that ->
    # (100, 50, 0)
    assert tuple(img[8, 8]) == (100, 50, 0)


def test_binary_ply(tmp_path):
    pos = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    path = os.path.join(tmp_path, "pts.ply")
    assert write_ply_native(path, pos, rgb)
    data = open(path, "rb").read()
    assert data.startswith(b"ply\nformat binary_little_endian 1.0")
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    body = data[header_end:]
    assert len(body) == 2 * (12 + 3)
    got = np.frombuffer(body[:12], np.float32)
    np.testing.assert_array_equal(got, pos[0])
