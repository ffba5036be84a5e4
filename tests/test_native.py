"""Native C++ IO runtime tests (skipped when the library isn't built)."""

import numpy as np
import pytest

from pointcloud_render_tpu.io import loaders, native, ply

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

RNG = np.random.default_rng(2)


def test_binary_ply_matches_python(tmp_path):
    pos = RNG.normal(size=(5000, 3)).astype(np.float32)
    vel = RNG.normal(size=(5000, 3)).astype(np.float32)
    path = str(tmp_path / "c.ply")
    ply.write_ply(path, pos, velocities=vel)
    got = native.read_ply_array(path)
    expect = np.column_stack([pos, vel])
    np.testing.assert_array_equal(got, expect)


def test_normals_fallback_and_positions_only(tmp_path):
    pos = RNG.normal(size=(100, 3)).astype(np.float32)
    nrm = RNG.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "n.ply")
    ply.write_ply(path, pos, normals=nrm)
    got = native.read_ply_array(path)
    np.testing.assert_array_equal(got[:, 3:], nrm)
    only = native.read_ply_array(path, positions_only=True)
    assert only.shape == (100, 3)


def test_ascii_ply(tmp_path):
    pos = RNG.normal(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "a.ply")
    ply.write_ply(path, pos, binary=False)
    got = native.read_ply_array(path)
    np.testing.assert_allclose(got, pos, atol=1e-5)


def test_png_roundtrip(tmp_path):
    from PIL import Image

    img = (RNG.uniform(size=(32, 64, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "x.png")
    assert native.write_png(path, img)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)


def test_loader_dispatch_uses_native(tmp_path):
    pos = RNG.normal(size=(64, 3)).astype(np.float32)
    path = str(tmp_path / "d.ply")
    ply.write_ply(path, pos)
    got = loaders.load_point_cloud(path)
    np.testing.assert_array_equal(np.asarray(got, np.float32), pos)


def test_corrupt_file_fails_cleanly(tmp_path):
    path = str(tmp_path / "bad.ply")
    open(path, "wb").write(b"not a ply at all")
    with pytest.raises(IOError):
        native.read_ply_array(path)
