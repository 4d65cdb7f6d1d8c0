"""Native C++ PLY writer: byte parity with the numpy path."""

import os

import numpy as np
import pytest

import gs2pc.io.ply as plymod
from gs2pc.io.ply import read_xyz_ply, save_xyz_to_ply
from gs2pc.native import load as load_native


@pytest.fixture(scope="module")
def native_lib():
    lib = load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativePly:
    def test_byte_parity(self, tmp_path, rng, native_lib, monkeypatch):
        n = 10_000
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        nrm = rng.normal(size=(n, 3)).astype(np.float32)

        p_native = str(tmp_path / "native.ply")
        p_numpy = str(tmp_path / "numpy.ply")
        save_xyz_to_ply(pts, p_native, rgb_colors=cols, normals_points=nrm)
        monkeypatch.setattr(plymod, "_native_write", lambda *a: False)
        save_xyz_to_ply(pts, p_numpy, rgb_colors=cols, normals_points=nrm)

        assert open(p_native, "rb").read() == open(p_numpy, "rb").read()

    def test_no_normals_roundtrip(self, tmp_path, rng, native_lib):
        n = 5000
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        path = str(tmp_path / "x.ply")
        save_xyz_to_ply(pts, path, rgb_colors=cols)
        pts2, cols2, nrm2 = read_xyz_ply(path)
        np.testing.assert_array_equal(pts, pts2)
        np.testing.assert_array_equal(cols, cols2)
        assert nrm2 is None

    def test_colour_clipping(self, tmp_path, native_lib):
        pts = np.zeros((2, 3), np.float32)
        cols = np.array([[300.0, -5.0, 128.0], [0.0, 255.0, 256.0]])
        path = str(tmp_path / "c.ply")
        save_xyz_to_ply(pts, path, rgb_colors=cols)
        _, cols2, _ = read_xyz_ply(path)
        np.testing.assert_array_equal(cols2, [[255, 0, 128], [0, 255, 255]])

    def test_deinterleave(self, rng, native_lib):
        import ctypes

        n, k = 1000, 7
        data = rng.normal(size=(n, k)).astype(np.float32)
        body = data.tobytes()
        out = np.zeros((k, n), np.float32)
        rc = native_lib.gs2pc_deinterleave_f32(
            body, n, k, out.ctypes.data_as(ctypes.c_void_p)
        )
        assert rc == 0
        np.testing.assert_array_equal(out, data.T)
