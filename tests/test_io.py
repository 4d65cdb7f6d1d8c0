"""I/O tests: PLY round-trips, .splat round-trip, COLMAP/json transforms, masks."""

import json
import os
import struct

import numpy as np
import pytest

from gs2pc.io.colmap import (
    load_colmap_bin_data,
    load_colmap_txt_data,
    load_transform_data,
    qvec2rotmat,
)
from gs2pc.io.gaussians_io import load_gaussians
from gs2pc.io.masks import load_image_masks
from gs2pc.io.ply import load_ply_gaussians, read_xyz_ply, save_xyz_to_ply
from gs2pc.io.splat import load_splat_gaussians, save_splat
from gs2pc.io.transforms_json import load_transform_json_data
from gs2pc.ops.sh import SH_C0


def write_3dgs_ply(path, n=10, sh_degree=3, seed=0):
    """Create a minimal 3DGS-format PLY like real exporters produce."""
    r = np.random.default_rng(seed)
    n_rest = 3 * (sh_degree + 1) ** 2 - 3
    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    data = r.normal(size=(n, len(props))).astype(np.float32)
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(data.tobytes())
    return data, props


class TestPlyGaussians:
    def test_load_sh_ply(self, tmp_path):
        path = str(tmp_path / "scene.ply")
        data, props = write_3dgs_ply(path, n=16)
        xyz, log_scales, rots, colours, opacities, shs = load_ply_gaussians(path)
        assert xyz.shape == (16, 3)
        np.testing.assert_allclose(xyz, data[:, :3], atol=1e-6)
        # opacity sigmoided
        op_raw = data[:, props.index("opacity")]
        np.testing.assert_allclose(opacities, 1 / (1 + np.exp(-op_raw)), rtol=1e-5)
        # colour from deg-0 SH
        f_dc = data[:, props.index("f_dc_0"):props.index("f_dc_0") + 3]
        np.testing.assert_allclose(
            colours, np.clip(SH_C0 * f_dc + 0.5, 0, 1), atol=1e-6
        )
        # quats normalised
        np.testing.assert_allclose(np.linalg.norm(rots, axis=1), 1.0, atol=1e-5)
        assert shs.shape == (16, 3, 16)
        # f_rest ordering: feature (P, idx) reshaped to (P, 3, K-1)
        f_rest0 = data[:, props.index("f_rest_0")]
        np.testing.assert_allclose(shs[:, 0, 1], f_rest0, atol=1e-6)

    def test_load_rgb_ply(self, tmp_path):
        path = str(tmp_path / "rgb.ply")
        n = 8
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "property float opacity\n"
            "property float scale_0\nproperty float scale_1\nproperty float scale_2\n"
            "property float rot_0\nproperty float rot_1\nproperty float rot_2\nproperty float rot_3\n"
            "end_header\n"
        )
        dtype = np.dtype(
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
             ("red", "u1"), ("green", "u1"), ("blue", "u1"),
             ("opacity", "<f4"),
             ("scale_0", "<f4"), ("scale_1", "<f4"), ("scale_2", "<f4"),
             ("rot_0", "<f4"), ("rot_1", "<f4"), ("rot_2", "<f4"), ("rot_3", "<f4")]
        )
        rec = np.zeros(n, dtype)
        rec["red"] = 200
        rec["green"] = 100
        rec["rot_0"] = 1.0
        with open(path, "wb") as fh:
            fh.write(header.encode())
            fh.write(rec.tobytes())
        xyz, _, _, colours, _, shs = load_ply_gaussians(path)
        assert shs is None
        np.testing.assert_allclose(colours[:, 0], 200 / 255.0, atol=1e-6)

    def test_missing_colour_raises(self, tmp_path):
        path = str(tmp_path / "bad.ply")
        header = (
            "ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float opacity\nend_header\n"
        )
        with open(path, "wb") as fh:
            fh.write(header.encode())
            fh.write(np.zeros(4, np.float32).tobytes())
        with pytest.raises(AttributeError):
            load_ply_gaussians(path)


class TestPlyWriter:
    def test_roundtrip_with_normals(self, tmp_path, rng):
        path = str(tmp_path / "out.ply")
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (1000, 3)).astype(np.uint8)
        nrm = rng.normal(size=(1000, 3)).astype(np.float32)
        save_xyz_to_ply(pts, path, rgb_colors=cols, normals_points=nrm, chunk_size=300)
        pts2, cols2, nrm2 = read_xyz_ply(path)
        np.testing.assert_array_equal(pts, pts2)
        np.testing.assert_array_equal(cols, cols2)
        np.testing.assert_array_equal(nrm, nrm2)

    def test_golden_bytes(self, tmp_path):
        """Byte-exact layout vs the reference writer's format."""
        path = str(tmp_path / "golden.ply")
        pts = np.array([[1.0, 2.0, 3.0]], np.float32)
        cols = np.array([[10, 20, 30]], np.uint8)
        save_xyz_to_ply(pts, path, rgb_colors=cols)
        blob = open(path, "rb").read()
        expected_header = (
            b"ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        assert blob.startswith(expected_header)
        body = blob[len(expected_header):]
        assert body == struct.pack("<fffBBB", 1.0, 2.0, 3.0, 10, 20, 30)

    def test_default_white(self, tmp_path):
        path = str(tmp_path / "white.ply")
        save_xyz_to_ply(np.zeros((5, 3), np.float32), path)
        _, cols, _ = read_xyz_ply(path)
        assert (cols == 255).all()


class TestSplat:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "scene.splat")
        n = 32
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        log_scales = rng.uniform(-4, 0, (n, 3)).astype(np.float32)
        rots = rng.normal(size=(n, 4)).astype(np.float32)
        rots /= np.linalg.norm(rots, axis=1, keepdims=True)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        ops = rng.uniform(0, 1, n).astype(np.float32)
        save_splat(path, xyz, log_scales, rots, cols, ops)
        xyz2, ls2, rots2, cols2, ops2, shs = load_splat_gaussians(path)
        assert shs is None
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(ls2, log_scales, atol=1e-5)
        np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)
        np.testing.assert_allclose(ops2, ops, atol=1 / 255.0)
        # quaternions quantised to u8: |q.q2| close to 1 up to sign
        dots = np.abs(np.sum(rots2 * rots, axis=1))
        assert (dots > 0.99).all()

    def test_dispatch(self, tmp_path):
        path = str(tmp_path / "scene.splat")
        save_splat(
            path,
            np.zeros((4, 3)), np.zeros((4, 3)),
            np.tile([[1.0, 0, 0, 0]], (4, 1)),
            np.ones((4, 3)) * 0.5, np.ones(4),
        )
        g = load_gaussians(path)
        assert g.num_gaussians == 4
        with pytest.raises(AttributeError):
            load_gaussians(str(tmp_path / "scene.obj"))


def write_colmap_bin(dirpath, poses, width=64, height=48, focal=50.0):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQdddd", 1, 1, width, height, focal, focal, width / 2, height / 2))
    with open(os.path.join(dirpath, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(poses)))
        for i, (qvec, tvec) in enumerate(poses):
            fh.write(struct.pack("<idddddddi", i, *qvec, *tvec, 1))
            fh.write(f"img_{i:03d}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))


def write_colmap_txt(dirpath, poses, width=64, height=48, focal=50.0):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "cameras.txt"), "w") as fh:
        fh.write("# cameras\n")
        fh.write(f"1 PINHOLE {width} {height} {focal} {focal} {width/2} {height/2}\n")
    with open(os.path.join(dirpath, "images.txt"), "w") as fh:
        fh.write("# images\n")
        for i, (qvec, tvec) in enumerate(poses):
            q = " ".join(str(v) for v in qvec)
            t = " ".join(str(v) for v in tvec)
            fh.write(f"{i} {q} {t} 1 img_{i:03d}.png\n")
            fh.write("0.0 0.0 -1\n")


SAMPLE_POSES = [
    ((1.0, 0.0, 0.0, 0.0), (0.0, 0.0, 2.0)),
    ((0.9238795, 0.0, 0.3826834, 0.0), (0.5, 0.1, 1.8)),
    ((0.7071068, 0.7071068, 0.0, 0.0), (-0.5, 0.2, 2.2)),
    ((1.0, 0.0, 0.0, 0.0), (0.1, -0.3, 2.5)),
]


class TestColmap:
    def test_bin_txt_agree(self, tmp_path):
        bdir = str(tmp_path / "bin")
        tdir = str(tmp_path / "txt")
        write_colmap_bin(bdir, SAMPLE_POSES)
        write_colmap_txt(tdir, SAMPLE_POSES)
        tb, cb = load_colmap_bin_data(bdir)
        tt, ct = load_colmap_txt_data(tdir)
        assert set(tb) == set(tt) == {f"img_{i:03d}" for i in range(4)}
        for k in tb:
            np.testing.assert_allclose(tb[k], tt[k], atol=1e-6)
            assert int(cb[k][0]) == int(float(ct[k][0]))

    def test_c2w_properties(self, tmp_path):
        bdir = str(tmp_path / "bin")
        write_colmap_bin(bdir, SAMPLE_POSES)
        transforms, _ = load_colmap_bin_data(bdir)
        for mat in transforms.values():
            m = np.asarray(mat)
            R = m[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)

    def test_skip_rate(self, tmp_path):
        bdir = str(tmp_path / "bin")
        write_colmap_bin(bdir, SAMPLE_POSES)
        transforms, _ = load_colmap_bin_data(bdir, skip_rate=1)
        assert len(transforms) == 2

    def test_dispatch_sparse0(self, tmp_path):
        root = str(tmp_path / "scene")
        write_colmap_bin(os.path.join(root, "sparse", "0"), SAMPLE_POSES)
        transforms, intr = load_transform_data(root)
        assert len(transforms) == 4

    def test_dispatch_unsupported(self, tmp_path):
        with pytest.raises(AttributeError):
            load_transform_data(str(tmp_path / "nope.txt"))

    def test_qvec_identity(self):
        np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3), atol=1e-12)


class TestTransformsJson:
    def test_global_intrinsics(self, tmp_path):
        path = str(tmp_path / "transforms.json")
        frames = [
            {"file_path": f"images/f_{i}.png", "transform_matrix": np.eye(4).tolist()}
            for i in range(3)
        ]
        json.dump(
            {"w": 100, "h": 80, "camera_angle_x": 0.8, "frames": frames},
            open(path, "w"),
        )
        transforms, intr = load_transform_json_data(path)
        assert len(transforms) == 3
        w, h, fx, fy = intr["f_0"]
        assert (w, h) == (100, 80)
        np.testing.assert_allclose(fx, 0.5 * 100 / np.tan(0.4), rtol=1e-6)
        assert fy == fx

    def test_per_frame_intrinsics_and_skip(self, tmp_path):
        path = str(tmp_path / "transforms.json")
        frames = [
            {
                "file_path": f"f_{i}.png",
                "transform_matrix": np.eye(4).tolist(),
                "w": 10 + i, "h": 20, "fl_x": 5.0, "fl_y": 6.0,
            }
            for i in range(4)
        ]
        json.dump({"frames": frames}, open(path, "w"))
        transforms, intr = load_transform_json_data(path, skip_rate=1)
        assert len(transforms) == 2
        assert intr["f_1"][0] == 11


class TestMasks:
    def test_load_masks(self, tmp_path):
        from PIL import Image

        d = str(tmp_path / "masks")
        os.makedirs(d)
        arr = np.zeros((8, 10), np.uint8)
        arr[:4] = 255
        Image.fromarray(arr).save(os.path.join(d, "img_000.png"))
        open(os.path.join(d, "not_an_image.txt"), "w").write("x")
        masks = load_image_masks(d)
        assert list(masks) == ["img_000"]
        assert masks["img_000"].shape == (8, 10)
        assert masks["img_000"][0, 0] == 255 and masks["img_000"][7, 0] == 0
