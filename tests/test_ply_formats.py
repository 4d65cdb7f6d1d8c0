"""PLY codec robustness: ascii, big-endian, property ordering."""

import numpy as np

from gs2pc.io.ply import load_ply_gaussians, read_ply


def test_ascii_ply(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\ncomment test\n"
            "element vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "property float opacity\n"
            "property float scale_0\nproperty float scale_1\nproperty float scale_2\n"
            "property float rot_0\nproperty float rot_1\nproperty float rot_2\nproperty float rot_3\n"
            "end_header\n"
            "1.0 2.0 3.0 255 0 0 0.5 -1 -1 -1 1 0 0 0\n"
            "4.0 5.0 6.0 0 255 0 -0.5 -2 -2 -2 0 1 0 0\n"
        )
    xyz, log_scales, rots, colours, opacities, shs = load_ply_gaussians(path)
    np.testing.assert_allclose(xyz, [[1, 2, 3], [4, 5, 6]], atol=1e-6)
    np.testing.assert_allclose(colours[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(opacities, 1 / (1 + np.exp([-0.5, 0.5])), rtol=1e-6)
    np.testing.assert_allclose(log_scales[1], [-2, -2, -2], atol=1e-6)


def test_big_endian_ply(tmp_path):
    path = str(tmp_path / "be.ply")
    header = (
        "ply\nformat binary_big_endian 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
    )
    data = np.array([[1, 2, 3], [4, 5, 6]], ">f4")
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(data.tobytes())
    elements = read_ply(path)
    v = elements["vertex"]
    np.testing.assert_allclose(np.asarray(v["x"]), [1, 4])
    np.testing.assert_allclose(np.asarray(v["z"]), [3, 6])


def test_unsorted_f_rest_names(tmp_path):
    """f_rest_10 must sort numerically after f_rest_2 (reference asserts
    sorted-by-int order, gauss_dataloader.py:36)."""
    path = str(tmp_path / "rest.ply")
    n_rest = 45  # degree 3
    props = (
        ["x", "y", "z", "opacity"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    vals = np.zeros(len(props), np.float32)
    # mark f_rest_10 distinctly; if string-sorted it would land elsewhere
    vals[props.index("f_rest_10")] = 7.5
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(vals.tobytes())
    _, _, _, _, _, shs = load_ply_gaussians(path)
    # shs layout (P, 3, K): f_rest index 10 -> channel 0, coeff 11
    assert abs(float(shs[0, 0, 11]) - 7.5) < 1e-6
