"""Semantic end-to-end validation: rendered colours land on the right points.

Two walls of small Gaussians (red at x<0, green at x>0) are converted with
rendered colours; sampled points on each wall must come back with that
wall's colour.  This catches camera-convention / colour-assignment sign
errors that renderer-vs-oracle parity cannot (both would be wrong together).
"""

import json

import numpy as np
import pytest

from gs2pc.io.splat import save_splat
from gs2pc.pipeline import convert_3dgs_to_pc
from tests.test_pipeline import small_settings
from tests.test_render import look_at_camera


@pytest.fixture
def wall_scene(tmp_path):
    r = np.random.default_rng(3)
    pts = []
    cols = []
    for sx, colour in ((-1.0, [1.0, 0.05, 0.05]), (1.0, [0.05, 1.0, 0.05])):
        n = 400
        wall = np.stack(
            [
                np.full(n, sx * 0.8) + r.normal(scale=0.01, size=n),
                r.uniform(-0.6, 0.6, n),
                r.uniform(-0.6, 0.6, n),
            ],
            axis=1,
        )
        pts.append(wall)
        cols.append(np.tile(colour, (n, 1)))
    xyz = np.concatenate(pts).astype(np.float32)
    colours = np.concatenate(cols).astype(np.float32)
    n = len(xyz)
    quats = np.tile([[1.0, 0, 0, 0]], (n, 1)).astype(np.float32)
    log_scales = np.full((n, 3), -2.7, np.float32)
    opacities = np.full(n, 0.95, np.float32)

    splat = str(tmp_path / "walls.splat")
    save_splat(splat, xyz, log_scales, quats, colours, opacities)

    frames = []
    for i, ang in enumerate([0.0, 0.5, -0.5]):
        c2w, _ = look_at_camera(angle=ang, width=96, height=96, focal=110.0)
        frames.append({
            "file_path": f"c{i}.png", "transform_matrix": c2w.tolist(),
            "w": 96, "h": 96, "fl_x": 110.0,
        })
    tpath = str(tmp_path / "transforms.json")
    json.dump({"frames": frames}, open(tpath, "w"))
    return splat, tpath


def test_wall_colours_assigned_correctly(wall_scene):
    splat, tpath = wall_scene
    total, _ = convert_3dgs_to_pc(
        splat, tpath, None, small_settings(num_points=20000)
    )
    pts, cols = total.points, total.colours  # cols in 0-255

    left = pts[:, 0] < -0.3
    right = pts[:, 0] > 0.3
    assert left.sum() > 1000 and right.sum() > 1000

    # red wall: R channel dominates; green wall: G dominates
    left_red = (cols[left, 0] > cols[left, 1] + 30).mean()
    right_green = (cols[right, 1] > cols[right, 0] + 30).mean()
    assert left_red > 0.8, f"left wall not red: {left_red}"
    assert right_green > 0.8, f"right wall not green: {right_green}"

    # and rendered colours should be close to the source colours
    assert cols[left, 0].mean() > 180
    assert cols[right, 1].mean() > 180
