"""Realistic trained-3DGS-style fixture scene + capture writers.

No real MipNeRF360 data ships in this environment (zero egress), so this
module procedurally builds the next-best thing: a scene with the
*statistics* of a trained 3DGS export — anisotropic floor/wall splats,
dense detail-splat objects, low-opacity filler, and a handful of
sky/background splats covering hundreds of tiles — and writes it through
every input format the pipeline supports:

  * 3DGS .ply with full degree-3 SH (f_dc + 45 f_rest), logit opacities,
    log scales, quaternions — the exact field layout trained exports use
    (parity: gauss_dataloader.py:16-82);
  * a COLMAP binary sparse dir (cameras.bin + images.bin, PINHOLE) whose
    qvec/tvec round-trip through the loader's pose convention
    (transform_dataloader.py:98-117);
  * a transforms.json;
  * grayscale PNG masks.

Used by tests/test_baseline_configs.py to run the five BASELINE.json
configs end-to-end.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

SH_C0 = 0.28209479177387814


# ------------------------------------------------------------------ #
# Scene construction
# ------------------------------------------------------------------ #

def build_realistic_scene(seed=0, n_floor=400, n_objects=3, n_per_object=160,
                          n_filler=150, n_sky=6):
    """Returns dict of numpy arrays shaped like a trained 3DGS export."""
    r = np.random.default_rng(seed)
    xyz, log_scales, quats, colours, opacity = [], [], [], [], []

    def flat_quat(n):
        # Near-axis-aligned flat splats with small random tilt.
        q = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
        q += r.normal(scale=0.06, size=(n, 4))
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    # Floor: thin splats on y = -0.6, checkerboard-ish colour.
    fx = r.uniform(-1.6, 1.6, n_floor)
    fz = r.uniform(-1.6, 1.6, n_floor)
    xyz.append(np.stack([fx, np.full(n_floor, -0.6), fz], axis=1))
    log_scales.append(
        np.stack(
            [r.uniform(-2.6, -2.0, n_floor), np.full(n_floor, -4.5),
             r.uniform(-2.6, -2.0, n_floor)], axis=1,
        )
    )
    quats.append(flat_quat(n_floor))
    checker = ((np.floor(fx * 2) + np.floor(fz * 2)) % 2).astype(np.float64)
    colours.append(
        np.stack([0.35 + 0.3 * checker, 0.3 + 0.25 * checker,
                  0.25 + 0.2 * checker], axis=1)
    )
    opacity.append(r.uniform(0.75, 0.98, n_floor))

    # Objects: dense detail-splat blobs with distinct colours.
    palette = np.array(
        [[0.85, 0.2, 0.15], [0.15, 0.55, 0.8], [0.9, 0.75, 0.2],
         [0.3, 0.7, 0.3], [0.6, 0.3, 0.7]]
    )
    for k in range(n_objects):
        centre = np.array(
            [r.uniform(-0.9, 0.9), r.uniform(-0.35, 0.2), r.uniform(-0.9, 0.9)]
        )
        pts = centre + r.normal(scale=0.16, size=(n_per_object, 3))
        xyz.append(pts)
        log_scales.append(r.uniform(-4.2, -3.0, (n_per_object, 3)))
        q = r.normal(size=(n_per_object, 4))
        quats.append(q / np.linalg.norm(q, axis=1, keepdims=True))
        col = palette[k % len(palette)] + r.normal(scale=0.05,
                                                   size=(n_per_object, 3))
        colours.append(np.clip(col, 0.02, 0.98))
        opacity.append(r.uniform(0.6, 0.99, n_per_object))

    # Low-opacity filler haze (trained scenes always carry some).
    xyz.append(r.uniform(-1.5, 1.5, (n_filler, 3)))
    log_scales.append(r.uniform(-3.5, -2.5, (n_filler, 3)))
    q = r.normal(size=(n_filler, 4))
    quats.append(q / np.linalg.norm(q, axis=1, keepdims=True))
    colours.append(r.uniform(0.2, 0.8, (n_filler, 3)))
    opacity.append(r.uniform(0.06, 0.25, n_filler))

    # Sky / background: giant splats far out, covering huge tile rects.
    ang = r.uniform(0, 2 * np.pi, n_sky)
    sky_pos = np.stack(
        [6.0 * np.sin(ang), r.uniform(0.5, 2.5, n_sky), 6.0 * np.cos(ang)],
        axis=1,
    )
    xyz.append(sky_pos)
    log_scales.append(
        np.stack([r.uniform(0.4, 0.9, n_sky), r.uniform(0.4, 0.9, n_sky),
                  np.full(n_sky, -2.0)], axis=1)
    )
    quats.append(flat_quat(n_sky))
    colours.append(
        np.stack([r.uniform(0.5, 0.65, n_sky), r.uniform(0.65, 0.8, n_sky),
                  r.uniform(0.85, 0.98, n_sky)], axis=1)
    )
    opacity.append(r.uniform(0.5, 0.85, n_sky))

    scene = {
        "xyz": np.concatenate(xyz).astype(np.float32),
        "log_scales": np.concatenate(log_scales).astype(np.float32),
        "rots": np.concatenate(quats).astype(np.float32),
        "colours": np.concatenate(colours).astype(np.float32),
        "opacities": np.concatenate(opacity).astype(np.float32),
    }
    n = scene["xyz"].shape[0]
    # Degree-3 SH: dc carries the colour; small random view dependence.
    f_dc = (scene["colours"] - 0.5) / SH_C0
    f_rest = r.normal(scale=0.02, size=(n, 3, 15))
    scene["f_dc"] = f_dc.astype(np.float32)
    scene["f_rest"] = f_rest.astype(np.float32)
    return scene


def ring_cameras(n_cams=6, distance=3.2, height=0.6, width=96, hheight=72,
                 focal=110.0):
    """NeRF-convention c2w poses on a ring looking at the origin."""
    poses, intr = {}, {}
    for i in range(n_cams):
        a = i * (2 * np.pi / n_cams)
        c = np.array([distance * np.sin(a), height, -distance * np.cos(a)])
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, c
        c2w[:, 1:3] = -c2w[:, 1:3]
        name = f"frame_{i:03d}"
        poses[name] = c2w
        intr[name] = (width, hheight, focal, focal)
    return poses, intr


# ------------------------------------------------------------------ #
# Writers
# ------------------------------------------------------------------ #

def write_gaussian_ply(path, scene):
    """Binary little-endian 3DGS .ply in the trained-export field layout."""
    n = scene["xyz"].shape[0]
    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(45)]
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
    op = np.clip(scene["opacities"], 1e-4, 1 - 1e-4)
    logit = np.log(op / (1 - op)).astype(np.float32)
    # f_rest layout: the loader sorts f_rest_j and reshapes to (n, 3, 15),
    # i.e. channel-major — flatten accordingly.
    rest_flat = scene["f_rest"].reshape(n, 45)
    rows = np.concatenate(
        [
            scene["xyz"],
            np.zeros((n, 3), np.float32),  # nx ny nz (ignored by loader)
            scene["f_dc"],
            rest_flat,
            logit[:, None],
            scene["log_scales"],
            scene["rots"],
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        fh.write(rows.tobytes())


def _rot_to_quat(R):
    """Rotation matrix -> wxyz quaternion (inverse of qvec2rotmat)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        if i == 0:
            s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
            w = (R[2, 1] - R[1, 2]) / s
            x = 0.25 * s
            y = (R[0, 1] + R[1, 0]) / s
            z = (R[0, 2] + R[2, 0]) / s
        elif i == 1:
            s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
            w = (R[0, 2] - R[2, 0]) / s
            x = (R[0, 1] + R[1, 0]) / s
            y = 0.25 * s
            z = (R[1, 2] + R[2, 1]) / s
        else:
            s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
            w = (R[1, 0] - R[0, 1]) / s
            x = (R[0, 2] + R[2, 0]) / s
            y = (R[1, 2] + R[2, 1]) / s
            z = 0.25 * s
    return np.array([w, x, y, z])


_FLIP = np.diag([1.0, -1.0, -1.0, 1.0])


def write_colmap_bin(dir_path, poses, intrinsics):
    """Write cameras.bin + images.bin reproducing ``poses`` through the
    loader (load_colmap_bin_data): M = inv(c2w_nerf @ FLIP), qvec from
    M's rotation (the loader's -qvec negation is a parity no-op: every
    rotmat term is quadratic in the components)."""
    os.makedirs(dir_path, exist_ok=True)
    names = sorted(poses)
    with open(os.path.join(dir_path, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(names)))
        for cam_id, name in enumerate(names, start=1):
            w, h, fx, fy = intrinsics[name]
            fh.write(
                struct.pack(
                    "<iiQQdddd", cam_id, 1, int(w), int(h),
                    float(fx), float(fy), w / 2.0, h / 2.0,
                )
            )
    with open(os.path.join(dir_path, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(names)))
        for img_id, name in enumerate(names, start=1):
            M = np.linalg.inv(np.asarray(poses[name]) @ _FLIP)
            q = _rot_to_quat(M[:3, :3])
            t = M[:3, 3]
            fh.write(
                struct.pack(
                    "<idddddddi", img_id, q[0], q[1], q[2], q[3],
                    t[0], t[1], t[2], img_id,
                )
            )
            fh.write((name + ".png").encode("utf-8") + b"\x00")
            fh.write(struct.pack("<Q", 0))  # num_points2d


def write_transforms_json(path, poses, intrinsics):
    frames = []
    for name in sorted(poses):
        w, h, fx, fy = intrinsics[name]
        frames.append(
            {
                "file_path": f"images/{name}.png",
                "transform_matrix": np.asarray(poses[name]).tolist(),
                "w": int(w), "h": int(h),
                "fl_x": float(fx), "fl_y": float(fy),
            }
        )
    with open(path, "w") as fh:
        json.dump({"frames": frames}, fh)


def write_masks(dir_path, poses, intrinsics, coverage=0.88):
    """Grayscale PNG vignette masks, one per frame."""
    from PIL import Image

    os.makedirs(dir_path, exist_ok=True)
    for name in sorted(poses):
        w, h, _, _ = intrinsics[name]
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        e = (
            ((xs - w / 2) / (w * 0.55 * coverage + 1e-6)) ** 2
            + ((ys - h / 2) / (h * 0.55 * coverage + 1e-6)) ** 2
        )
        m = np.where(e <= 1.0, 255, 0).astype(np.uint8)
        Image.fromarray(m, mode="L").save(
            os.path.join(dir_path, f"{name}.png")
        )


def write_capture(root, seed=0, n_cams=6, width=96, height=72):
    """Materialise the full fixture: returns paths dict."""
    scene = build_realistic_scene(seed=seed)
    poses, intr = ring_cameras(n_cams=n_cams, width=width, hheight=height)
    paths = {
        "ply": os.path.join(root, "scene.ply"),
        "colmap": os.path.join(root, "sparse", "0"),
        "transforms": os.path.join(root, "transforms.json"),
        "masks": os.path.join(root, "masks"),
    }
    write_gaussian_ply(paths["ply"], scene)
    write_colmap_bin(paths["colmap"], poses, intr)
    write_transforms_json(paths["transforms"], poses, intr)
    write_masks(paths["masks"], poses, intr)
    return scene, poses, intr, paths
