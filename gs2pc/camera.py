"""Camera model — batched pytree + host-side construction.

Reference parity: camera_handler.py.  The reference builds one of two
camera objects depending on renderer; gs2pc has ONE canonical convention,
the one used by the reference's full-featured (CUDA) path
(camera_handler.py:72-108):

  * input c2w is NeRF-convention (from the loaders);
  * columns 1:2 of the rotation block are negated (OpenGL->OpenCV flip,
    camera_handler.py:75);
  * world->view:  p_view = V[:3,:3] @ p + V[:3,3]  with V = inv(c2w_cv);
  * NDC:          p_ndc = proj(p_view) with x_ndc = (x_v / z_v) / tanfovx;
  * pixels:       ndc2Pix(v, S) = ((v + 1) * S - 1) / 2   (auxiliary.h).

All cameras of a sweep are stacked into one ``CameraBatch`` with static
padded image dims (Wmax, Hmax) and *dynamic* per-camera true dims, so a
single compiled render function scans over every camera.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ZNEAR = 10.0  # camera_handler.py:85 (projection-matrix constants;
ZFAR = 100.0  # pixel mapping is independent of them for symmetric frusta)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_projection_matrix(znear, zfar, fovx, fovy) -> np.ndarray:
    """OpenGL-style projection (camera_handler.py:14-34), column-vector form."""
    tan_half_y = math.tan(fovy / 2)
    tan_half_x = math.tan(fovx / 2)
    P = np.zeros((4, 4))
    P[0, 0] = 1.0 / tan_half_x
    P[1, 1] = 1.0 / tan_half_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraBatch:
    """N stacked cameras with shared padded render dims.

    Per-camera leading axis N.  ``width``/``height`` are the true dynamic
    dims; rendering always allocates (height_max, width_max) buffers
    (static, from padded_width/padded_height fields of the pipeline).
    """

    viewmatrix: jnp.ndarray  # (N, 4, 4) world->view, column-vector
    projmatrix: jnp.ndarray  # (N, 4, 4) full = P @ V
    campos: jnp.ndarray  # (N, 3)
    tanfovx: jnp.ndarray  # (N,)
    tanfovy: jnp.ndarray  # (N,)
    focal_x: jnp.ndarray  # (N,)  = width / (2 tanfovx)
    focal_y: jnp.ndarray  # (N,)
    width: jnp.ndarray  # (N,) int32 true width
    height: jnp.ndarray  # (N,) int32 true height
    # Pixel masks ride host->device BIT-PACKED (8 pixels/byte, big
    # bitorder): a 45-camera 720p mask stack is ~42 MB unpacked — seconds
    # on a tunnelled device link — vs ~5 MB packed.  Renderers unpack
    # per camera with unpack_mask_bits (a few cheap vector ops).
    mask: Optional[jnp.ndarray]  # (N, ceil(Hmax*Wmax/8)) packed bits or None

    @property
    def num_cameras(self) -> int:
        return self.viewmatrix.shape[0]

    def at(self, i) -> "CameraBatch":
        return jax.tree.map(lambda x: x[i], self)


def make_camera(
    c2w_nerf: np.ndarray,
    intrinsic: Sequence,
    colour_resolution: Optional[int] = None,
    mask: Optional[np.ndarray] = None,
):
    """Host construction of one camera's arrays (camera_handler.py:53-108).

    Args:
        c2w_nerf: (4, 4) NeRF-convention camera-to-world.
        intrinsic: (width, height, focal_x, focal_y[, ...]) as from loaders.
        colour_resolution: target render width (COLOR_QUALITY); rescaling is
            DISABLED when a mask is present (camera_handler.py:55).
        mask: optional (H, W) int array.

    Returns dict of numpy arrays for one camera.
    """
    native_w = int(intrinsic[0])
    native_h = int(intrinsic[1])
    diff = 1.0 if (colour_resolution is None or mask is not None) else (
        colour_resolution / native_w
    )

    if mask is not None and (mask.shape[1] != native_w or mask.shape[0] != native_h):
        raise Exception("Size of mask must match size of input image")

    img_w = int(native_w * diff)
    img_h = int(native_h * diff)
    focal_x = float(intrinsic[2]) * diff
    focal_y = float(intrinsic[3]) * diff

    c2w = np.asarray(c2w_nerf, np.float64).copy()
    c2w[:, 1:3] = -c2w[:, 1:3]  # NeRF -> OpenCV flip (camera_handler.py:75)

    fovx = focal2fov(focal_x, img_w)
    fovy = focal2fov(focal_y, img_h)

    view = np.linalg.inv(c2w)
    proj = get_projection_matrix(ZNEAR, ZFAR, fovx, fovy)
    full = proj @ view
    campos = c2w[:3, 3]

    return dict(
        viewmatrix=view.astype(np.float32),
        projmatrix=full.astype(np.float32),
        campos=campos.astype(np.float32),
        tanfovx=np.float32(math.tan(fovx * 0.5)),
        tanfovy=np.float32(math.tan(fovy * 0.5)),
        focal_x=np.float32(img_w / (2 * math.tan(fovx * 0.5))),
        focal_y=np.float32(img_h / (2 * math.tan(fovy * 0.5))),
        width=np.int32(img_w),
        height=np.int32(img_h),
        mask=mask,
    )


def build_camera_batch(
    transforms: dict,
    intrinsics: dict,
    colour_resolution: Optional[int] = None,
    masks: Optional[dict] = None,
    tile: int = 16,
) -> tuple[CameraBatch, int, int]:
    """Stack all cameras; returns (batch, padded_width, padded_height).

    Padded dims are the max over cameras rounded up to the tile size; true
    dims stay dynamic per camera so one compile covers mixed resolutions.
    """
    cams = []
    for name, transform in transforms.items():
        mask = None
        if masks is not None and name in masks:
            mask = masks[name]
        cams.append(
            make_camera(
                np.asarray(transform, np.float64),
                intrinsics[name],
                colour_resolution=colour_resolution,
                mask=mask,
            )
        )
    if not cams:
        raise Exception("No cameras to render")

    w_max = max(int(c["width"]) for c in cams)
    h_max = max(int(c["height"]) for c in cams)
    w_pad = ((w_max + tile - 1) // tile) * tile
    h_pad = ((h_max + tile - 1) // tile) * tile

    any_mask = any(c["mask"] is not None for c in cams)
    mask_stack = None
    if any_mask:
        mask_stack = np.ones((len(cams), h_pad * w_pad), np.uint8)
        for i, c in enumerate(cams):
            if c["mask"] is not None:
                m = np.zeros((h_pad, w_pad), np.uint8)
                mm = np.asarray(c["mask"]) != 0
                m[: mm.shape[0], : mm.shape[1]] = mm.astype(np.uint8)
                mask_stack[i] = m.reshape(-1)

    def stack(key):
        return jnp.asarray(np.stack([c[key] for c in cams]))

    batch = CameraBatch(
        viewmatrix=stack("viewmatrix"),
        projmatrix=stack("projmatrix"),
        campos=stack("campos"),
        tanfovx=stack("tanfovx"),
        tanfovy=stack("tanfovy"),
        focal_x=stack("focal_x"),
        focal_y=stack("focal_y"),
        width=stack("width"),
        height=stack("height"),
        mask=(
            None
            if mask_stack is None
            else jnp.asarray(np.packbits(mask_stack, axis=1))
        ),
    )
    return batch, w_pad, h_pad


def unpack_mask_bits(packed: jnp.ndarray, n_pixels: int) -> jnp.ndarray:
    """Inverse of the np.packbits row packing: (B,) uint8 -> (n_pixels,)
    uint8 0/1.  Pure broadcast shifts — no gathers."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # big bitorder
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(-1)[:n_pixels]
