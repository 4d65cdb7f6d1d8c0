"""Point-cloud cleanup + meshing tail.

Reference parity: mesh_handler.py.  The reference delegates both outlier
removal and Poisson meshing to Open3D on the CPU (an optional, lazily
imported dependency — gauss_to_pc.py:748,779).  gs2pc:

  * ``clean_point_cloud`` / ``remove_statistical_outliers`` are implemented
    NATIVELY in JAX (spatial-sort approximate kNN), so the default pipeline
    has no Open3D dependency and the cleanup runs on-device;
  * ``generate_mesh`` uses Open3D's Poisson reconstruction when available
    (exact reference parity: depth, density-quantile trim, Laplacian
    smoothing) and raises a clear error otherwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _morton_codes(pts: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Interleaved-bit Morton codes for locality-preserving sorting."""
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    scale = (2**bits - 1) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((pts - lo) * scale), 0, 2**bits - 1).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    )


def knn_mean_distance(
    points: jnp.ndarray, k: int = 20, window: int = 32
) -> jnp.ndarray:
    """Mean distance to ~k nearest neighbours, Morton-window approximation.

    Fixed-shape: each point considers its 2*window neighbours in Morton
    order (a locality-preserving approximation) and averages the k
    smallest distances.
    """
    n = points.shape[0]
    order = jnp.argsort(_morton_codes(points))
    sorted_pts = points[order]

    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    idx = jnp.arange(n)[:, None] + offs[None, :]
    idx = jnp.clip(idx, 0, n - 1)
    neigh = sorted_pts[idx]  # (n, 2W, 3)
    d = jnp.linalg.norm(neigh - sorted_pts[:, None, :], axis=-1)
    # Exclude degenerate self-matches from clipping at the array ends.
    d = jnp.where(idx == jnp.arange(n)[:, None], jnp.inf, d)

    k = min(k, d.shape[1])
    knn, _ = jax.lax.top_k(-d, k)
    mean_knn = jnp.mean(-knn, axis=1)
    return jnp.zeros(n, mean_knn.dtype).at[order].set(mean_knn)


def statistical_outlier_mask(
    points: jnp.ndarray,
    nb_neighbors: int = 20,
    std_ratio: float = 10.0,
    window: int = 32,
) -> jnp.ndarray:
    """Approximate Open3D remove_statistical_outlier as a fixed-shape program.

    Outliers — the thing being detected — are far from *everything*, so the
    Morton-window kNN approximation errs on the safe side.  A point is kept
    when its mean kNN distance <= global_mean + std_ratio * global_std,
    matching Open3D's criterion.
    """
    mean_knn = knn_mean_distance(points, k=nb_neighbors, window=window)
    mu = jnp.mean(mean_knn)
    sigma = jnp.std(mean_knn)
    return mean_knn <= mu + std_ratio * sigma


def _open3d_outlier_keep(
    points: np.ndarray, nb_neighbors: int, std_ratio: float
) -> Optional[np.ndarray]:
    """Exact Open3D statistical-outlier keep mask, or None if Open3D is
    not importable.  Exact reference parity (mesh_handler.py:89-94): true
    kNN mean distances, keep mean_knn <= mu + std_ratio * sigma."""
    try:
        import open3d as o3d
    except ImportError:
        return None
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    _, kept_idx = pc.remove_statistical_outlier(
        nb_neighbors=nb_neighbors, std_ratio=std_ratio
    )
    keep = np.zeros(len(points), bool)
    keep[np.asarray(kept_idx, np.int64)] = True
    return keep


def clean_point_cloud(
    points,
    colours,
    normals=None,
    std_ratio: float = 10.0,
    nb_neighbors: int = 20,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Parity: mesh_handler.py:89-94 (nb=20, std_ratio=10).

    When Open3D is importable the cleanup delegates to its exact-kNN
    ``remove_statistical_outlier`` (bit-for-bit reference behaviour);
    otherwise the dependency-free JAX Morton-window approximation runs
    on-device (outliers are far from *everything*, so the windowed kNN
    errs on the safe side; tests/test_meshing_native.py bounds the
    approx-vs-exact disagreement on adversarial clouds).
    """
    keep = _open3d_outlier_keep(np.asarray(points), nb_neighbors, std_ratio)
    if keep is None:
        pts = jnp.asarray(points, jnp.float32)
        keep = np.asarray(
            jax.jit(
                lambda p: statistical_outlier_mask(
                    p, nb_neighbors=nb_neighbors, std_ratio=std_ratio
                )
            )(pts)
        )
    points = np.asarray(points)[keep]
    colours = np.asarray(colours)[keep]
    normals = None if normals is None else np.asarray(normals)[keep]
    return points, colours, normals


def generate_mesh(
    points,
    colours,
    normals,
    output_path: str,
    depth: int = 10,
    laplacian_iters: int = 10,
    std_ratio: float = 3.0,
) -> None:
    """Poisson mesh via Open3D (parity: mesh_handler.py:23-87).

    Pipeline: statistical outlier removal (std_ratio=3) -> Poisson at
    ``depth`` -> drop bottom-10%-density vertices -> Laplacian smoothing
    (exception-tolerant) -> write.
    """
    try:
        import open3d as o3d
    except ImportError:
        # Native fallback: density-grid marching tetrahedra + Laplacian
        # smoothing (gs2pc/meshing_native.py).  The reference simply
        # cannot mesh without Open3D; gs2pc still produces a surface.
        from gs2pc.meshing_native import generate_mesh_native
        from gs2pc.utils import log

        log.info(
            "Open3D not available - using the native marching-tetrahedra "
            "surface reconstruction"
        )
        pts = np.asarray(points)
        keep = np.asarray(
            statistical_outlier_mask(
                jnp.asarray(pts, jnp.float32), nb_neighbors=20,
                std_ratio=std_ratio,
            )
        )
        cols = None if colours is None else np.asarray(colours)[keep]
        generate_mesh_native(
            pts[keep], cols, normals, output_path,
            depth=depth, laplacian_iters=laplacian_iters,
        )
        return

    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    pc.colors = o3d.utility.Vector3dVector(
        np.clip(np.asarray(colours, np.float64), 0, 255) / 255.0
    )
    if normals is not None:
        pc.normals = o3d.utility.Vector3dVector(np.asarray(normals, np.float64))

    pc, _ = pc.remove_statistical_outlier(nb_neighbors=20, std_ratio=std_ratio)

    mesh, densities = o3d.geometry.TriangleMesh.create_from_point_cloud_poisson(
        pc, depth=depth
    )
    vertices_to_remove = np.asarray(densities) < np.quantile(densities, 0.1)
    mesh.remove_vertices_by_mask(vertices_to_remove)

    try:
        mesh = mesh.filter_smooth_laplacian(
            number_of_iterations=laplacian_iters,
            filter_scope=o3d.geometry.FilterScope.Vertex,
        )
        mesh.compute_vertex_normals()
    except Exception:  # noqa: BLE001 — reference is exception-tolerant here
        pass

    o3d.io.write_triangle_mesh(output_path, mesh)


def generate_ball_pivoting_mesh(points, colours, normals, laplacian_iters=20):
    """Ball-pivot variant (parity: mesh_handler.py:4-21; unused by CLI)."""
    import open3d as o3d

    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    if normals is not None:
        pc.normals = o3d.utility.Vector3dVector(np.asarray(normals, np.float64))
    radii = [0.002, 0.005, 0.008, 0.01, 0.015, 0.02, 0.025, 0.03,
             0.035, 0.04, 0.045, 0.05, 0.055, 0.06, 0.065, 0.07]
    mesh = o3d.geometry.TriangleMesh.create_from_point_cloud_ball_pivoting(
        pc, o3d.utility.DoubleVector(radii)
    )
    try:
        mesh = mesh.filter_smooth_laplacian(
            number_of_iterations=laplacian_iters,
            filter_scope=o3d.geometry.FilterScope.Vertex,
        )
    except Exception:  # noqa: BLE001
        pass
    return mesh
