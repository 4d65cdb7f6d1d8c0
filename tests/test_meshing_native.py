"""Native marching-tetrahedra surface reconstruction tests."""

import numpy as np

from gs2pc.io.ply import read_ply
from gs2pc.meshing_native import (
    density_grid,
    generate_mesh_native,
    laplacian_smooth,
    marching_tetrahedra,
)


def sphere_cloud(n=60_000, radius=1.0, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * radius).astype(np.float32)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        pts = sphere_cloud()
        grid, origin, voxel = density_grid(pts, resolution=96)
        nz = grid[grid > 1e-6]
        iso = float(np.quantile(nz, 0.5))
        verts, faces = marching_tetrahedra(grid, iso, origin, voxel)
        assert len(verts) > 1000
        assert len(faces) > 1000
        assert faces.max() < len(verts)
        # vertices lie near the unit sphere (density shell half-width ~2 voxels)
        radii = np.linalg.norm(verts, axis=1)
        assert abs(np.median(radii) - 1.0) < 0.1
        assert radii.std() < 0.15

    def test_analytic_field(self):
        # Perfect analytic sphere SDF-like field: iso-surface radius exact.
        res = 64
        xs = np.linspace(-1.5, 1.5, res)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        field = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)  # iso 0 at r=1
        origin = np.array([-1.5, -1.5, -1.5])
        voxel = xs[1] - xs[0]
        verts, faces = marching_tetrahedra(field, 0.0, origin, voxel)
        radii = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(radii, 1.0, atol=0.02)
        # Closed surface: Euler characteristic V - E + F == 2 for a sphere.
        edges = set()
        for f in faces:
            for a, b in ((0, 1), (1, 2), (0, 2)):
                e = (min(f[a], f[b]), max(f[a], f[b]))
                edges.add(e)
        used = np.unique(faces.reshape(-1)).size
        euler = used - len(edges) + len(faces)
        assert euler == 2

    def test_empty_field(self):
        grid = np.zeros((16, 16, 16), np.float32)
        verts, faces = marching_tetrahedra(
            grid, 0.5, np.zeros(3), 1.0
        )
        assert len(verts) == 0 and len(faces) == 0

    def test_laplacian_smooth_reduces_roughness(self):
        pts = sphere_cloud(20_000)
        grid, origin, voxel = density_grid(pts, resolution=64)
        iso = float(np.quantile(grid[grid > 1e-6], 0.5))
        verts, faces = marching_tetrahedra(grid, iso, origin, voxel)
        sm = laplacian_smooth(verts, faces, iterations=10)
        assert np.isfinite(sm).all()
        # bounded displacement (no blow-up), and the Laplacian residual
        # (distance of each vertex from its neighbour centroid) shrinks
        from scipy import sparse

        n = len(verts)
        i = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
        j = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
        adj = sparse.coo_matrix(
            (np.ones_like(i, np.float32), (i, j)), shape=(n, n)
        )
        adj = ((adj + adj.T) > 0).astype(np.float32).tocsr()
        deg = np.maximum(np.asarray(adj.sum(axis=1)).reshape(-1), 1.0)

        def roughness(v):
            return np.linalg.norm(adj @ v / deg[:, None] - v, axis=1).mean()

        assert roughness(sm) < roughness(verts)
        assert np.abs(sm - verts).max() < 10 * voxel


class TestGenerateMeshNative:
    def test_end_to_end_ply(self, tmp_path):
        pts = sphere_cloud(30_000)
        cols = np.tile([[255.0, 64.0, 0.0]], (len(pts), 1))
        path = str(tmp_path / "mesh.ply")
        verts, faces = generate_mesh_native(
            pts, cols, None, path, depth=6, laplacian_iters=3
        )
        assert len(verts) > 500 and len(faces) > 500
        elements = read_ply(path)
        assert elements["vertex"].count == len(verts)
        assert elements["face"].count == len(faces)
        # colours transferred from the nearest points
        assert int(np.asarray(elements["vertex"]["red"]).max()) == 255

    def test_meshing_dispatch_without_open3d(self, tmp_path):
        """gs2pc.meshing.generate_mesh falls back to the native mesher."""
        from gs2pc.meshing import generate_mesh

        pts = sphere_cloud(20_000)
        cols = np.full((len(pts), 3), 128.0)
        path = str(tmp_path / "mesh2.ply")
        generate_mesh(pts, cols, None, path, depth=6, laplacian_iters=2)
        elements = read_ply(path)
        assert elements["vertex"].count > 100


class TestNativeMarchingTet:
    def test_native_matches_numpy(self):
        """C++ MT pass (gs2pc/native/mesher.cpp) is geometrically identical
        to the numpy fallback: same counts, same vertex positions (as sets),
        both watertight."""
        from gs2pc import native as gsnative
        from gs2pc.meshing_native import (
            _marching_tetrahedra_native,
            _marching_tetrahedra_numpy,
        )

        lib = gsnative.load()
        if lib is None or not hasattr(lib, "gs2pc_marching_tet"):
            import pytest

            pytest.skip("native toolchain unavailable")

        n = 48
        ax = np.linspace(-1.4, 1.4, n)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        field = (1.0 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)
        origin = np.array([-1.4, -1.4, -1.4])
        voxel = float(ax[1] - ax[0])
        v1, f1 = _marching_tetrahedra_numpy(field, 0.0, origin, voxel)
        v2, f2 = _marching_tetrahedra_native(field, 0.0, origin, voxel)
        assert v1.shape == v2.shape
        assert f1.shape == f2.shape
        from scipy.spatial import cKDTree

        d, _ = cKDTree(v2).query(v1, k=1)
        assert d.max() < 1e-5

        def edge_counts(f):
            e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
            e = np.sort(e, axis=1)
            _, c = np.unique(e, axis=0, return_counts=True)
            return c

        assert np.all(edge_counts(f2) == 2)
