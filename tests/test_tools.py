"""Tests for the repo tools (format converter, preview renderer)."""

import os
import subprocess
import sys

import numpy as np

from gs2pc.io.gaussians_io import load_gaussians
from gs2pc.io.splat import save_splat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def _make_splat(path, n=16, seed=0):
    r = np.random.default_rng(seed)
    q = r.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    save_splat(
        path,
        r.normal(size=(n, 3)).astype(np.float32),
        r.uniform(-4, -2, (n, 3)).astype(np.float32),
        q,
        r.uniform(0, 1, (n, 3)).astype(np.float32),
        r.uniform(0.1, 0.9, n).astype(np.float32),
    )


class TestConvertFormat:
    def test_splat_ply_roundtrip(self, tmp_path):
        src = str(tmp_path / "a.splat")
        mid = str(tmp_path / "a.ply")
        back = str(tmp_path / "b.splat")
        _make_splat(src)
        for s, d in ((src, mid), (mid, back)):
            res = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "convert_format.py"), s, d],
                capture_output=True, text=True, env=ENV, cwd=REPO,
            )
            assert res.returncode == 0, res.stderr[-500:]

        g0 = load_gaussians(src)
        g2 = load_gaussians(back)
        np.testing.assert_allclose(
            np.asarray(g0.xyz), np.asarray(g2.xyz), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g0.opacities), np.asarray(g2.opacities), atol=2 / 255
        )
        np.testing.assert_allclose(
            np.asarray(g0.log_scales), np.asarray(g2.log_scales), atol=1e-4
        )
