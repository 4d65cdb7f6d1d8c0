"""Round-5 fixes: platform pinning keeps the CPU backend, tunnel-aware
output-path policy, bench oracle cache path."""

import os
import subprocess
import sys

import numpy as np
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestHonourPlatformEnv:
    def test_cpu_request_still_works(self):
        """JAX_PLATFORMS=cpu + honour_platform_env: CPU backend usable."""
        code = (
            "from gs2pc.utils.platform import honour_platform_env\n"
            "honour_platform_env()\n"
            "import jax\n"
            "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
            "assert jax.devices('cpu')\n"
            "print('ok')\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "ok" in out.stdout

    def test_non_cpu_request_keeps_cpu_registered(self):
        """Pinning a non-cpu platform via jax.config restricts the
        backend set (round-5 root cause: the host sampler's
        jax.devices('cpu') raised under an exclusive pin).
        honour_platform_env must append cpu so host-side jit keeps
        working.  Uses a second CPU alias platform name to stay
        hardware-independent: the assertion is about the CONFIG value
        the function writes."""
        code = (
            "import os\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "from gs2pc.utils import platform as P\n"
            "import jax\n"
            "P.honour_platform_env()\n"
            "v = jax.config.jax_platforms\n"
            "assert v == 'cpu', v  # no duplicate append\n"
            "os.environ['JAX_PLATFORMS'] = 'tpu'\n"
            "P.honour_platform_env()\n"
            "v = jax.config.jax_platforms\n"
            "assert v == 'tpu,cpu', v\n"
            "print('ok')\n"
        )
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "ok" in out.stdout


class TestTunnelPolicy:
    def test_not_tunnelled_on_cpu(self):
        from gs2pc.utils.platform import is_tunnelled_attachment

        assert is_tunnelled_attachment() is False  # CPU test backend

    def test_native_planes_declines_on_tunnel(self, monkeypatch):
        """Device-resident point buffers must NOT be fetched wholesale on
        a tunnelled link (minute-scale variance) — the streaming path
        overlaps instead."""
        from gs2pc import pipeline
        from gs2pc.utils import platform as plat

        class FakeDev:
            platform = "tpu"

        class FakeFlat:
            def devices(self):
                return {FakeDev()}

        cloud = pipeline.LazyPointCloud(
            flat_points=FakeFlat(),
            counts=np.array([2, 1], np.int64),
            cols_u8=np.zeros((2, 3), np.uint8),
            gauss_normals=None,
            total=3,
        )
        monkeypatch.setattr(plat, "is_tunnelled_attachment", lambda: True)
        assert cloud.native_planes() is None

    class _FakeDeviceFlat:
        """Minimal device-array stand-in: non-cpu devices() + slicing."""

        def __init__(self, data):
            self._data = np.asarray(data, np.float32)

        def devices(self):
            class _Dev:
                platform = "tpu"

            return {_Dev()}

        def __getitem__(self, idx):
            return self._data[idx]

    def test_native_planes_fetches_on_fast_local_link(self, monkeypatch):
        """Device-resident + NOT tunnelled + fast measured link: the new
        fast-path must fetch and hand planes to the native writer."""
        from gs2pc import pipeline
        from gs2pc.utils import platform as plat

        flat = self._FakeDeviceFlat(np.arange(9, dtype=np.float32))
        cloud = pipeline.LazyPointCloud(
            flat_points=flat,
            counts=np.array([2, 1], np.int64),
            cols_u8=np.zeros((2, 3), np.uint8),
            gauss_normals=None,
            total=3,
        )
        monkeypatch.setattr(plat, "is_tunnelled_attachment", lambda: False)
        monkeypatch.setattr(plat, "fetch_bandwidth_mbps", lambda *a: 1e4)
        planes = cloud.native_planes()
        assert planes is not None
        pts, counts, cols, nrm = planes
        assert pts.shape == (3, 3) and counts.sum() == 3

    def test_native_planes_declines_on_slow_measured_link(self, monkeypatch):
        from gs2pc import pipeline
        from gs2pc.utils import platform as plat

        flat = self._FakeDeviceFlat(np.arange(3 * 10**7, dtype=np.float32))
        cloud = pipeline.LazyPointCloud(
            flat_points=flat,
            counts=np.full(10**4, 10**3, np.int64),
            cols_u8=np.zeros((10**4, 3), np.uint8),
            gauss_normals=None,
            total=10**7,
        )
        monkeypatch.setattr(plat, "is_tunnelled_attachment", lambda: False)
        # 10M points = 120 MB; 10 MB/s -> est 12 s > 1.5 s threshold.
        monkeypatch.setattr(plat, "fetch_bandwidth_mbps", lambda *a: 10.0)
        assert cloud.native_planes() is None

    def test_host_resident_skips_link_checks(self):
        from gs2pc import pipeline

        import jax.numpy as jnp

        flat = jnp.arange(9, dtype=jnp.float32)  # CPU-resident
        cloud = pipeline.LazyPointCloud(
            flat_points=flat,
            counts=np.array([2, 1], np.int64),
            cols_u8=np.zeros((2, 3), np.uint8),
            gauss_normals=None,
            total=3,
        )
        planes = cloud.native_planes()
        assert planes is not None and planes[0].shape == (3, 3)


class TestBenchContract:
    def test_bench_emits_parseable_records(self, tmp_path):
        """The driver reads bench.py's LAST stdout line as the round's
        perf record (round 4 was forfeited to a silent timeout): a tiny
        CPU run must emit >= 2 JSON lines (cold, steady), the last one
        carrying the driver-required fields."""
        import json

        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            GS2PC_BENCH_GAUSSIANS="8000",
            GS2PC_BENCH_POINTS="40000",
            GS2PC_BENCH_CAMERAS="2",
            GS2PC_BENCH_WIDTH="160",
            GS2PC_BENCH_HEIGHT="120",
            GS2PC_BENCH_PSNR="0",  # gate stage covered by TPU runs
            GS2PC_CACHE_DIR=str(tmp_path / "cache"),
        )
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=540,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [
            json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")
        ]
        assert len(lines) >= 2, out.stdout
        rec = lines[-1]
        for field in (
            "metric", "value", "unit", "vs_baseline", "t_total_s",
            "t_sweep_s", "t_io_s", "sampler", "writer", "steady",
        ):
            assert field in rec, field
        assert rec["steady"] is True
        assert rec["unit"] == "points/s" and rec["value"] > 0


class TestOracleCache:
    def test_cache_path_under_cache_dir(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GS2PC_CACHE_DIR", str(tmp_path))
        sys.path.insert(0, REPO)
        import bench

        p = bench._oracle_cache_path(1000, 320, 240)
        assert p is not None and p.startswith(str(tmp_path))
        assert "1000" in p and "320x240" in p

    def test_cache_disabled(self, monkeypatch):
        monkeypatch.setenv("GS2PC_CACHE_DIR", "")
        sys.path.insert(0, REPO)
        import bench

        assert bench._oracle_cache_path(1000, 320, 240) is None
