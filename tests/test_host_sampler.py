"""Host-CPU sampling path + budget-probe cache (round 4).

The host path re-derives point positions on the host CPU from the
loader's scene mirror instead of fetching them from the device
(pipeline._generate_point_cloud_host) — on CPU test runs both paths are
CPU programs, so everything except last-bit XLA fusion noise must match.
"""

import json
import os

import numpy as np
import pytest

from gs2pc.io.gaussians_io import HostScene
from gs2pc.pipeline import generate_point_cloud_data
from gs2pc.utils.config import GaussPointCloudSettings
from tests.conftest import make_synthetic_scene


def _host_mirror(scene) -> HostScene:
    return HostScene(
        xyz=np.asarray(scene.xyz, np.float32),
        log_scales=np.asarray(scene.log_scales, np.float32),
        rots=np.asarray(scene.rots, np.float32),
    )


class TestHostSamplerParity:
    @pytest.mark.parametrize("exact", [False, True])
    def test_host_matches_device_path(self, exact):
        scene = make_synthetic_scene(512, seed=3)
        scene = scene.validate_covariances().calculate_normals()
        host = _host_mirror(scene)
        num_points = 20_000
        outs = {}
        for mode in ("device", "host"):
            settings = GaussPointCloudSettings(
                num_points=num_points,
                exact_num_points=exact,
                sampler_device=mode,
                seed=11,
            )
            pc = generate_point_cloud_data(
                scene, num_points, settings,
                host_scene=host if mode == "host" else None,
            )
            outs[mode] = (pc.points, pc.colours, pc.normals, pc.total)
        p_d, c_d, n_d, t_d = outs["device"]
        p_h, c_h, n_h, t_h = outs["host"]
        assert t_d == t_h
        # Quota structure and colours are computed by the same formula in
        # both paths (clip + cast, no FMA) — byte-identical.
        np.testing.assert_array_equal(c_d, c_h)
        # Positions: same threefry bits, same math, but separately
        # compiled XLA programs may fuse mul+add differently — 1-ulp.
        np.testing.assert_allclose(p_d, p_h, rtol=3e-7, atol=1e-7)
        assert (p_d == p_h).all(axis=1).mean() > 0.95
        # Rotation-matrix columns come from quadratic forms with
        # cancellation; separately compiled programs can disagree by a
        # few ulp of the TERM magnitudes (~1e-7 absolute), which is a
        # large RELATIVE error on near-zero components.
        np.testing.assert_allclose(n_d, n_h, rtol=3e-7, atol=1e-6)

    def test_host_centres_are_exact(self):
        scene = make_synthetic_scene(64, seed=5).validate_covariances()
        host = _host_mirror(scene)
        settings = GaussPointCloudSettings(
            num_points=640, sampler_device="host", seed=0
        )
        pc = generate_point_cloud_data(
            scene, 640, settings, host_scene=host
        )
        gid = np.repeat(np.arange(64), pc._counts)
        starts = np.searchsorted(gid, np.arange(64), side="left")
        has = pc._counts > 0
        xyz = np.asarray(scene.xyz)
        np.testing.assert_array_equal(
            pc.points[starts[has]], xyz[has]
        )

    def test_auto_on_cpu_prefers_device(self):
        from gs2pc.pipeline import _use_host_sampler

        scene = make_synthetic_scene(8, seed=1)
        host = _host_mirror(scene)
        settings = GaussPointCloudSettings(sampler_device="auto")
        assert _use_host_sampler(settings, host, 1, 1000) is False
        # Sharded sampling always stays on device.
        settings = GaussPointCloudSettings(sampler_device="host")
        assert _use_host_sampler(settings, host, 8, 1000) is False
        # No mirror -> device.
        assert _use_host_sampler(settings, None, 1, 1000) is False


class TestBudgetProbeCache:
    def test_probe_key_stable_and_sensitive(self, tmp_path, monkeypatch):
        from gs2pc.ops.rasterize import TileConfig
        from gs2pc.pipeline import _budget_probe_key

        monkeypatch.setenv("GS2PC_CACHE_DIR", str(tmp_path / "cache"))
        f = tmp_path / "scene.splat"
        f.write_bytes(b"\x01" * 4096)
        tf = {"cam_00": np.eye(4), "cam_01": np.eye(4) * 2.0}
        intr = {"cam_00": [64, 48, 50.0, 50.0], "cam_01": [64, 48, 50.0, 50.0]}
        settings = GaussPointCloudSettings()
        cfg = TileConfig(width_pad=64, height_pad=48)
        k1 = _budget_probe_key(str(f), tf, intr, settings, cfg)
        k2 = _budget_probe_key(str(f), tf, intr, settings, cfg)
        assert k1 is not None and k1 == k2
        # Different file content -> different key.
        f.write_bytes(b"\x02" * 4096)
        assert _budget_probe_key(str(f), tf, intr, settings, cfg) != k1
        # Different camera pose -> different key.
        f.write_bytes(b"\x01" * 4096)
        tf2 = {**tf, "cam_01": np.eye(4) * 3.0}
        assert _budget_probe_key(str(f), tf2, intr, settings, cfg) != k1
        # Caching disabled -> no key.
        monkeypatch.setenv("GS2PC_CACHE_DIR", "")
        assert _budget_probe_key(str(f), tf, intr, settings, cfg) is None

    def test_kv_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GS2PC_CACHE_DIR", str(tmp_path / "c"))
        from gs2pc.utils.cache import kv_get, kv_put

        assert kv_get("budget_probe", "k") is None
        kv_put("budget_probe", "k", 12345)
        assert kv_get("budget_probe", "k") == 12345
        # Store is plain JSON on disk.
        with open(tmp_path / "c" / "budget_probe.json") as fh:
            assert json.load(fh)["k"] == 12345

    def test_cli_second_run_hits_cache(self, tmp_path, monkeypatch):
        """End-to-end: identical PLY bytes with the probe cached, and the
        cache file gains an entry after the first run."""
        monkeypatch.setenv("GS2PC_CACHE_DIR", str(tmp_path / "cache"))
        import json as _json

        from gs2pc.cli import main as cli_main
        from gs2pc.io.splat import save_splat
        from tests.test_render import look_at_camera

        scene = make_synthetic_scene(256, seed=7)
        splat = str(tmp_path / "scene.splat")
        save_splat(
            splat, np.asarray(scene.xyz), np.asarray(scene.log_scales),
            np.asarray(scene.rots), np.asarray(scene.colours),
            np.asarray(scene.opacities),
        )
        frames = []
        for i, angle in enumerate([0.0, 2.0]):
            c2w, _ = look_at_camera(angle=angle, width=64, height=48, focal=60.0)
            frames.append({
                "file_path": f"images/cam_{i:02d}.png",
                "transform_matrix": c2w.tolist(),
                "w": 64, "h": 48, "fl_x": 60.0, "fl_y": 60.0,
            })
        tpath = str(tmp_path / "transforms.json")
        with open(tpath, "w") as fh:
            _json.dump({"frames": frames}, fh)

        outs = []
        for run in range(2):
            out = str(tmp_path / f"out_{run}.ply")
            cli_main([
                "--input_path", splat, "--transform_path", tpath,
                "--output_path", out, "--num_points", "2000", "--quiet",
            ])
            outs.append(open(out, "rb").read())
        assert outs[0] == outs[1]
        store = tmp_path / "cache" / "budget_probe.json"
        assert store.exists() and len(_json.load(open(store))) >= 1
