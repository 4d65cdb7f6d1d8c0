"""Dispatch-bounded camera sweep: chunked drivers vs the monolithic scan.

Some TPU serving stacks kill any single device program that runs longer
than ~60 s, so the production sweep splits into several bounded
dispatches (gs2pc.parallel.sweep.render_sweep_chunked / the chunked
sharded merge in gs2pc.pipeline.run_render_sweep).  These tests pin the
equivalence: the single-device chunked driver is byte-identical to one
monolithic lax.scan, and the merged sharded chunks match to f32
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gs2pc.camera import build_camera_batch
from gs2pc.ops.rasterize import TileConfig
from gs2pc.parallel.sweep import (
    auto_dispatch_cams,
    init_accumulators,
    merge_accumulators,
    render_sweep,
    render_sweep_chunked,
    slice_cameras,
)
from tests.conftest import make_synthetic_scene
from tests.test_render import look_at_camera


def _setup(n_cams=5, n_gauss=96, with_masks=True):
    scene = make_synthetic_scene(
        n_gauss, seed=33, spread=1.0, scale_lo=-3.5, scale_hi=-1.5
    )
    transforms, intr = {}, {}
    masks = {}
    rng = np.random.default_rng(5)
    for i in range(n_cams):
        c2w, intrinsic = look_at_camera(
            angle=i * 1.3, width=48, height=48, focal=60.0
        )
        transforms[f"c{i}"] = c2w.tolist()
        intr[f"c{i}"] = intrinsic
        masks[f"c{i}"] = (rng.uniform(size=(48, 48)) > 0.1).astype(np.uint8)
    cams, wp, hp = build_camera_batch(
        transforms, intr, masks=masks if with_masks else None
    )
    arrays = (
        scene.xyz,
        scene.covariance_factors(),
        scene.opacities * 0.9,
        scene.colours,
        jnp.ones(n_gauss, bool),
    )
    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                     run_cap=128, run_chunk=64, tile_batch=9)
    return arrays, cams, cfg


def _assert_acc_equal(a, b, exact=True):
    kw = {} if exact else {"atol": 1e-5, "rtol": 1e-5}
    check = (
        np.testing.assert_array_equal if exact
        else np.testing.assert_allclose
    )
    check(np.asarray(a.max_contribution), np.asarray(b.max_contribution), **kw)
    check(np.asarray(a.colours), np.asarray(b.colours), **kw)
    check(
        np.asarray(a.total_contribution),
        np.asarray(b.total_contribution), **kw,
    )
    check(
        np.asarray(a.min_surface_distance),
        np.asarray(b.min_surface_distance), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(a.n_dropped), np.asarray(b.n_dropped), rtol=1e-6
    )


class TestChunkedSweep:
    def test_byte_identical_to_monolithic(self):
        arrays, cams, cfg = _setup()
        mono = jax.jit(
            lambda a, c: render_sweep(a, c, cfg, calc_surface_distance=True)
        )(arrays, cams)
        for k in (1, 2, 3):
            chunked = render_sweep_chunked(
                arrays, cams, cfg, calc_surface_distance=True,
                dispatch_cams=k,
            )
            _assert_acc_equal(chunked, mono, exact=True)

    def test_single_chunk_path(self):
        arrays, cams, cfg = _setup()
        mono = jax.jit(
            lambda a, c: render_sweep(a, c, cfg)
        )(arrays, cams)
        chunked = render_sweep_chunked(arrays, cams, cfg, dispatch_cams=99)
        _assert_acc_equal(chunked, mono, exact=True)

    def test_merge_matches_sequential(self):
        """merge_accumulators(front half, back half) == full scan."""
        arrays, cams, cfg = _setup(n_cams=4)
        step = jax.jit(
            lambda a, c, acc0: render_sweep(
                a, c, cfg, calc_surface_distance=True, acc0=acc0
            )
        )
        p = arrays[0].shape[0]
        front = step(arrays, slice_cameras(cams, 0, 2), init_accumulators(p))
        back = step(arrays, slice_cameras(cams, 2, 2), init_accumulators(p))
        merged = merge_accumulators(front, back)
        mono = jax.jit(
            lambda a, c: render_sweep(a, c, cfg, calc_surface_distance=True)
        )(arrays, cams)
        # max/colour/min are exactly order-free; the total sum re-associates.
        np.testing.assert_array_equal(
            np.asarray(merged.max_contribution),
            np.asarray(mono.max_contribution),
        )
        np.testing.assert_array_equal(
            np.asarray(merged.colours), np.asarray(mono.colours)
        )
        np.testing.assert_array_equal(
            np.asarray(merged.min_surface_distance),
            np.asarray(mono.min_surface_distance),
        )
        np.testing.assert_allclose(
            np.asarray(merged.total_contribution),
            np.asarray(mono.total_contribution), rtol=1e-5, atol=1e-7,
        )

    def test_auto_sizing(self):
        cfg = TileConfig(width_pad=1280, height_pad=720, pair_budget=1 << 25)
        # Production budget: few cameras per dispatch — the nearest
        # divisor of the camera count wins (no inert-padding dispatch).
        assert auto_dispatch_cams(cfg, 3_000_000, 45) == 5
        assert auto_dispatch_cams(
            cfg._replace(pair_budget=1 << 24), 3_000_000, 45
        ) == 9
        # No divisor near the target: fall back to the raw size.
        assert auto_dispatch_cams(cfg, 3_000_000, 43) == 4
        # Tiny test budgets: single dispatch.
        tiny = cfg._replace(pair_budget=1 << 14)
        assert auto_dispatch_cams(tiny, 1000, 45) == 45
        # Explicit request wins.
        assert auto_dispatch_cams(cfg, 3_000_000, 45, requested=7) == 7
        assert auto_dispatch_cams(cfg, 3_000_000, 45, requested=99) == 45


class TestChunkedShardedSweep:
    def test_pipeline_chunked_cam_shard(self):
        """run_render_sweep with num_devices>1 + small dispatch groups."""
        from gs2pc.models.gaussians import Gaussians
        from gs2pc.pipeline import run_render_sweep
        from gs2pc.utils.config import (
            GaussPointCloudSettings,
            RenderConfig,
        )

        assert len(jax.devices()) == 8
        scene = make_synthetic_scene(
            96, seed=33, spread=1.0, scale_lo=-3.5, scale_hi=-1.5
        )
        transforms, intr = {}, {}
        for i in range(5):
            c2w, intrinsic = look_at_camera(
                angle=i * 1.3, width=48, height=48, focal=60.0
            )
            transforms[f"c{i}"] = c2w.tolist()
            intr[f"c{i}"] = intrinsic
        cams, wp, hp = build_camera_batch(transforms, intr)
        cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                         run_cap=128, run_chunk=64, tile_batch=9)

        base = GaussPointCloudSettings(
            surface_distance_std=1.0,
            render=RenderConfig(max_pairs_per_tile=128, run_chunk=64),
        )
        acc_mono = run_render_sweep(scene, cams, cfg, base, num_devices=2)
        chunked = base._replace(
            render=base.render._replace(dispatch_cams=1)
        )
        acc_chunk = run_render_sweep(scene, cams, cfg, chunked, num_devices=2)
        np.testing.assert_allclose(
            np.asarray(acc_chunk.max_contribution),
            np.asarray(acc_mono.max_contribution), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(acc_chunk.colours),
            np.asarray(acc_mono.colours), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(acc_chunk.total_contribution),
            np.asarray(acc_mono.total_contribution), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(acc_chunk.min_surface_distance),
            np.asarray(acc_mono.min_surface_distance), atol=1e-6,
        )
