"""Mixed-resolution camera batches: one compile, dynamic true dims."""

import numpy as np
import jax
import jax.numpy as jnp

from gs2pc.camera import build_camera_batch
from gs2pc.ops.rasterize import TileConfig, render_tile_camera
from gs2pc.parallel.sweep import render_sweep
from tests.conftest import make_synthetic_scene
from tests.test_render import look_at_camera


def test_mixed_resolutions_match_individual_renders():
    scene = make_synthetic_scene(96, seed=31, spread=1.0, scale_lo=-3.5, scale_hi=-1.5)
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(96, bool),
    )

    # Three cameras at different resolutions/aspects.
    specs = [(64, 48, 70.0), (48, 64, 60.0), (32, 32, 40.0)]
    transforms, intr = {}, {}
    for i, (w, h, f) in enumerate(specs):
        c2w, _ = look_at_camera(angle=i * 1.3, width=w, height=h, focal=f)
        transforms[f"c{i}"] = c2w.tolist()
        intr[f"c{i}"] = (w, h, f, f)
    cams, wp, hp = build_camera_batch(transforms, intr)
    assert (wp, hp) == (64, 64)

    cfg = TileConfig(width_pad=wp, height_pad=hp, slots=16,
                     run_cap=128, run_chunk=64, tile_batch=8)

    # Sweep over all three at once (single compile, dynamic dims).
    acc = jax.jit(lambda a, c: render_sweep(a, c, cfg))(arrays, cams)

    # Sequential single-camera renders must produce the same accumulators.
    from gs2pc.parallel.sweep import init_accumulators, update_accumulators

    acc_ref = init_accumulators(96)
    for i in range(3):
        out = render_tile_camera(*arrays, cams.at(i), cfg)
        acc_ref = update_accumulators(acc_ref, out)

    np.testing.assert_allclose(
        np.asarray(acc.max_contribution),
        np.asarray(acc_ref.max_contribution), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(acc.total_contribution),
        np.asarray(acc_ref.total_contribution), atol=1e-5,
    )

    # Out-of-frame pixels of the smaller cameras must not contribute:
    # render camera 2 (32x32) alone and check its padded region is empty.
    out2 = render_tile_camera(*arrays, cams.at(2), cfg)
    img = np.asarray(out2.image)
    assert (img[32:, :, :] == 0).all()
    assert (img[:, 32:, :] == 0).all()
    assert img[:32, :32].max() > 0
