"""End-to-end pipeline + CLI tests on a synthetic scene."""

import json
import os

import numpy as np
import pytest

from gs2pc.cli import main as cli_main
from gs2pc.io.ply import read_xyz_ply
from gs2pc.io.splat import save_splat
from gs2pc.utils.config import (
    GaussPointCloudSettings,
    RenderConfig,
    parse_args,
    settings_from_args,
)
from tests.conftest import make_synthetic_scene
from tests.test_render import look_at_camera


@pytest.fixture
def scene_files(tmp_path):
    """Synthetic .splat + transforms.json fixture."""
    scene = make_synthetic_scene(128, seed=11, spread=1.0, scale_lo=-3.5, scale_hi=-1.5)
    splat_path = str(tmp_path / "scene.splat")
    save_splat(
        splat_path,
        np.asarray(scene.xyz),
        np.asarray(scene.log_scales),
        np.asarray(scene.rots),
        np.asarray(scene.colours),
        np.asarray(scene.opacities),
    )
    frames = []
    for i, angle in enumerate([0.0, 1.5, 3.0, 4.5]):
        c2w, intr = look_at_camera(angle=angle, width=64, height=64, focal=80.0)
        frames.append(
            {
                "file_path": f"images/cam_{i:02d}.png",
                "transform_matrix": c2w.tolist(),
                "w": 64, "h": 64, "fl_x": 80.0, "fl_y": 80.0,
            }
        )
    json_path = str(tmp_path / "transforms.json")
    json.dump({"frames": frames}, open(json_path, "w"))
    return splat_path, json_path


def small_settings(**overrides):
    defaults = dict(
        renderer_type="tile",
        num_points=20_000,
        colour_resolution=None,
        visibility_threshold=0.05,
        quiet=True,
        render=RenderConfig(
            slots_per_gaussian=32, max_pairs_per_tile=256,
            run_chunk=64, tile_batch=8,
        ),
    )
    defaults.update(overrides)
    return GaussPointCloudSettings(**defaults)


class TestConvert:
    def test_full_conversion(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, surface = convert_3dgs_to_pc(
            splat_path, json_path, None, small_settings()
        )
        assert surface is None
        n = total.points.shape[0]
        assert abs(n - 20_000) < 2000
        assert total.colours.shape == (n, 3)
        assert total.colours.max() > 1.5  # 0-255 scale
        assert total.normals.shape == (n, 3)
        # points should be near the scene (box [-1,1] + 2-sigma slack)
        assert np.abs(total.points).max() < 3.0

    def test_no_render_colours(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, _ = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, None, None,
            small_settings(render_colours=False, remove_unrendered_gaussians=False),
        )
        assert total.points.shape[0] > 15_000

    def test_no_normals(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, None,
            small_settings(calculate_normals=False),
        )
        assert total.normals is None

    def test_bounding_box(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, None,
            small_settings(
                bounding_box_min=[-0.5, -0.5, -0.5],
                bounding_box_max=[0.5, 0.5, 0.5],
            ),
        )
        # all SOURCE gaussian centres within box; sampled points may spill
        # by the mahalanobis radius but stay close
        assert np.abs(total.points).max() < 1.5

    def test_dense_renderer_path(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, None,
            small_settings(renderer_type="dense", num_points=5000),
        )
        assert total.points.shape[0] > 3000

    def test_exact_num_points(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, None,
            small_settings(num_points=8000, exact_num_points=True),
        )
        assert abs(total.points.shape[0] - 8000) < 200

    def test_no_prioritise_and_cull_sizes(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, None,
            small_settings(
                num_points=5000,
                prioritise_visible_gaussians=False,
                cull_large_percentage=0.2,
            ),
        )
        assert total.points.shape[0] > 3000

    def test_masks_through_pipeline(self, scene_files, tmp_path):
        import os

        from PIL import Image

        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir)
        # mask half of camera 0's image; other cameras get no mask
        arr = np.zeros((64, 64), np.uint8)
        arr[:, 32:] = 255
        Image.fromarray(arr).save(os.path.join(mask_dir, "cam_00.png"))
        total, _ = convert_3dgs_to_pc(
            splat_path, json_path, mask_dir,
            small_settings(num_points=5000),
        )
        assert total.points.shape[0] > 3000

    def test_empty_cull_raises(self, scene_files):
        from gs2pc.pipeline import convert_3dgs_to_pc

        splat_path, json_path = scene_files
        with pytest.raises(Exception, match="every Gaussian was culled"):
            convert_3dgs_to_pc(
                splat_path, json_path, None,
                small_settings(min_opacity=0.999999),
            )


class TestCLI:
    def test_cli_end_to_end(self, scene_files, tmp_path):
        splat_path, json_path = scene_files
        out_path = str(tmp_path / "out.ply")
        cli_main(
            [
                "--input_path", splat_path,
                "--transform_path", json_path,
                "--output_path", out_path,
                "--num_points", "5000",
                "--colour_quality", "original",
                "--tile_slots", "32",
                "--max_pairs_per_tile", "256",
                "--quiet",
            ]
        )
        pts, cols, nrm = read_xyz_ply(out_path)
        assert abs(pts.shape[0] - 5000) < 600
        assert nrm is not None

    def test_cli_generate_mesh_native(self, scene_files, tmp_path):
        """--generate_mesh end-to-end via the native mesher (no Open3D)."""
        from gs2pc.io.ply import read_ply

        splat_path, json_path = scene_files
        out_path = str(tmp_path / "pc.ply")
        mesh_path = str(tmp_path / "mesh.ply")
        cli_main(
            [
                "--input_path", splat_path,
                "--transform_path", json_path,
                "--output_path", out_path,
                "--mesh_output_path", mesh_path,
                "--generate_mesh",
                "--poisson_depth", "6",
                "--laplacian_iterations", "2",
                "--num_points", "20000",
                "--colour_quality", "original",
                "--tile_slots", "32",
                "--max_pairs_per_tile", "256",
                "--quiet",
            ]
        )
        elements = read_ply(mesh_path)
        assert elements["vertex"].count > 50
        assert elements["face"].count > 50

    def test_cli_clean_pointcloud(self, scene_files, tmp_path):
        splat_path, json_path = scene_files
        out_path = str(tmp_path / "clean.ply")
        cli_main(
            [
                "--input_path", splat_path,
                "--transform_path", json_path,
                "--output_path", out_path,
                "--clean_pointcloud",
                "--num_points", "4000",
                "--colour_quality", "original",
                "--tile_slots", "32",
                "--max_pairs_per_tile", "256",
                "--quiet",
            ]
        )
        pts, _, _ = read_xyz_ply(out_path)
        assert 2000 < pts.shape[0] <= 4600

    def test_cli_sh_colour_eval(self, tmp_path):
        import json as jsonlib

        from tests.test_io import write_3dgs_ply
        from tests.test_render import look_at_camera

        ply_path = str(tmp_path / "sh_scene.ply")
        write_3dgs_ply(ply_path, n=64, seed=7)
        frames = []
        for i in range(2):
            c2w, _ = look_at_camera(angle=i * 2.0, width=48, height=48, focal=50.0)
            frames.append({
                "file_path": f"c{i}.png", "transform_matrix": c2w.tolist(),
                "w": 48, "h": 48, "fl_x": 50.0,
            })
        tpath = str(tmp_path / "transforms.json")
        jsonlib.dump({"frames": frames}, open(tpath, "w"))
        out_path = str(tmp_path / "sh_out.ply")
        cli_main(
            [
                "--input_path", ply_path,
                "--transform_path", tpath,
                "--output_path", out_path,
                "--sh_colour_eval",
                "--num_points", "2000",
                "--visibility_threshold", "0.0",
                "--colour_quality", "original",
                "--tile_slots", "32",
                "--max_pairs_per_tile", "256",
                "--quiet",
            ]
        )
        pts, cols, _ = read_xyz_ply(out_path)
        assert pts.shape[0] > 500

    def test_cli_validation_rules(self, tmp_path):
        base = ["--input_path", "x.ply"]
        with pytest.raises(AttributeError):
            parse_args(base + ["--min_opacity", "2.0", "--no_render_colours"])
        with pytest.raises(AttributeError):
            parse_args(base + ["--mahalanobis_distance_std", "0", "--no_render_colours"])
        with pytest.raises(AttributeError):
            parse_args(base + ["--num_points", "0", "--no_render_colours"])
        with pytest.raises(AttributeError):  # colours need transforms
            parse_args(base)
        with pytest.raises(AttributeError):  # mesh needs normals
            parse_args(base + ["--generate_mesh", "--no_calculate_normals",
                               "--transform_path", "t.json"])
        with pytest.raises(AttributeError):  # masks need transforms
            parse_args(base + ["--mask_path", "m", "--no_render_colours"])
        with pytest.raises(AttributeError):  # surface dist needs tile renderer
            parse_args(base + ["--renderer_type", "python",
                               "--surface_distance_std", "1.0",
                               "--no_render_colours"])
        with pytest.raises(AttributeError):  # bad colour quality
            parse_args(base + ["--colour_quality", "amazing", "--no_render_colours"])
        with pytest.raises(AttributeError):  # bbox needs 3 floats
            parse_args(base + ["--bounding_box_min", "1", "a", "3",
                               "--no_render_colours"])

    def test_config_file(self, tmp_path):
        cfg = tmp_path / "conf.txt"
        cfg.write_text("num_points = 1234\nquiet = true\n# comment\n")
        args = parse_args(
            ["--config", str(cfg), "--input_path", "x.ply", "--no_render_colours"]
        )
        assert args.num_points == 1234 and args.quiet
        s = settings_from_args(args)
        assert s.num_points == 1234

    def test_renderer_aliases(self):
        args = parse_args(
            ["--input_path", "x.ply", "--renderer_type", "cuda", "--no_render_colours"]
        )
        assert settings_from_args(args).renderer_type == "tile"


class TestCleanPointCloud:
    def test_outlier_removal(self, rng):
        from gs2pc.meshing import clean_point_cloud

        cluster = rng.normal(size=(2000, 3)).astype(np.float32) * 0.1
        outliers = np.array([[50.0, 50, 50], [-60, 0, 0], [0, 80, 0]], np.float32)
        pts = np.concatenate([cluster, outliers])
        cols = np.ones((pts.shape[0], 3)) * 128
        kept, kcols, _ = clean_point_cloud(pts, cols, None, std_ratio=3.0)
        assert kept.shape[0] <= 2000
        assert np.abs(kept).max() < 5.0
