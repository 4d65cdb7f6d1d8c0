"""Settings objects + CLI/config-file parsing.

Flag-for-flag parity with the reference CLI (gauss_to_pc.py:603-710),
including every cross-flag validation rule.  The reference uses
configargparse for optional config-file support; that package is not a
dependency here, so an equivalent ``--config FILE`` layer (one ``key = value``
or ``key: value`` per line, '#' comments) is built on argparse directly.
"""

from __future__ import annotations

import argparse
import shlex
from typing import NamedTuple, Optional, Sequence

# gauss_to_pc.py:24
COLOR_QUALITY_OPTIONS = {
    "tiny": 180,
    "low": 360,
    "medium": 720,
    "high": 1280,
    "ultra": 1920,
    "original": None,
}


class RenderConfig(NamedTuple):
    """Static knobs of the TPU tile renderer (gs2pc.ops.rasterize).

    These replace the reference CUDA build-time constants (config.h:16-17:
    16x16 tiles, 256-Gaussian batches) and the python renderer's
    memory-pressure heuristics (gauss_render.py:439-465).
    """

    tile: int = 16  # pixel tile edge
    slots_per_gaussian: int = 16  # max (tile,gaussian) pairs per Gaussian
    max_pairs_per_tile: int = 4096  # per-tile run cap (front-to-back)
    run_chunk: int = 128  # gaussians blended per inner step
    tile_batch: int = 256  # tiles processed per outer step
    use_pallas: str = "auto"  # "auto" | "on" | "off" — Pallas blend kernel


class GaussPointCloudSettings(NamedTuple):
    """Pipeline settings (parity: gauss_to_pc.py:26-60, 20 fields)."""

    renderer_type: str = "tile"
    num_points: int = 10_000_000
    prioritise_visible_gaussians: bool = True
    mahalanobis_distance_std: float = 2.0
    camera_skip_rate: int = 0
    render_colours: bool = True
    min_opacity: float = 0.0
    bounding_box_min: Optional[list] = None
    bounding_box_max: Optional[list] = None
    calculate_normals: bool = True
    cull_large_percentage: float = 0.0
    remove_unrendered_gaussians: bool = True
    colour_resolution: Optional[int] = 1280
    max_sh_degree: int = 3
    exact_num_points: bool = False
    visibility_threshold: float = 0.05
    surface_distance_std: Optional[float] = None
    generate_mesh: bool = False
    quiet: bool = False
    seed: int = 0
    sh_colour_eval: bool = False  # full view-dependent SH during the sweep
    save_sweep: Optional[str] = None  # checkpoint accumulators after sweep
    load_sweep: Optional[str] = None  # resume accumulators, skip the sweep
    shard_axis: str = "cams"  # "cams" | "gauss" (depth slabs) | "both" (2-D)
    render: RenderConfig = RenderConfig()


# Renderer aliases: the reference exposes "cuda" (native tile rasterizer)
# and "python" (dense fallback).  gs2pc's equivalents are "tile" and
# "dense"; reference names are accepted as drop-in aliases.
RENDERER_ALIASES = {
    "cuda": "tile",
    "tile": "tile",
    "python": "dense",
    "dense": "dense",
}


def _read_config_file(path: str) -> list[str]:
    """Parse a simple key=value / key: value config file into argv tokens."""
    argv: list[str] = []
    with open(path, "r", encoding="utf-8") as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                key, value = line.split("=", 1)
            elif ":" in line:
                key, value = line.split(":", 1)
            else:
                key, value = line, ""
            key = key.strip().lstrip("-").replace("-", "_")
            value = value.strip()
            if value.lower() in ("true", "yes", "on"):
                argv.append(f"--{key}")
            elif value.lower() in ("false", "no", "off", ""):
                if value.lower() in ("false", "no", "off"):
                    continue
                argv.append(f"--{key}")
            else:
                argv.append(f"--{key}")
                argv.extend(shlex.split(value))
    return argv


def build_parser() -> argparse.ArgumentParser:
    """CLI surface, flag-for-flag with gauss_to_pc.py:603-646."""
    p = argparse.ArgumentParser(
        prog="gs2pc",
        description="TPU-native 3D Gaussian Splatting to point cloud converter",
    )
    p.add_argument("--config", type=str, default=None, help="Path to a key=value config file (values are overridden by explicit CLI flags)")

    p.add_argument("--input_path", type=str, required=True, help="Path to ply or splat file to convert to a point cloud")
    p.add_argument("--output_path", type=str, default="3dgs_pc.ply", help="Path to output file (must be ply file)")
    p.add_argument("--transform_path", default=None, type=str, help="Path to COLMAP or Transform file used for loading in camera positions for rendering")
    p.add_argument("--mask_path", default=None, type=str, help="Path to directory containing associated masks for image transforms (must have the same image names as in transforms)")
    p.add_argument("--renderer_type", type=str, default="tile", help="Renderer for point colours: 'tile' (TPU tile rasterizer; alias 'cuda') or 'dense' (exact dense oracle; alias 'python')")
    p.add_argument("--num_points", type=int, default=10_000_000, help="Total number of points to generate for the pointcloud")
    p.add_argument("--exact_num_points", action="store_true", help="Set if the number of generated points should more closely match the num_points argument (slower)")
    p.add_argument("--no_prioritise_visible_gaussians", action="store_true", help="Gaussians that contribute most to the scene are given more points- set to turn this off")
    p.add_argument("--visibility_threshold", type=float, default=0.05, help="Minimum contribution each Gaussian must have to be included in the final point cloud generation (larger value = less noise)")
    p.add_argument("--surface_distance_std", type=float, default=None, help="Cull Gaussians that are a minimum of X standard deviations away from the scene surfaces (smaller value = less noise)")
    p.add_argument("--clean_pointcloud", action="store_true", help="Set to remove outliers on the point cloud after generation")
    p.add_argument("--generate_mesh", action="store_true", help="Set to also generate a mesh based on the created point cloud")
    p.add_argument("--poisson_depth", default=10, type=int, help="The depth used in the poisson surface reconstruction algorithm that is used for meshing (larger value = more quality)")
    p.add_argument("--laplacian_iterations", default=10, type=int, help="The number of iterations to perform laplacian mesh smoothing (larger value = smoother mesh)")
    p.add_argument("--mesh_output_path", type=str, default="3dgs_mesh.ply", help="Path to mesh output file (must be ply file)")
    p.add_argument("--camera_skip_rate", type=int, default=0, help="Number of cameras to skip for each rendered camera (reduces compute time- only use if cameras in linear trajectory)")
    p.add_argument("--no_render_colours", action="store_true", help="Skip rendering colours- faster but colours will be strange")
    p.add_argument("--colour_quality", type=str, default="high", help="The quality of the colours when generating the point cloud (more quality = slower processing time). Available options are: tiny, low, medium, high, ultra and original.")
    p.add_argument("--bounding_box_min", nargs=3, help="Values for minimum position of gaussians to include in generating the new point cloud")
    p.add_argument("--bounding_box_max", nargs=3, help="Values for maximum position of gaussians to include in generating the new point cloud")
    p.add_argument("--mahalanobis_distance_std", type=float, default=2.0, help="Maximum distance each point can be from the centre of their gaussian")
    p.add_argument("--no_calculate_normals", action="store_true", help="Set to not calculate normals for the points")
    p.add_argument("--min_opacity", type=float, default=0.0, help="Minimum opacity for gaussians to be included (must be between 0-1)")
    p.add_argument("--cull_gaussian_sizes", type=float, default=0.0, help="The percentage of gaussians to remove from largest to smallest (used to remove large gaussians)")
    p.add_argument("--max_sh_degree", type=int, default=3, help="The number spherical harmonics of the loaded point cloud (default 3- change if different number of spherical harmonics are loaded)")
    p.add_argument("--quiet", action="store_true", help="Set to suppress any output print statements")

    # gs2pc-specific extensions (all optional, defaults match reference flow)
    p.add_argument("--seed", type=int, default=0, help="PRNG seed for point sampling")
    p.add_argument("--tile_slots", type=int, default=16, help="Max tiles a single Gaussian may cover in the tile renderer (static capacity)")
    p.add_argument("--max_pairs_per_tile", type=int, default=4096, help="Per-tile depth-run capacity in the tile renderer")
    p.add_argument("--num_devices", type=int, default=0, help="Number of devices to shard the camera sweep/sampler over (0 = all local devices)")
    p.add_argument("--sh_colour_eval", action="store_true", help="Evaluate full view-dependent spherical harmonics per camera during the colour sweep (reference pipelines use degree-0 colours)")
    p.add_argument("--save_sweep", type=str, default=None, help="Save per-Gaussian sweep accumulators (colours/contributions/surface distances) to this .npz for later reuse")
    p.add_argument("--load_sweep", type=str, default=None, help="Load sweep accumulators from this .npz instead of re-rendering all cameras")
    p.add_argument("--pallas", type=str, default="auto", choices=["auto", "on", "off"], help="Use the hand-written Pallas TPU blend kernel ('auto' enables it on TPU backends)")
    p.add_argument("--shard_axis", type=str, default="cams", choices=["cams", "gauss", "both"], help="Multi-device sharding axis for the render sweep: 'cams' = camera data parallel, 'gauss' = depth-slab Gaussian parallel, 'both' = near-square 2-D (cams x gauss) mesh ('gauss'/'both' use the XLA blend)")
    p.add_argument("--profile_dir", type=str, default=None, help="Write a jax.profiler trace of the conversion to this directory (view with TensorBoard/XProf)")
    return p


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    """Parse CLI args with config-file support and reference validations."""
    parser = build_parser()
    ns, _ = parser.parse_known_args(argv)
    if ns.config is not None:
        file_argv = _read_config_file(ns.config)
        argv_list = list(argv) if argv is not None else None
        if argv_list is None:
            import sys

            argv_list = sys.argv[1:]
        args = parser.parse_args(file_argv + argv_list)
    else:
        args = parser.parse_args(argv)
    validate_args(args)
    return args


def validate_args(args: argparse.Namespace) -> None:
    """Cross-flag validation, rule-for-rule with gauss_to_pc.py:650-708."""
    if args.min_opacity < 0 or args.min_opacity > 1:
        raise AttributeError("Minumum opacity must be between 0 and 1")
    if args.mahalanobis_distance_std <= 0:
        raise AttributeError("Std distance must be greater than 0")
    if args.num_points <= 0:
        raise AttributeError("Number of points must be greater than 0")

    for attr, label in (("bounding_box_min", "Bounding Box Min"), ("bounding_box_max", "Bounding Box Max")):
        val = getattr(args, attr)
        if val is not None:
            try:
                val = [float(x) for x in val]
            except ValueError:
                raise AttributeError(f"{label} must contain float values")
            if len(val) != 3:
                raise AttributeError(f"{label} must have exactly 3 values")
            setattr(args, attr, val)

    if args.colour_quality.lower() not in COLOR_QUALITY_OPTIONS:
        raise AttributeError(
            f"Colour quality must be in the following options {list(COLOR_QUALITY_OPTIONS.keys())}"
        )
    if args.max_sh_degree < 0:
        raise AttributeError("The number of spherical harmonics must be larger than 0")
    if args.camera_skip_rate < 0:
        raise AttributeError("The camera skip rate must be larger than 0")
    if args.generate_mesh and args.no_calculate_normals:
        raise AttributeError("Normals are required for accurate meshing")
    if args.generate_mesh and args.no_render_colours:
        raise AttributeError("Colours are required for meshing")
    if args.generate_mesh and args.transform_path is None:
        raise AttributeError("Transforms are required for meshing")
    if not args.no_render_colours and args.transform_path is None:
        raise AttributeError(
            "Transforms are required for rendering accurate point colours, set --no_render_colours to True to render with no colour"
        )
    if args.visibility_threshold < 0.0 or args.visibility_threshold > 1.0:
        raise AttributeError("Visible Gaussian Threshold must be between 0 and 1")
    if args.surface_distance_std is not None and args.surface_distance_std <= 0.0:
        raise AttributeError("Surface std must be large than 0")
    if args.mask_path is not None and args.transform_path is None:
        raise AttributeError("Cannot use masks when no transforms have been provided")
    if args.renderer_type not in RENDERER_ALIASES:
        raise AttributeError(
            f"Renderer of type {args.renderer_type} is not supported (use 'tile'/'cuda' or 'dense'/'python')"
        )
    # Reference restricts surface distance to its CUDA renderer
    # (gauss_to_pc.py:707-708); gs2pc's tile renderer is the equivalent.
    if RENDERER_ALIASES[args.renderer_type] != "tile" and args.surface_distance_std is not None:
        raise AttributeError("Surface distance calculations only supported in the tile renderer")


def settings_from_args(args: argparse.Namespace) -> GaussPointCloudSettings:
    """Build pipeline settings (parity: gauss_to_pc.py:716-737)."""
    return GaussPointCloudSettings(
        renderer_type=RENDERER_ALIASES[args.renderer_type],
        num_points=args.num_points,
        prioritise_visible_gaussians=not args.no_prioritise_visible_gaussians,
        mahalanobis_distance_std=args.mahalanobis_distance_std,
        camera_skip_rate=args.camera_skip_rate,
        render_colours=not args.no_render_colours,
        min_opacity=args.min_opacity,
        bounding_box_min=args.bounding_box_min,
        bounding_box_max=args.bounding_box_max,
        calculate_normals=not args.no_calculate_normals,
        cull_large_percentage=args.cull_gaussian_sizes,
        colour_resolution=COLOR_QUALITY_OPTIONS[args.colour_quality.lower()],
        max_sh_degree=args.max_sh_degree,
        exact_num_points=args.exact_num_points,
        visibility_threshold=args.visibility_threshold,
        surface_distance_std=args.surface_distance_std,
        generate_mesh=args.generate_mesh,
        quiet=args.quiet,
        remove_unrendered_gaussians=args.visibility_threshold > 0,
        seed=args.seed,
        sh_colour_eval=args.sh_colour_eval,
        save_sweep=args.save_sweep,
        load_sweep=args.load_sweep,
        shard_axis=args.shard_axis,
        render=RenderConfig(
            slots_per_gaussian=args.tile_slots,
            max_pairs_per_tile=args.max_pairs_per_tile,
            use_pallas=args.pallas,
        ),
    )
