"""CLI entry point (parity: gauss_to_pc.py main(), :712-786)."""

from __future__ import annotations

from typing import Optional, Sequence

from gs2pc.utils import log
from gs2pc.utils.config import parse_args, settings_from_args


def enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations.

    The pipeline's two big jit programs (render sweep, sampler) take tens
    of seconds to compile — dominating small conversions.  Shapes are
    padded (camera resolutions, point budgets), so repeat runs usually hit
    the cache.  Override the location with GS2PC_CACHE_DIR; disable with
    GS2PC_CACHE_DIR=""."""
    import os

    cache_dir = os.environ.get(
        "GS2PC_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "gs2pc", "jax_cache",
        ),
    )
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation; never fail the conversion over it


def main(argv: Optional[Sequence[str]] = None) -> None:
    from gs2pc.utils.platform import honour_platform_env

    honour_platform_env()
    args = parse_args(argv)
    settings = settings_from_args(args)
    log.set_quiet(settings.quiet)
    enable_compilation_cache()

    from gs2pc.io.ply import save_point_cloud_ply
    from gs2pc.pipeline import PointCloudData, convert_3dgs_to_pc

    profiling = args.profile_dir is not None
    if profiling:
        import jax

        jax.profiler.start_trace(args.profile_dir)

    total_point_cloud, surface_point_cloud = convert_3dgs_to_pc(
        args.input_path,
        args.transform_path,
        args.mask_path,
        settings,
        num_devices=args.num_devices,  # 0 = all local devices
    )

    if profiling:
        import jax

        jax.profiler.stop_trace()
        log.info(f"Profiler trace written to {args.profile_dir}")

    if args.clean_pointcloud:
        log.info("Cleaning Point Cloud\n")
        from gs2pc.meshing import clean_point_cloud

        pts, cols, nrm = clean_point_cloud(
            total_point_cloud.points,
            total_point_cloud.colours,
            total_point_cloud.normals,
        )
        total_point_cloud = PointCloudData(points=pts, colours=cols, normals=nrm)

    log.info("Saving Final Point Cloud")
    with log.phase("ply_write"):
        # Streaming writer: overlaps the device->host point transfer
        # with the disk write (no-op for already-materialised clouds,
        # e.g. after --clean_pointcloud).
        save_point_cloud_ply(
            total_point_cloud,
            args.output_path,
            chunk_size=10**6,
            quiet=args.quiet,
        )
    log.info("")

    if settings.generate_mesh:
        log.info("Generating Mesh")
        from gs2pc.meshing import generate_mesh

        generate_mesh(
            surface_point_cloud.points,
            surface_point_cloud.colours,
            surface_point_cloud.normals,
            args.mesh_output_path,
            depth=args.poisson_depth,
            laplacian_iters=args.laplacian_iterations,
        )


if __name__ == "__main__":
    main()
