"""CLI entry point (parity: gauss_to_pc.py main(), :712-786)."""

from __future__ import annotations

from typing import Optional, Sequence

from gs2pc.utils import log
from gs2pc.utils.config import parse_args, settings_from_args


def main(argv: Optional[Sequence[str]] = None) -> None:
    args = parse_args(argv)
    settings = settings_from_args(args)
    log.set_quiet(settings.quiet)

    from gs2pc.io.ply import save_xyz_to_ply
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
        num_devices=args.num_devices if args.num_devices else 1,
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
        save_xyz_to_ply(
            total_point_cloud.points,
            args.output_path,
            rgb_colors=total_point_cloud.colours,
            normals_points=total_point_cloud.normals,
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
