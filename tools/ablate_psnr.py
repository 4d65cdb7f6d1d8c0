"""At-scale PSNR ablation: which production knob costs quality?

Renders the bench quality-gate scene (capture statistics, default 1M
Gaussians, one 1280x720 camera) with the EXACT dense oracle once, then
sweeps the production tile renderer's knob matrix against it:

  run_cap x compact-pairs x pallas/XLA x surface_compact

and prints one JSON line per config with PSNR, the truncation counters
(pairs blended / window drops / run-cap drops / run-cap drops on live
tiles) and the render wall-clock.  This is the bisection VERDICT r03
asked for: BENCH_r03 recorded 31.91 dB at the production operating point
(run_cap 4096, compact on, pallas) with no attribution.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_psnr.py
Env:    ABLATE_GAUSS (default 1_000_000), ABLATE_ORACLE_NPZ (cache path),
        ABLATE_CONFIGS (comma list of config names; default all)
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gs2pc.utils.platform import honour_platform_env

honour_platform_env()

import jax
import jax.numpy as jnp

from bench import make_cameras, make_scene
from gs2pc.cli import enable_compilation_cache
from gs2pc.ops.dense_render import render_dense
from gs2pc.ops.rasterize import TileConfig, auto_pair_budget, render_tile_camera
from gs2pc.utils.platform import fetch_sync, is_tpu_backend

WIDTH, HEIGHT = 1280, 720


def render_oracle(arrays, cam, wp, hp, cache_path, n_gauss=None):
    if cache_path and os.path.exists(cache_path):
        return np.load(cache_path)["image"]
    # The bench's persistent oracle cache (bench._oracle_cache_path) holds
    # the SAME image (same scene seed/config; surface distances do not
    # change the rendered image) — reuse it when complete.
    if n_gauss is not None:
        from bench import _oracle_cache_path

        bench_cache = _oracle_cache_path(n_gauss, WIDTH, HEIGHT)
        if bench_cache and os.path.exists(bench_cache):
            try:
                with np.load(bench_cache) as z:
                    img = z["image"]
                    n_done = int(z["n_done"])
                    rows_per_band = max(1, (1 << 16) // wp)
                    if n_done * rows_per_band >= hp:
                        print("oracle: reusing bench cache", file=sys.stderr)
                        return img[:hp]
            except Exception:
                pass
    rows_per_band = max(1, (1 << 16) // wp)
    blk = rows_per_band * wp
    n_blk = -(-(hp * wp) // blk)

    @jax.jit
    def band(lo):
        return render_dense(
            *arrays, cam, wp, hp,
            chunk=256, pixel_chunk=blk,
            calc_surface_distance=False, rect_cull=True,
            block_range=(lo, 1),
        ).image

    bands = []
    t0 = time.perf_counter()
    for b in range(n_blk):
        bands.append(np.asarray(band(b)))
        print(f"  oracle band {b + 1}/{n_blk} ({time.perf_counter() - t0:.1f}s)",
              file=sys.stderr)
    oracle = np.concatenate(bands, axis=0)[:hp]
    if cache_path:
        np.savez_compressed(cache_path, image=oracle)
    return oracle


def psnr(img, oracle):
    h, w = HEIGHT, WIDTH
    diff = img[:h, :w] - oracle[:h, :w]
    mse = float(np.mean(diff.astype(np.float64) ** 2))
    return 99.0 if mse <= 0 else float(10.0 * math.log10(1.0 / mse))


def main():
    enable_compilation_cache()
    n_gauss = int(os.environ.get("ABLATE_GAUSS", 1_000_000))
    cache = os.environ.get(
        "ABLATE_ORACLE_NPZ", f"/tmp/ablate_oracle_{n_gauss}.npz"
    )
    only = os.environ.get("ABLATE_CONFIGS")
    only = set(only.split(",")) if only else None

    scene = make_scene(n_gauss, seed=2)
    cameras, wp, hp = make_cameras(1, WIDTH, HEIGHT)
    cam = cameras.at(0)
    arrays = (
        scene.xyz, scene.covariance_factors(), scene.opacities,
        scene.colours, jnp.ones(scene.num_gaussians, bool),
    )

    print("rendering oracle...", file=sys.stderr)
    oracle = render_oracle(arrays, cam, wp, hp, cache, n_gauss=n_gauss)

    on_tpu = is_tpu_backend()
    base = TileConfig(
        width_pad=wp, height_pad=hp, run_cap=4096, run_chunk=128,
        tile_batch=128, compact=True, surface_compact=True,
    )
    budget = auto_pair_budget(arrays, cameras, base)
    print(f"auto pair budget: {budget:,}", file=sys.stderr)

    # name -> (run_cap, compact, pallas, surface_compact).  Names are
    # comma-free so ABLATE_CONFIGS (comma-split) can select any of them.
    configs = {
        "prod": (4096, True, on_tpu, True),
        "cap16384": (16384, True, on_tpu, True),
        "cap65536": (65536, True, on_tpu, True),
        "nocompact": (4096, False, on_tpu, True),
        "xla": (4096, True, False, True),
        "noscomp": (4096, True, on_tpu, False),
        "cap65536+nocompact": (65536, False, on_tpu, True),
    }

    for name, (cap, compact, pallas, scomp) in configs.items():
        if only and name not in only:
            continue
        cfg = base._replace(
            run_cap=cap, compact=compact, surface_compact=scomp,
            pair_budget=budget,
        )

        def render(a):
            out = render_tile_camera(
                *a, cam, cfg, use_pallas=pallas,
                calc_surface_distance=True,
            )
            return out.image, out.n_dropped

        jfn = jax.jit(render)
        img, diag = jfn(arrays)
        img = np.asarray(img)  # also syncs
        diag = [float(x) for x in np.asarray(diag)]
        t0 = time.perf_counter()
        img2, d2 = jfn(arrays)
        fetch_sync(img2)
        dt = time.perf_counter() - t0
        rec = {
            "config": name,
            "psnr_db": round(psnr(img, oracle), 2),
            "t_render_s": round(dt, 3),
            "pairs_blended": diag[0],
            "window_dropped": diag[1],
            "runcap_dropped": diag[2],
            "runcap_dropped_live": diag[3] if len(diag) > 3 else None,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
