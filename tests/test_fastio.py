"""Direct-IO writer + native expand-writer: byte parity with the plain
python paths (round-4 io attack; reference writer role:
gauss_dataloader.py:118-202)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gs2pc.io.fastwrite import open_fast_writer
from gs2pc.io.ply import save_point_cloud_ply, save_xyz_to_ply
from gs2pc.pipeline import LazyPointCloud


def test_fast_writer_byte_identity(tmp_path, rng):
    """O_DIRECT staging round-trips arbitrary write sizes exactly."""
    sizes = [1, 4095, 4096, 4097, 1 << 20, (1 << 20) + 13, 12345, 0, 7]
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    p_fast, p_ref = str(tmp_path / "fast.bin"), str(tmp_path / "ref.bin")
    w = open_fast_writer(p_fast)
    for b in payloads:
        w.write(b)
    w.close()
    with open(p_ref, "wb") as fh:
        for b in payloads:
            fh.write(b)
    assert open(p_fast, "rb").read() == open(p_ref, "rb").read()


def _mk_cloud(rng, P=5000, max_q=9, with_normals=True, zero_every=None):
    counts = rng.integers(0, max_q, P).astype(np.int64)
    if zero_every:
        counts[::zero_every] = 0
    total = int(counts.sum())
    flat = jnp.asarray(rng.standard_normal((total + 5) * 3).astype(np.float32))
    cols = rng.integers(0, 256, (P, 3)).astype(np.uint8)
    nrm = (
        rng.standard_normal((P, 3)).astype(np.float32) if with_normals else None
    )
    return LazyPointCloud(
        flat_points=flat, counts=counts, cols_u8=cols,
        gauss_normals=nrm, total=total,
    )


@pytest.mark.parametrize("with_normals", [True, False])
@pytest.mark.parametrize("zero_every", [None, 3])
def test_native_expand_matches_stream(tmp_path, rng, with_normals, zero_every):
    """C++ expand-writer output == python streaming output, byte for byte."""
    cloud_a = _mk_cloud(rng, with_normals=with_normals, zero_every=zero_every)
    assert cloud_a.native_planes() is not None  # CPU-resident in tests
    p_a = str(tmp_path / "a.ply")
    save_point_cloud_ply(cloud_a, p_a, chunk_size=4096)

    rng2 = np.random.default_rng(42)
    cloud_b = _mk_cloud(rng2, with_normals=with_normals, zero_every=zero_every)
    cloud_b.native_planes = lambda: None  # force the python streaming path
    p_b = str(tmp_path / "b.ply")
    save_point_cloud_ply(cloud_b, p_b, chunk_size=4096)

    assert open(p_a, "rb").read() == open(p_b, "rb").read()


def test_eager_writer_still_matches(tmp_path, rng):
    """save_xyz_to_ply through the fast writer matches the streamed cloud."""
    cloud = _mk_cloud(rng)
    p_a = str(tmp_path / "eager.ply")
    save_xyz_to_ply(
        cloud.points, p_a, rgb_colors=cloud.colours,
        normals_points=cloud.normals,
    )
    p_b = str(tmp_path / "stream.ply")
    save_point_cloud_ply(cloud, p_b)
    assert open(p_a, "rb").read() == open(p_b, "rb").read()
