"""gs2pc — TPU-native 3D-Gaussian-Splatting → point-cloud / mesh converter.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Lewis-Stuart-11/3DGS-to-PC (reference layout: flat torch/CUDA pipeline).
Everything device-side is expressed as pure functions over pytrees under
`jax.jit`; the renderer and sampler are fixed-shape, sort/segment-reduction
based programs instead of the reference's CUDA atomics + dynamic-shape torch.

Subpackages
-----------
- ``gs2pc.models``   — Gaussian scene pytree (factor-based covariances).
- ``gs2pc.ops``      — compute ops: projection, tile rasterizer, sampler, SH,
                       closed-form 3x3 eigenvalues, quaternions.
- ``gs2pc.parallel`` — device-mesh sharding of the camera sweep and sampler.
- ``gs2pc.io``       — PLY/.splat/COLMAP/transforms.json/mask host I/O.
- ``gs2pc.utils``    — settings, config-file CLI parsing, logging.
"""

from gs2pc.version import __version__

__all__ = ["__version__"]
