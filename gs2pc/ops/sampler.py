"""Point-budget distribution + flat MVN sampling with Mahalanobis rejection.

Reference parity: gauss_to_pc.py:73-371 (distribute_points,
create_new_gaussian_points, generate_pointcloud).  TPU-first redesign:

* The reference bins Gaussians by similar point counts and loops bins x
  attempts on the host, sampling ``MultivariateNormal(mean, Sigma)`` and
  rejecting points with Mahalanobis distance > std (computed via
  ``torch.inverse`` + bmm, gauss_to_pc.py:92-103).

* Here every output point is generated in ONE fixed-shape program:
  a cumsum/searchsorted map assigns each output slot to its Gaussian, and
  each point draws ``x = mean_g + R_g (exp(s_g) * z)`` with ``z ~ N(0, I)``.
  Because ``x - mean = M z`` with ``Sigma = M M^T``, the Mahalanobis
  distance is exactly ``|z|`` — rejection becomes truncated-normal
  resampling with a static attempt count (lax.fori_loop), no matrix
  inverse, no PSD failure path, and exact per-Gaussian quotas.

* Binning (gauss_to_pc.py:105-138) existed only to batch torch's MVN;
  it is kept in gs2pc.ops.binning purely for capability parity.

The reference emits each Gaussian's centre as its first point
(gauss_to_pc.py:352-355); here rank-0 of each Gaussian's quota is the exact
centre.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gs2pc.models.gaussians import Gaussians
from gs2pc.ops.quaternion import quat_rotate


def distribute_points(
    gaussian_sizes: jnp.ndarray,
    num_points: int,
    mask: jnp.ndarray | None = None,
    exact: bool = False,
) -> jnp.ndarray:
    """Assign an integer point quota per Gaussian, proportional to size.

    Matches gauss_to_pc.py:73-90: round(sizes * N / sum(sizes)), then
    promote zero-quota Gaussians to 1 while budget remains.  (The reference
    slices with a possibly-negative length when rounding overshoots —
    a latent bug; we clamp the promotion count at zero.)

    ``mask`` marks Gaussians eligible for the zero-quota promotion: culled
    Gaussians ride along with size 0 (fixed-shape, no compaction) and must
    not be resurrected; the promotion order over eligible Gaussians is
    identical to running on a compacted array.

    ``exact=True`` (--exact_num_points) switches to largest-remainder
    apportionment: quota_i = floor(raw_i) plus one extra point for the
    ``num_points - sum(floor)`` largest fractional parts, so the quotas
    sum to EXACTLY ``num_points`` (the reference's intent at
    gauss_to_pc.py:616 — its 100-attempt loop can still over- or
    under-shoot; here the sampler meets every quota, so exactness is
    structural).  Ties and the zero-size exclusion are broken by index
    (deterministic).
    """
    gaussian_sizes = jnp.asarray(gaussian_sizes, jnp.float32)
    if mask is not None:
        gaussian_sizes = jnp.where(mask, gaussian_sizes, 0.0)
    total = jnp.sum(gaussian_sizes)
    ratio = num_points / jnp.maximum(total, 1e-20)
    raw = gaussian_sizes * ratio

    if exact:
        eligible = gaussian_sizes > 0.0
        base = jnp.floor(raw).astype(jnp.int32)
        base = jnp.where(eligible, base, 0)
        rem = jnp.int32(num_points) - jnp.sum(base)
        # Rank eligible Gaussians by fractional part, descending; the
        # first `rem` get one extra point.  rem <= #eligible whenever the
        # scene has >= num_points' worth of fractional mass; the final
        # clip guards degenerate scenes (fewer eligible than rem), where
        # the sampler's in-budget clamp keeps the count <= num_points.
        frac = jnp.where(eligible, raw - jnp.floor(raw), -1.0)
        order = jnp.argsort(-frac)  # stable: index breaks ties
        bump_rank = jnp.zeros_like(base).at[order].set(
            jnp.arange(base.shape[0], dtype=jnp.int32)
        )
        n_elig = jnp.sum(eligible.astype(jnp.int32))
        bump = eligible & (bump_rank < jnp.clip(rem, 0, n_elig))
        return base + bump.astype(jnp.int32)

    ppg = jnp.round(raw).astype(jnp.int32)
    deficit = num_points - jnp.sum(ppg)
    zeros = ppg == 0
    if mask is not None:
        zeros = zeros & mask
    zero_rank = jnp.cumsum(zeros.astype(jnp.int32)) - 1
    promote = jnp.clip(deficit, 0, jnp.sum(zeros.astype(jnp.int32)))
    return jnp.where(zeros & (zero_rank < promote), 1, ppg)


_SQRT_2_OVER_PI = 0.7978845608028654


def _chi3_cdf(r: jnp.ndarray) -> jnp.ndarray:
    """CDF of the chi distribution with 3 dof (radius of a standard MVN)."""
    return jax.scipy.special.erf(
        r * jnp.float32(1.0 / np.sqrt(2.0))
    ) - _SQRT_2_OVER_PI * r * jnp.exp(-0.5 * r * r)


def _chi3_truncated_radius(
    u: jnp.ndarray, std: jnp.ndarray, iters: int = 26
) -> jnp.ndarray:
    """Inverse CDF of chi_3 truncated to [0, std], via bisection.

    F is strictly increasing, so 26 branch-free bisection rounds pin the
    radius to std * 2^-26 — below f32 resolution for any practical std
    (Newton diverges in the flat tail when std >~ 4; bisection is robust
    for every truncation radius).  Pure (N,) elementwise VPU work."""
    t = u * _chi3_cdf(std)
    lo = jnp.zeros_like(u)
    # The chi_3 CDF saturates to 1.0 in f32 by r ~ 6, so radii beyond ~16
    # carry zero probability mass; clamping the bracket there keeps the
    # bisection resolution ABSOLUTE (~16 * 2^-26) even for an effectively
    # untruncated std like 1e8, where an [0, std] bracket would resolve to
    # whole units.
    hi_cap = jnp.minimum(jnp.asarray(std, u.dtype), jnp.asarray(16.0, u.dtype))
    hi = jnp.broadcast_to(hi_cap, u.shape)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        below = _chi3_cdf(mid) < t
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    return 0.5 * (lo + hi)


class SampledPoints(NamedTuple):
    """Fixed-capacity sampled point cloud (compact with ``valid``)."""

    points: jnp.ndarray  # (N_cap, 3) float32
    colours: Optional[jnp.ndarray]  # (N_cap, 3) f32; None w/o attributes
    normals: Optional[jnp.ndarray]  # (N_cap, 3) float32 or None
    gaussian_idx: jnp.ndarray  # (N_cap,) int32 source Gaussian
    valid: jnp.ndarray  # (N_cap,) bool — in budget AND accepted
    total: jnp.ndarray  # () int32 — sum of quotas (may exceed N_cap)


def sample_points(
    key: jax.Array,
    gaussians: Gaussians,
    points_per_gaussian: jnp.ndarray,
    n_cap: int,
    mahalanobis_std: float = 2.0,
    num_attempts: int = 5,
    max_points: int | None = None,
    with_attributes: bool = True,
) -> SampledPoints:
    """Draw every point of the cloud in one fixed-shape pass.

    Args:
        key: PRNG key.
        gaussians: scene (already filtered/validated).
        points_per_gaussian: (P,) int32 quotas (centre included in quota).
        n_cap: static output capacity; quota tails beyond it are dropped.
        mahalanobis_std: truncation radius in standard deviations
            (reference default 2.0, gauss_to_pc.py:636).
        num_attempts: unused, kept for API compatibility — the reference's
            5/100-attempt rejection loop (gauss_to_pc.py:535) is replaced
            by exact inverse-CDF sampling, which never drops a point (so
            exact_num_points needs no extra attempts either).
        max_points: optional hard cap on the emitted count (exact mode
            passes num_points so the output can never overshoot it).
        with_attributes: when False, skip gathering per-point colours and
            normals (returned as None) — callers that reconstruct
            attributes from per-Gaussian planes (pipeline.LazyPointCloud)
            save the widest part of the row gather.  Positions and
            gaussian_idx are bit-identical either way: the packed row
            layout puts xyz/scales/rots first, so dropping the attribute
            columns changes only the gather width.

    Returns:
        SampledPoints with ``valid`` marking accepted, in-budget points.
    """
    ppg = jnp.asarray(points_per_gaussian, jnp.int32)
    offsets = jnp.cumsum(ppg)
    total = offsets[-1] if ppg.shape[0] > 0 else jnp.int32(0)
    if max_points is not None:
        total = jnp.minimum(total, jnp.int32(max_points))
    P_num = gaussians.num_gaussians

    # Slot -> Gaussian map: scatter each Gaussian's id at its first slot,
    # cummax fills the runs (nondecreasing ids; zero-quota Gaussians share
    # a start with the real owner — max picks the owner).  ~6x cheaper
    # than a jnp.repeat expand, which in turn beat searchsorted+gather.
    pid = jnp.arange(n_cap, dtype=jnp.int32)
    start_slots = jnp.where(ppg > 0, offsets - ppg, n_cap)
    mark = jnp.zeros(n_cap + 1, jnp.int32).at[start_slots].max(
        jnp.arange(P_num, dtype=jnp.int32)
    )
    g = jax.lax.cummax(mark[:n_cap])
    in_budget = pid < total
    # A slot is a Gaussian centre iff it starts a new run.
    is_centre = jnp.concatenate(
        [in_budget[:1], g[1:] != g[:-1]]
    )

    # EXACT truncated-normal z, no rejection: the standard normal
    # restricted to the Mahalanobis ball ||z|| <= std is spherically
    # symmetric with radial density ~ r^2 exp(-r^2/2) (a truncated chi_3),
    # so direction = one normal draw normalised and radius = the inverse
    # chi_3 CDF of u * cdf(std) (bisection).  One PRNG pass replaces the
    # reference's 5/100-attempt rejection rounds (gauss_to_pc.py:192-273)
    # and, unlike them, never drops a point — every quota is met exactly.
    del num_attempts  # rejection retries are gone; kept for API compat
    std = jnp.float32(mahalanobis_std)
    kz, ku = jax.random.split(key)
    zn = jax.random.normal(kz, (n_cap, 3), dtype=jnp.float32)
    u = jax.random.uniform(ku, (n_cap,), dtype=jnp.float32)
    r = _chi3_truncated_radius(u, std)
    norm = jnp.sqrt(jnp.sum(zn * zn, axis=-1))
    z = zn * (r / jnp.maximum(norm, 1e-12))[:, None]

    # x = mean + R (exp(s) * z); centres use z = 0 exactly.  All per-
    # Gaussian attributes are packed into one row so the (N_cap,) map
    # costs a single row gather on TPU instead of five.
    z = jnp.where(is_centre[:, None], 0.0, z)
    cols = [gaussians.xyz, gaussians.log_scales, gaussians.rots]
    if with_attributes:
        cols.append(gaussians.colours)
        if gaussians.normals is not None:
            cols.append(gaussians.normals)
    packed = jnp.concatenate(cols, axis=1)[g]
    xyz_g = packed[:, 0:3]
    scales_g = jnp.exp(packed[:, 3:6])
    pts = xyz_g + quat_rotate(packed[:, 6:10], scales_g * z)

    valid = in_budget
    colours = packed[:, 10:13] if with_attributes else None
    normals = (
        packed[:, 13:16]
        if with_attributes and gaussians.normals is not None
        else None
    )
    return SampledPoints(
        points=pts,
        colours=colours,
        normals=normals,
        gaussian_idx=g,
        valid=valid,
        total=total,
    )


def generate_pointcloud(
    key: jax.Array,
    gaussians: Gaussians,
    num_points: int,
    contributions: Optional[jnp.ndarray] = None,
    mahalanobis_std: float = 2.0,
    exact_num_points: bool = False,
    n_cap: Optional[int] = None,
) -> SampledPoints:
    """Full point-generation driver (gauss_to_pc.py:277-371 equivalent).

    size -> distribute -> flat sample.  No binning: quotas are exact per
    Gaussian rather than bin midpoints, which strictly improves fidelity.
    ``exact_num_points`` switches to largest-remainder quotas plus a hard
    cap so the emitted count equals ``num_points`` exactly.
    """
    sizes = gaussians.magnitudes(contributions=contributions)
    ppg = distribute_points(sizes, num_points, exact=exact_num_points)
    if n_cap is None:
        # Rounding can overshoot the budget by at most ~P/2 in adversarial
        # cases; a 5% + 4096 margin makes truncation practically impossible.
        n_cap = int(num_points + max(4096, num_points // 20))
    attempts = 100 if exact_num_points else 5
    return sample_points(
        key,
        gaussians,
        ppg,
        n_cap=n_cap,
        mahalanobis_std=mahalanobis_std,
        num_attempts=attempts,
        max_points=num_points if exact_num_points else None,
    )


def mahalanobis(means: jnp.ndarray, samples: jnp.ndarray, covs: jnp.ndarray) -> jnp.ndarray:
    """Explicit Mahalanobis distance (parity with gauss_to_pc.py:92-103).

    Not used by the sampler (which gets the distance for free as |z|);
    provided for API completeness and testing.
    """
    delta = means - samples
    sol = jnp.linalg.solve(covs, delta[..., None])[..., 0]
    return jnp.sqrt(jnp.maximum(jnp.sum(delta * sol, axis=-1), 0.0))
