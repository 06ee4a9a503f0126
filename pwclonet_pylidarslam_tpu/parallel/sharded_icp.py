"""Point-sharded rigid alignment: ICP's Gauss-Newton over a device mesh.

New capability vs the reference (SURVEY §2.8/§7: the reference's rigid
alignment, ``slam/odometry/alignment.py`` + ``slam/common/optimization.py``,
is strictly single-device). Here the correspondence set of one alignment is
sharded over a mesh axis: each device builds the normal-equation
contributions (Hₖ, gₖ) of its point shard, a psum rides ICI, and every device
solves the identical replicated 6×6 system. Communication per GN iteration is
one psum of 6×6+6 floats — the solve is compute-bound even for huge frames
(the "shard points of large frames across devices" design target).

Numerics match the single-device solver exactly (same psum'd sums, HIGHEST
precision einsums); see ``tests/test_parallel.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pwclonet_pylidarslam_tpu.core import se3
from pwclonet_pylidarslam_tpu.core.optimization import (
    SE3GNResult,
    gauss_newton_se3,
    point_to_plane_residual_jac,
    point_to_point_residual_jac,
)


def _solve_sharded(residual_jac, source, target, aux, mask, init_pose, mesh, axis, gn_kwargs):
    n_dev = mesh.shape[axis]
    b, n = source.shape[:2]
    if n % n_dev != 0:
        raise ValueError(f"point count {n} not divisible by mesh axis {axis}={n_dev}")
    if init_pose is None:
        init_pose = se3.identity_pose((b,), source.dtype)
    if mask is None:
        mask = jnp.ones((b, n), source.dtype)

    pt = P(None, axis)  # (B, N, ...) sharded over the point axis
    in_specs = (P(), pt, pt, pt, pt) if aux is not None else (P(), pt, pt, pt)
    args = (init_pose, source, target) + ((aux,) if aux is not None else ()) + (mask,)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P())
    def run(init_pose, source, target, *rest):
        fn = functools.partial(residual_jac, source=source, target=target)
        if aux is not None:
            fn = functools.partial(fn, normals=rest[0], mask=rest[1])
        else:
            fn = functools.partial(fn, mask=rest[0])
        return gauss_newton_se3(fn, init_pose, psum_axis=axis, **gn_kwargs)

    return run(*args)


def solve_point_to_plane_sharded(
    source: jax.Array,
    target: jax.Array,
    normals: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
    init_pose: Optional[jax.Array] = None,
    axis: str = "data",
    **gn_kwargs,
) -> SE3GNResult:
    """Point-to-plane rigid alignment with ``source/target/normals (B,N,3)``
    (and ``mask (B,N)``) sharded over ``mesh`` axis ``axis`` on the N axis.

    Drop-in for :func:`core.optimization.solve_point_to_plane`; all returned
    leaves are replicated.
    """
    return _solve_sharded(
        point_to_plane_residual_jac, source, target, normals, mask,
        init_pose, mesh, axis, gn_kwargs,
    )


def solve_point_to_point_sharded(
    source: jax.Array,
    target: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
    init_pose: Optional[jax.Array] = None,
    axis: str = "data",
    **gn_kwargs,
) -> SE3GNResult:
    """Point-to-point variant (drop-in for ``solve_point_to_point``)."""
    return _solve_sharded(
        point_to_point_residual_jac, source, target, None, mask,
        init_pose, mesh, axis, gn_kwargs,
    )
