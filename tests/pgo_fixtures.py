"""Shared pose-graph test fixtures (circle trajectory + drifted odometry).

Lives in its own module (imported as plain ``pgo_fixtures`` via pytest's
test-dir sys.path insertion) because importing it as ``tests.test_backend``
is ambiguous: the ref-parity shim appends ``/root/reference`` to ``sys.path``
and the reference also ships a ``tests/test_backend.py``, so the namespace
package ``tests`` can resolve to the WRONG tree mid-suite.
"""

import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core import se3


def circle_poses(n, radius=20.0):
    """Ground-truth circular trajectory (yaw tangent to the circle)."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    for t in range(n):
        a = 2 * np.pi * t / n
        c, s = np.cos(a), np.sin(a)
        poses[t, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses[t, :3, 3] = [radius * s, radius * (1 - c), 0]
    return poses


def drifted_odometry(gt, rng, noise_rot=0.002, noise_trans=0.02):
    """Relative GT poses corrupted by noise → drifting absolute chain."""
    rels = []
    for t in range(1, len(gt)):
        rel = np.linalg.inv(gt[t - 1]) @ gt[t]
        noise = np.concatenate(
            [rng.normal(scale=noise_trans, size=3), rng.normal(scale=noise_rot, size=3)]
        )
        rels.append(rel @ np.asarray(se3.exp(jnp.asarray(noise))))
    absolute = [gt[0]]
    for r in rels:
        absolute.append(absolute[-1] @ r)
    return np.stack(absolute), rels
