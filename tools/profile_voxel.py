"""Profile the voxel-mode ICP per-frame cost and its parts on the chip."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 16


def timeit(name, body, *args, reps=2):
    def scanned(kk):
        def f(*a):
            def step(carry, _):
                a_dep = list(a)
                for j, arr in enumerate(a_dep):
                    if isinstance(arr, jax.Array) and jnp.issubdtype(
                        arr.dtype, jnp.floating
                    ):
                        a_dep[j] = arr + carry * 1e-30
                        break
                out = body(*a_dep)
                leaf = jax.tree.leaves(out)[0]
                return carry + jnp.sum(leaf).astype(jnp.float32), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=kk)
            return acc

        return jax.jit(f)

    def _run(fn):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out.ravel()[:1])
        return (time.perf_counter() - t0) / reps

    t1 = _run(scanned(1))
    tk = _run(scanned(K))
    per = (tk - t1) / (K - 1) * 1000
    print(f"{name:50s}: {per:9.2f} ms/iter")
    return per


def main():
    from pwclonet_pylidarslam_tpu.slam import local_map as lm
    from pwclonet_pylidarslam_tpu.core.pointcloud import grid_sample_mask

    rng = np.random.default_rng(0)
    m = 20 * 4096  # keyframes x stride-2 points
    pts = jnp.asarray(rng.uniform(-80, 80, size=(m, 3)), jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    ok = jnp.ones((m,), jnp.float32)
    table_size, cap = 1 << 14, 64
    cell = 3.0  # 2*voxel_size (neighborhood=8)

    timeit("grid_sample_mask (82k, 0.45m)",
           lambda p: grid_sample_mask(p, 0.45, valid=ok), pts)
    timeit("build_voxel_table (82k -> 2^14 x 64)",
           lambda p: lm.build_voxel_table(p, nrm, ok, cell, table_size, cap).points,
           pts)

    table = jax.jit(
        lambda p: lm.build_voxel_table(p, nrm, ok, cell, table_size, cap)
    )(pts)
    q = jnp.asarray(rng.uniform(-60, 60, size=(8192, 3)), jnp.float32)
    timeit("gather_voxel_candidates (8192 q, nb=8)",
           lambda qq: lm.gather_voxel_candidates(table, qq, 1.5, neighborhood=8)[0],
           q)
    cand = jax.jit(
        lambda qq: lm.gather_voxel_candidates(table, qq, 1.5, neighborhood=8)
    )(q)
    timeit("nn_from_candidates (8192 x 512)",
           lambda qq: lm.nn_from_candidates(cand[0], cand[1], qq, 1.5)[0], q)
    timeit("voxel_nn full (8192 q)",
           lambda qq: lm.voxel_nn(table, qq, 1.5, 1.5, neighborhood=8)[0], q)


if __name__ == "__main__":
    main()
