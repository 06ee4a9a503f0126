"""Verify + benchmark the fused Pallas kNN kernel vs the approx_min_k path."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.ops.pallas.knn_kernel import (
    knn_approx_pallas,
    knn_supported,
)
from pwclonet_pylidarslam_tpu.ops.knn import pairwise_sqdist

K_SCAN = 16


def timeit(name, body, *args, reps=2):
    def scanned(kk):
        def f(*a):
            def step(carry, _):
                a_dep = list(a)
                a_dep[0] = a_dep[0] + carry * 1e-30
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
    tk = _run(scanned(K_SCAN))
    per = (tk - t1) / (K_SCAN - 1) * 1000
    print(f"{name:46s}: {per:9.2f} ms/iter")
    return per


def main():
    rng = np.random.default_rng(0)
    for (b, s, n, k) in [(32, 2048, 8192, 32), (32, 2048, 2048, 6), (32, 64, 256, 16)]:
        q = jnp.asarray(rng.normal(size=(b, s, 3)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        assert knn_supported(s, n, k, 3)
        d_got, i_got = jax.jit(lambda a, bb: knn_approx_pallas(a, bb, k))(q, r)
        d_got, i_got = np.asarray(d_got), np.asarray(i_got)
        # exact oracle
        dist = np.asarray(pairwise_sqdist(q, r))
        i_true = np.argsort(dist, axis=-1)[..., :k]
        d_true = np.take_along_axis(dist, i_true, axis=-1)
        # recall
        recall = np.mean(
            [
                len(set(i_got[bb, ss]) & set(i_true[bb, ss])) / k
                for bb in range(0, b, 8)
                for ss in range(0, s, max(1, s // 16))
            ]
        )
        # self-consistency: reported dists must equal true dists of indices
        d_of_idx = np.take_along_axis(dist, i_got, axis=-1)
        maxerr = np.max(np.abs(d_of_idx - d_got))
        asc = np.all(np.diff(d_got, axis=-1) >= -1e-6)
        uniq = all(
            len(set(i_got[bb, ss])) == k
            for bb in range(0, b, 8)
            for ss in range(0, s, max(1, s // 8))
        )
        print(
            f"(S={s},N={n},k={k}): recall={recall:.3f} maxerr={maxerr:.2e} "
            f"ascending={asc} unique={uniq}"
        )
        assert maxerr < 1e-3 and asc and uniq
        assert recall > (0.99 if n <= 512 else 0.9)

        timeit(f"pallas knn (S={s},N={n},k={k})",
               lambda a, bb: knn_approx_pallas(a, bb, k), q, r)
        timeit(
            f"approx_min_k (S={s},N={n},k={k})",
            lambda a, bb: jax.lax.approx_min_k(pairwise_sqdist(a, bb), k), q, r,
        )


if __name__ == "__main__":
    main()
