"""Benchmark + verify the Pallas gather/scatter-add kernel vs XLA."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.ops.pallas.gather_kernel import (
    gather_rows,
    scatter_add_rows,
)

K = 16


def timeit(name, body, *args, reps=2):
    def scanned(k):
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

            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=k)
            return acc

        return jax.jit(f)

    def _run(fn, reps):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out.ravel()[:1])
        return (time.perf_counter() - t0) / reps

    t1 = _run(scanned(1), reps)
    tk = _run(scanned(K), reps)
    per = (tk - t1) / (K - 1) * 1000
    print(f"{name:46s}: {per:9.2f} ms/iter")
    return per


def main():
    rng = np.random.default_rng(0)
    B, N, M = 32, 8192, 65536
    for C in (3, 16):
        src = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(B, M)), jnp.int32)
        # correctness
        got = np.asarray(jax.jit(gather_rows)(src, idx))
        want = np.asarray(
            jnp.take_along_axis(src, idx[..., None], axis=1)
        )
        assert np.array_equal(got, want), f"gather mismatch C={C}"
        upd = jnp.asarray(rng.normal(size=(B, M, C)), jnp.float32)
        got_s = np.asarray(jax.jit(lambda u, i: scatter_add_rows(u, i, N))(upd, idx))
        want_s = np.asarray(
            jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], idx].add(upd)
        )
        err = np.max(np.abs(got_s - want_s))
        assert err < 1e-3, f"scatter mismatch C={C}: {err}"
        print(f"C={C}: correctness OK (scatter maxerr {err:.2e})")

        timeit(f"pallas gather  (B{B} M{M} C{C})", gather_rows, src, idx)
        timeit(
            f"xla    gather  (B{B} M{M} C{C})",
            lambda s, i: jnp.take_along_axis(s, i[..., None], axis=1),
            src, idx,
        )
        timeit(f"pallas scatter (B{B} M{M} C{C})",
               lambda u, i: scatter_add_rows(u, i, N), upd, idx)
        timeit(
            f"xla    scatter (B{B} M{M} C{C})",
            lambda u, i: jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], i].add(u),
            upd, idx,
        )


if __name__ == "__main__":
    main()
