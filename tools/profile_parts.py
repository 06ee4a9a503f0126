"""Micro-profile the pieces of the PWCLO-Net train step on the real chip.

The axon tunnel adds ~200 ms per dispatch+sync, so every op is measured
amortized: a ``lax.scan`` repeats it K times inside ONE compiled program and
the per-iteration cost is (t_K - t_1) / (K - 1) — pure chip time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu import ops
from pwclonet_pylidarslam_tpu.models import scaled_model_config
from pwclonet_pylidarslam_tpu.train.losses import pwclonet_loss
from pwclonet_pylidarslam_tpu.train.state import TrainConfig, create_train_state

K = 16


def _run(fn, args, reps):
    out = fn(*args)  # compile
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def timeit(name, body, *args, reps=2):
    """body(*args) -> pytree with at least one array leaf; scanned K times
    with a data dependency so XLA cannot elide iterations."""

    def scanned(k):
        def f(*a):
            def step(carry, _):
                # carry-dependent perturbation of the first float arg defeats
                # loop-invariant code motion (otherwise XLA hoists the body)
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

    t1 = _run(scanned(1), args, reps)
    tk = _run(scanned(K), args, reps)
    per = (tk - t1) / (K - 1) * 1000
    print(f"{name:44s}: {per:9.2f} ms/iter   (1x={t1*1000:7.1f} ms, {K}x={tk*1000:8.1f} ms)")
    return per


def main():
    B, N = 32, 8192
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)

    timeit("fps B=32 8192->2048 (pallas)", lambda p: ops.furthest_point_sample(p, 2048), x1)
    idx0 = jax.jit(lambda p: ops.furthest_point_sample(p, 2048))(x1)
    q = jnp.take_along_axis(x1, idx0[..., None], axis=1)
    timeit("knn approx (2048q, 8192ref, k=32)", lambda a, b: ops.knn(a, b, 32, approx=True), q, x1)
    timeit("knn exact  (2048q, 8192ref, k=32)", lambda a, b: ops.knn(a, b, 32, approx=False), q, x1)
    _, kidx = jax.jit(lambda a, b: ops.knn(a, b, 32, approx=True))(q, x1)
    timeit("group_points (2048,32,3)", ops.group_points, x1, kidx)
    feat16 = jnp.asarray(rng.normal(size=(B, N, 16)), jnp.float32)
    timeit("group_points (2048,32,16)", ops.group_points, feat16, kidx)
    timeit("grad group_points (scatter-add)",
           jax.grad(lambda p, i: jnp.sum(ops.group_points(p, i) ** 2)), feat16, kidx)

    cfg = TrainConfig(model=scaled_model_config(N))
    model, state = create_train_state(cfg, jax.random.key(0))

    timeit("forward B=32 train=False",
           lambda p, bs, a, b: model.apply({"params": p, "batch_stats": bs}, a, b, train=False),
           state.params, state.batch_stats, x1, x2)

    gt = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros((B, 3)), jnp.ones((B, 1)), jnp.zeros((B, 3))], -1),
        (B, 7))

    def loss_val(p, lp, bs, a, b):
        (pred, _), _m = model.apply(
            {"params": p, "batch_stats": bs}, a, b, train=True,
            rngs={"dropout": jax.random.key(0)}, mutable=["batch_stats"])
        loss, _ = pwclonet_loss(lp, pred, gt, cfg.loss)
        return loss

    timeit("fwd(train)+loss B=32",
           loss_val, state.params, state.loss_params, state.batch_stats, x1, x2)
    timeit("loss+grad B=32",
           lambda p, lp, bs, a, b: jax.grad(loss_val, argnums=(0, 1))(p, lp, bs, a, b)[0],
           state.params, state.loss_params, state.batch_stats, x1, x2)


if __name__ == "__main__":
    main()
