"""Capture a jax.profiler trace of the train step and print per-op totals."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.models import scaled_model_config
from pwclonet_pylidarslam_tpu.train.state import (
    TrainConfig,
    create_train_state,
    train_steps,
)


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n, k_steps = 8192, 4
    cfg = TrainConfig(model=scaled_model_config(n))
    model, state = create_train_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    block = {
        "xyz1": jnp.asarray(rng.normal(size=(k_steps, bsz, n, 3)), jnp.float32),
        "xyz2": jnp.asarray(rng.normal(size=(k_steps, bsz, n, 3)), jnp.float32),
        "gt_params": jnp.broadcast_to(
            jnp.concatenate(
                [jnp.zeros((bsz, 3)), jnp.ones((bsz, 1)), jnp.zeros((bsz, 3))], -1
            ),
            (k_steps, bsz, 7),
        ),
    }
    fn = jax.jit(lambda s, b, r: train_steps(model, cfg, s, b, r), donate_argnums=0)
    state, _ = fn(state, block, jax.random.key(1))
    np.asarray(state.step)
    trace_dir = "/tmp/train_trace"
    with jax.profiler.trace(trace_dir):
        state, _ = fn(state, block, jax.random.key(2))
        np.asarray(state.step)

    time.sleep(2)
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    totals = collections.Counter()
    counts = collections.Counter()
    import re

    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X":
                name = ev.get("name", "?")
                if name.startswith("$") or name.startswith("jit_") or name in (
                    "np.asarray(jax.Array)",
                ) or name.startswith("while") or name.startswith("PjitFunction"):
                    continue
                cat = re.sub(r"[._]\d+$", "", name)
                totals[cat] += ev.get("dur", 0)
                counts[cat] += 1
    grand = sum(totals.values())
    print(f"total device op time: {grand/1000.0:.1f} ms")
    for name, dur in totals.most_common(40):
        print(f"{dur/1000.0:10.2f} ms  x{counts[name]:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
