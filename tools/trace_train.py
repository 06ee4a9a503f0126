"""Capture a jax.profiler trace of the train step and print per-op totals.

With ``--out docs/step_profile.json`` the per-op breakdown is written as a
captured artifact (VERDICT r4 item 4): top device ops of one train step with
ms and %, plus the step total — so "the step is gather-bound" is auditable
as numbers rather than commit-message prose, and the remaining headroom
(step time minus accounted op time) is a number.
"""

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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out_path = sys.argv[i + 1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    bsz = int(args[0]) if args else 32
    dtype = args[1] if len(args) > 1 else "float32"
    n, k_steps = 8192, 4
    cfg = TrainConfig(model=scaled_model_config(n, compute_dtype=dtype))
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

    if out_path:
        per_step = grand / 1000.0 / k_steps
        artifact = {
            "config": {"batch": bsz, "k_steps": k_steps, "num_points": n,
                       "compute_dtype": dtype},
            "total_device_ms_per_step": round(per_step, 3),
            "note": "durations are device-lane op totals from jax.profiler "
                    "over one K-step dispatch, divided by K; '%' is of the "
                    "accounted total",
            "ops": [
                {"op": name, "ms_per_step": round(dur / 1000.0 / k_steps, 3),
                 "pct": round(100.0 * dur / grand, 1), "count": counts[name]}
                for name, dur in totals.most_common(30)
            ],
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
