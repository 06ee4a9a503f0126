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
    # measured (untraced) dispatch wall: the anchor every per-op share is
    # scaled against — the axon remote profiler's event durations are
    # instrumentation time (~36x wall on this tunnel), so only their
    # *relative* shares are trustworthy
    t0 = time.perf_counter()
    state, _ = fn(state, block, jax.random.key(2))
    np.asarray(state.step)
    step_ms = (time.perf_counter() - t0) * 1000.0 / k_steps
    print(f"measured untraced step wall: {step_ms:.2f} ms/step")
    trace_dir = "/tmp/train_trace"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)  # stale traces double-count
    with jax.profiler.trace(trace_dir):
        state, _ = fn(state, block, jax.random.key(3))
        np.asarray(state.step)

    time.sleep(2)
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    # Two independent hierarchy rows in the device trace, kept separate so
    # nothing is double-counted:
    #  - op rows: XLA instruction categories (fusion/copy/sort/custom calls)
    #  - scope rows: flax named scopes (SetConv_1, CostVolume_0, ...), which
    #    aggregate the same device time by model part
    # Module rows (bare-number names) span the whole program and are dropped.
    import re

    op_totals, op_counts = collections.Counter(), collections.Counter()
    scope_totals, scope_counts = collections.Counter(), collections.Counter()
    scope_re = re.compile(r"^[A-Z][A-Za-z]*_\d+$")
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
                if name.isdigit():  # module-row span
                    continue
                base = re.sub(r"\.\d+$", "", name)  # strip XLA clone suffix
                if scope_re.match(base):  # flax scope row (SetConv_1, ...)
                    scope_totals[base] += ev.get("dur", 0)
                    scope_counts[base] += 1
                else:
                    cat = re.sub(r"[._]\d+$", "", name)
                    op_totals[cat] += ev.get("dur", 0)
                    op_counts[cat] += 1
    grand = sum(op_totals.values())
    sgrand = sum(scope_totals.values())
    acct_ms = grand / 1000.0 / k_steps
    print(f"accounted device-op time: {acct_ms:.1f} ms/step of "
          f"{step_ms:.1f} ms/step wall ({100*acct_ms/step_ms:.0f}%)")
    for name, dur in op_totals.most_common(25):
        print(f"{100.0*dur/grand:5.1f}%  {dur/1000.0/k_steps:6.2f} ms/step  "
              f"x{op_counts[name]:5d}  {name[:80]}")
    print("-- by model scope --")
    for name, dur in scope_totals.most_common(15):
        print(f"{100.0*dur/sgrand:5.1f}%  x{scope_counts[name]:5d}  {name[:80]}")

    if out_path:
        artifact = {
            "config": {"batch": bsz, "k_steps": k_steps, "num_points": n,
                       "compute_dtype": dtype},
            "measured_step_ms": round(step_ms, 2),
            "pairs_per_s": round(bsz / (step_ms / 1000.0), 1),
            "accounted_op_ms_per_step": round(acct_ms, 2),
            "unaccounted_gap_ms_per_step": round(step_ms - acct_ms, 2),
            "note": "ops = XLA device-op durations over one K-step dispatch "
                    "(jax.profiler, per-step). unaccounted gap = step wall "
                    "minus summed op time: inter-op scheduling/dispatch "
                    "idle — the occupancy headroom. by_scope re-aggregates "
                    "the same device time by flax named scope (model part) "
                    "and is NOT additive with ops.",
            "ops": [
                {"op": name, "pct": round(100.0 * dur / grand, 1),
                 "ms_per_step": round(dur / 1000.0 / k_steps, 3),
                 "count": op_counts[name]}
                for name, dur in op_totals.most_common(25)
            ],
            "by_scope": [
                {"scope": name, "pct": round(100.0 * dur / sgrand, 1),
                 "count": scope_counts[name]}
                for name, dur in scope_totals.most_common(15)
            ],
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
