"""Measure the fast-lane deep-gate accuracy spread across repeat runs.

Runs the exact recipe of
``tests/test_deep_odometry_accuracy.py::run_fast_lane_recipe`` N times with
different init/shuffle seeds on CPU and writes ``docs/deep_gate_spread.json``
— the machine-checkable artifact behind the test's absolute bar
(VERDICT r4 item 5: "the measured-spread claim is not recorded anywhere
machine-checkable"). The bar should sit clearly above the measured max ratio
and clearly below 0.5 (a net that learned only half the motion must fail).

Usage: JAX_PLATFORMS=cpu python tools/measure_deep_gate_spread.py [-n 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--same-seed", action="store_true",
                    help="repeat the test's exact seed-0 run N times (measures "
                         "XLA:CPU rerun nondeterminism, the spread the gate "
                         "must tolerate) instead of varying the init seed")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "deep_gate_spread.json"))
    args = ap.parse_args()

    from test_deep_odometry_accuracy import run_fast_lane_recipe

    runs = []
    for i in range(args.n):
        seed = 0 if args.same_seed else i
        t0 = time.perf_counter()
        r = run_fast_lane_recipe(run_seed=seed)
        runs.append(
            {"seed": seed, "ratio": round(r["ratio"], 4),
             "ates": [round(a, 4) for a in r["ates"]],
             "travel": round(r["travel"], 4),
             "final_loss": round(r["losses"][-1], 4),
             "wall_s": round(time.perf_counter() - t0, 1)}
        )
        print(json.dumps(runs[-1]), flush=True)

    ratios = [r["ratio"] for r in runs]
    out = {
        "recipe": "tests/test_deep_odometry_accuracy.py::run_fast_lane_recipe",
        "platform": "cpu (XLA:CPU — basin-level nondeterministic across threads)",
        "mode": "same-seed reruns (seed 0)" if args.same_seed else "varied init seeds",
        "n_runs": args.n,
        "ratios": ratios,
        "min": min(ratios), "max": max(ratios),
        "mean": round(sum(ratios) / len(ratios), 4),
        "gate": "tests/test_deep_odometry_accuracy.py asserts ratio < 0.35",
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
