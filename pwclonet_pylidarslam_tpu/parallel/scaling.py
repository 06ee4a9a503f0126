"""Scaling-efficiency benchmark harness (north-star requirement).

Measures data-parallel training throughput (frame pairs/s) at mesh sizes
1..N over the visible devices and reports scaling efficiency
``eff(n) = throughput(n) / (n · throughput(1))``. The reference has no
distributed layer at all (SURVEY §2.8), so there is no baseline to beat —
the target is ≥80% efficiency (BASELINE.json).

Run on hardware::

    python -m pwclonet_pylidarslam_tpu.parallel.scaling            # all devices
    python -m pwclonet_pylidarslam_tpu.parallel.scaling --sizes 1,2,4,8

Prints one JSON line per mesh size plus a summary line. On a single-chip
environment this degenerates to the 1-chip row; on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) it validates the harness and
the collective structure, not absolute speed.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from pwclonet_pylidarslam_tpu.parallel.data_parallel import (
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from pwclonet_pylidarslam_tpu.parallel.mesh import make_mesh


@dataclass(frozen=True)
class ScalingConfig:
    num_points: int = 8192
    batch_per_device: int = 8
    warmup_steps: int = 2
    steps: int = 10
    sizes: Optional[Sequence[int]] = None  # default: 1, 2, 4, ... ≤ n_devices
    # tiny model plan for harness validation on CPU meshes
    tiny: bool = False


def _mesh_sizes(n_devices: int, sizes: Optional[Sequence[int]]) -> List[int]:
    if sizes is not None:
        return [s for s in sizes if s <= n_devices]
    out = []
    s = 1
    while s <= n_devices:
        out.append(s)
        s *= 2
    return out


def _make_batch(b: int, n: int, key) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "xyz1": jax.random.normal(k1, (b, n, 3)) * 8.0,
        "xyz2": jax.random.normal(k2, (b, n, 3)) * 8.0,
        "gt_params": jnp.tile(
            jnp.asarray([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]]), (b, 1)
        ),
    }


def measure_scaling(config: ScalingConfig = ScalingConfig()) -> List[Dict]:
    """Returns one record per mesh size:
    ``{"devices", "batch", "ms_per_step", "pairs_per_s", "efficiency"}``."""
    from pwclonet_pylidarslam_tpu.models import PWCLONetConfig
    from pwclonet_pylidarslam_tpu.train.state import TrainConfig, create_train_state

    devices = jax.devices()
    if config.tiny:
        model_cfg = PWCLONetConfig(
            num_points=256, sa_npoints=(64, 32, 16, 8), sa_nsamples=(8, 8, 8, 4)
        )
        n = 256
    else:
        model_cfg = PWCLONetConfig(num_points=config.num_points)
        n = config.num_points

    records: List[Dict] = []
    base_pairs_per_s = None
    for n_dev in _mesh_sizes(len(devices), config.sizes):
        mesh = make_mesh(n_data=n_dev, devices=devices[:n_dev])
        train_cfg = TrainConfig(model=model_cfg, total_steps=1000)
        model, state = create_train_state(train_cfg, jax.random.key(0))
        state = replicate_state(state, mesh)
        step = make_parallel_train_step(model, train_cfg, mesh)

        b = config.batch_per_device * n_dev
        batch = shard_batch(_make_batch(b, n, jax.random.key(1)), mesh)
        rng = jax.random.key(2)
        for _ in range(config.warmup_steps):
            state, log = step(state, batch, rng)
        jax.block_until_ready(state)

        t0 = time.perf_counter()
        for _ in range(config.steps):
            state, log = step(state, batch, rng)
        jax.block_until_ready(state)
        elapsed = time.perf_counter() - t0

        ms_per_step = elapsed / config.steps * 1000.0
        pairs_per_s = b * config.steps / elapsed
        if base_pairs_per_s is None:
            base_pairs_per_s = pairs_per_s
        records.append(
            {
                "devices": n_dev,
                "batch": b,
                "ms_per_step": round(ms_per_step, 3),
                "pairs_per_s": round(pairs_per_s, 2),
                "efficiency": round(pairs_per_s / (n_dev * base_pairs_per_s), 4),
            }
        )
    return records


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=str, default=None, help="comma list, e.g. 1,2,4,8")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch-per-device", type=int, default=8)
    parser.add_argument("--num-points", type=int, default=8192)
    parser.add_argument("--tiny", action="store_true", help="tiny model (harness validation)")
    parser.add_argument("--out", type=str, default=None,
                        help="also write the full record set to this JSON file")
    args = parser.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")] if args.sizes else None
    records = measure_scaling(
        ScalingConfig(
            num_points=args.num_points,
            batch_per_device=args.batch_per_device,
            steps=args.steps,
            sizes=sizes,
            tiny=args.tiny,
        )
    )
    for record in records:
        print(json.dumps(record))
    summary = None
    if len(records) > 1:
        summary = {
            "metric": "dp_scaling_efficiency",
            "max_devices": records[-1]["devices"],
            "efficiency": records[-1]["efficiency"],
        }
        print(json.dumps(summary))
    if args.out:
        payload = {
            "platform": jax.devices()[0].platform,
            "n_devices": len(jax.devices()),
            "tiny": args.tiny,
            "records": records,
        }
        if jax.devices()[0].platform == "cpu":
            # In-band caveat so the artifact can't be misread cold
            # (VERDICT r3 weak #5): virtual CPU devices share host cores,
            # so the efficiency column measures core contention, not ICI
            # scaling. Real multi-chip evidence needs TPU hardware.
            payload["note"] = (
                "CPU harness validation: virtual devices share host cores; "
                "efficiency rows are core-bound, not scaling evidence"
            )
        if summary is not None:
            payload["summary"] = summary
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
