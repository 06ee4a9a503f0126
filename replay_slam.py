#!/usr/bin/env python
"""Re-run a saved SLAM experiment from its persisted config
(replacement for the reference's ``replay.py``).

Usage::

    python replay_slam.py <run_dir> [overrides...] [start=N] [length=M]

Reads ``<run_dir>/config.yaml`` (written by ``run_slam.py``), applies any
``key=value`` overrides, optionally windows the sequence (``start``/
``length``), and re-executes into ``<run_dir>/replay``.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    import yaml

    from run_slam import RunConfig, build_sources
    from pwclonet_pylidarslam_tpu.slam.pipeline import SLAMConfig
    from pwclonet_pylidarslam_tpu.slam.runner import SLAMRunner, SLAMRunnerConfig
    from pwclonet_pylidarslam_tpu.utils.config import apply_overrides, from_dict

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    run_dir = argv[0]
    with open(os.path.join(run_dir, "config.yaml")) as f:
        saved = yaml.safe_load(f)["config"]

    extra = [a for a in argv[1:] if "=" in a]
    window = {}
    overrides = []
    for a in extra:
        k, v = a.split("=", 1)
        if k in ("start", "length"):
            window[k] = int(v)
        else:
            overrides.append(a)
    saved = apply_overrides(saved, overrides)
    config = from_dict(RunConfig, saved)

    sources = build_sources(config)
    if window:
        start = window.get("start", 0)
        length = window.get("length")

        class _Window:
            def __init__(self, src):
                self.src = src
                self.n = len(src) - start if length is None else min(length, len(src) - start)

            def __len__(self):
                return self.n

            def scan(self, i):
                return self.src.scan(start + i)

            def ground_truth(self):
                gt = self.src.ground_truth()
                return None if gt is None else gt[start : start + self.n]

        sources = {k: _Window(v) for k, v in sources.items()}

    out_dir = os.path.join(run_dir, "replay")
    runner = SLAMRunner(
        SLAMRunnerConfig(
            slam=SLAMConfig(
                with_loop_closure=config.with_loop_closure,
                with_backend=config.with_backend,
            ),
            log_dir=out_dir,
        )
    )
    results = runner.run(sources)
    for name, md in results.items():
        if md:
            print(f"{name}: ATE={md['ATE']:.4f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
