"""Device-mesh construction and sharding helpers.

Axes convention (scaling-book style):
- ``data``  — batch / frame parallelism (gradient psum rides ICI);
- ``model`` — reserved for tensor/point sharding of the network and for
  keyframe-block sharding of the pose-graph backend.

``jax.jit`` with ``NamedSharding`` annotations lets GSPMD insert the
collectives; nothing here hand-schedules communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape ``(n_data, n_model)`` with axes ``("data", "model")``.

    Defaults to all visible devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over ``data``, rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
