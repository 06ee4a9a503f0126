"""Shape/NaN contract checks (ref ``slam/common/utils.py:30-198``).

The reference's pervasive ``check_tensor`` shape contracts become thin chex
wrappers so they compose with jit (checks are trace-time for shapes,
disabled-inside-jit for values).
"""

from __future__ import annotations

from typing import Sequence

import chex
import jax
import jax.numpy as jnp
import numpy as np


def check_tensor(x, shape: Sequence[int], name: str = "tensor"):
    """Assert shape with -1 wildcards (ref ``check_tensor:54-76``)."""
    actual = tuple(x.shape)
    if len(actual) != len(shape):
        raise AssertionError(f"{name}: rank {len(actual)} != expected {len(shape)}")
    for i, (a, e) in enumerate(zip(actual, shape)):
        if e != -1 and a != e:
            raise AssertionError(f"{name}: dim {i} is {a}, expected {e} ({actual} vs {shape})")
    return x


def assert_debug(condition: bool, message: str = ""):
    """(ref ``assert_debug:30``)"""
    if not condition:
        raise AssertionError(message or "assert_debug failed")


def remove_nan(points: np.ndarray) -> np.ndarray:
    """Drop non-finite rows, host-side (ref ``remove_nan:171``)."""
    return points[np.isfinite(points).all(axis=-1)]


def scrub_nonfinite(x: jax.Array, fill: float = 0.0) -> jax.Array:
    """In-graph non-finite scrub (fixed shapes; the jit-side counterpart)."""
    return jnp.where(jnp.isfinite(x), x, fill)
