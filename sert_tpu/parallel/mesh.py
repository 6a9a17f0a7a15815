"""Mesh construction over the available devices."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "model")


def make_mesh(shape: Tuple[int, int] = (1, 1),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh of the given shape.

    ``shape=(-1, m)`` / ``(d, -1)`` infers one axis from the device count.
    On a single chip a (1, 1) mesh makes the sharded code paths identical to
    the unsharded ones, so everything runs unchanged from 1 to N devices.
    """
    devs = list(devices) if devices is not None else jax.devices()
    d, m = shape
    if d == -1 and m == -1:
        raise ValueError("at most one mesh axis may be -1")
    if d == -1:
        d = len(devs) // m
    if m == -1:
        m = len(devs) // d
    if d * m > len(devs):
        raise ValueError(f"mesh {d}x{m} needs {d*m} devices, have {len(devs)}")
    grid = np.asarray(devs[:d * m]).reshape(d, m)
    return Mesh(grid, AXES)
