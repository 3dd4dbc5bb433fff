"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "spatial"),
    devices=None,
) -> Mesh:
    """Mesh over available devices; default splits them data x spatial.

    With n devices and no shape given: spatial gets 2 when n is even and
    > 2 (halo exchange needs a ring), data gets the rest.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if shape is None:
        spatial = 2 if (n % 2 == 0 and n > 2) else 1
        shape = (n // spatial, spatial)
    assert shape[0] * shape[1] == n, (shape, n)
    return Mesh(devs.reshape(shape), axis_names)


def stream_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for stream-batched arrays/pytrees."""
    return NamedSharding(mesh, P(axis))
