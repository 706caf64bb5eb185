"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "shards") -> Mesh:
    """1-D mesh over the first n devices (default: all). The single mesh
    axis carries the corpus/partition shard dimension; query batch stays
    replicated (data-parallel variants put it on a second axis)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def make_mesh_2d(n_shard: int, n_data: int,
                 shard_axis: str = "shards",
                 data_axis: str = "data") -> Mesh:
    """2-D mesh: partition axis x query-data axis."""
    devs = jax.devices()
    need = n_shard * n_data
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_shard, n_data)
    return Mesh(arr, axis_names=(shard_axis, data_axis))
