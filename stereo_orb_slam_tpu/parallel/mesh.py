"""Device-mesh helpers.

The reference has no distributed layer at all (single process, single
thread; SURVEY.md §0) — this module provides the TPU-native scaling story
per BASELINE.json: `jax.sharding.Mesh` over a slice, observation/edge
dimensions sharded, model state replicated, collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


OBS_AXIS = "obs"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = OBS_AXIS) -> Mesh:
    """1-D mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def obs_sharding(mesh: Mesh, axis_name: str = OBS_AXIS) -> NamedSharding:
    """Shard the leading (observation/edge) dimension."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
