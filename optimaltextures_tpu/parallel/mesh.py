"""Device mesh helpers.

The reference has no distributed code at all (SURVEY §2.2); scaling here is
jax-native: a 1-D mesh whose axes carry batch data-parallelism ("data") and
optionally spatial sharding ("space") for very large single images. All
collectives ride ICI via shard_map/psum — there is no separate backend.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC batch-axis sharding."""
    return NamedSharding(mesh, P(axis, None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
