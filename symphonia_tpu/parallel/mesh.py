"""Device mesh + sharding for the batched decode pipeline.

The decode workload is embarrassingly parallel at the subframe-lane level
(SURVEY.md §2.5), so the distribution strategy is a 1-D/2-D
``jax.sharding.Mesh``: the ``dp`` axis shards the lane/frame batch, the
optional ``tp`` axis shards the channel/sample dimensions of the dense
stage. XLA inserts the (only) needed collective — the gather of decoded PCM
back to host — over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, dp: Optional[int] = None, tp: int = 1
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [L, ...] lane-batched tensor over the dp axis."""
    return NamedSharding(mesh, P("dp"))


def lane_sharding_2d(mesh: Mesh) -> NamedSharding:
    """Shard [L, N] over (dp, tp)."""
    return NamedSharding(mesh, P("dp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Zero-pad an axis to a multiple (lanes must divide evenly across dp)."""
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths)
