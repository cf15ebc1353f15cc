"""Device-mesh construction and sharding helpers.

The reference has zero parallelism (one JS thread, SURVEY.md §2); this module
is the framework's scaling substrate: batched multi-stream decode lays out
  * ``dp``  — independent AVI streams (the data-parallel axis), and
  * ``gop`` — keyframe-delimited GOPs within a stream (the sequence/context-
    parallel axis; GOPs are independent decode chains, the reference's only
    independent unit — DataLoader.GetNearestKeyframe, DataLoader.hx:125-132)
over a `jax.sharding.Mesh`.  Collectives ride ICI via XLA from sharding
annotations; nothing here issues explicit NCCL-style calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    gop: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, gop) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // gop
    assert dp * gop == n, f"dp({dp})*gop({gop}) != ndevices({n})"
    arr = np.array(devices).reshape(dp, gop)
    return Mesh(arr, ("dp", "gop"))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, ...] tensors: streams over dp, time/GOP over gop."""
    return NamedSharding(mesh, P("dp", "gop"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] tensors: streams over dp, replicated over gop."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
