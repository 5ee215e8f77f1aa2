"""Device mesh construction and sharding helpers.

The reference's "distribution" is four ROS processes on one machine
(SURVEY §2.6); here scale-out is a `jax.sharding.Mesh`: the keyframe/time
axis ("kf") shards pose-graph BA and keyframe banks, the map/space axis
("map") shards point banks for KNN and dense mapping.  Collectives ride ICI
via XLA (psum/all_gather inserted by jit over NamedSharding, or explicit in
shard_map code).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(kf: int, map_: int) -> Mesh:
    devs = np.array(jax.devices()[: kf * map_]).reshape(kf, map_)
    return Mesh(devs, ("kf", "map"))


def shard_leading(mesh: Mesh, x, axis: str = "kf"):
    """Place array(s) with the leading dim sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def replicated(mesh: Mesh, x):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)
