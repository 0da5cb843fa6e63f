"""Device-mesh runtime: shard the problems/seeds batch over TPU chips.

This layer is *new design* relative to the reference (which is single-GPU,
SURVEY §2.3): the flattened problems x seeds/particles axis is sharded over
a `jax.sharding.Mesh`; horizon/dof stay local per device. Cross-seed
reductions (topk/argmin, MPPI softmax normalization, line-search select)
happen inside each problem's shard-local block, so the solve is
embarrassingly parallel over problems and XLA inserts collectives only for
global metrics (success counts) — those ride ICI via psum.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (problems) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_problems(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place a pytree with leading problem axes on the mesh (leading-axis
    sharded). Scalar/0-d leaves are replicated."""
    shard = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.devices.size != 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, shard)

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), repl), tree)
