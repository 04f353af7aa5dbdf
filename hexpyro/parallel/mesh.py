"""Multi-chip scaling: shard the case batch over a device mesh.

The reference's only parallelism is process-level data parallelism over
independent reactor conditions via multiprocessing.Pool with filesystem fan-in
(simul_data_gene_fix_chain_2D.py:234-248). The TPU-native equivalent collapses
all of that into sharding annotations: a 1-D `Mesh` over axis "cases", the
batch axis of every per-case array sharded across it, mechanism arrays and
model parameters replicated. XLA inserts the collectives (a single psum when a
loss/metric is reduced across devices); trajectories stay resident on their
device until gathered.

Works identically on a real TPU pod slice (ICI) and on the virtual 8-device CPU
mesh used in tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CASES_AXIS = "cases"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CASES_AXIS,))


def case_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the case batch."""
    return NamedSharding(mesh, P(CASES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_cases(tree, mesh: Mesh):
    """Device_put every leaf with its leading axis sharded over the mesh."""
    sh = case_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad the case axis so it divides the mesh size; returns (padded, n_orig)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(arr), widths, mode="edge"), n
