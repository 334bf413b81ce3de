"""Device-mesh placement for the replica ensemble.

The scaling axis of this workload is the (P,T) replica grid (SURVEY.md
§2.2): replicas are independent between tempering events, so the leading
replica axis of every ensemble array is laid out over a 1-D ``replica``
mesh with NamedSharding and the GSPMD partitioner splits the whole jitted
sampling scan. Tempering exchanges only need (R,) scalars, which the
partitioner materializes via an ICI all-gather — no hand-written
collectives required (the reference's dask gather/scatter, SURVEY.md §2.3,
has no analogue here).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_replica_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ("replica",))


def shard_ensemble(mesh: Mesh, states, nls=None):
    """Place leading (replica) axis of the ensemble over the mesh."""
    rep = NamedSharding(mesh, P("replica"))

    def put(x):
        spec = P("replica") if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    states = jax.tree.map(put, states)
    if nls is None:
        return states
    nls = jax.tree.map(put, nls)
    return states, nls


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
