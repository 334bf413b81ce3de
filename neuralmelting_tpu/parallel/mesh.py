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


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join the JAX multi-controller runtime (one process per host, DCN
    coordination — SURVEY.md §2.3: the reference's dask Client/LocalCluster
    equivalent is the standard JAX distributed runtime, no custom comm
    backend). No-op when ``coordinator`` is None (single-process run).

    Call BEFORE any other jax use; afterwards ``jax.devices()`` is global
    and ``make_replica_mesh()`` spans every host's chips, so the same
    NamedSharding program scales out with zero further changes. Output
    writing is process-0-gated in runner.run_sampling via host_fetch().
    """
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def to_global(mesh: Mesh, tree):
    """Identical-per-process host trees -> replica-sharded GLOBAL arrays.

    Under the multi-controller runtime every process builds the same
    full-R ensemble (same config, same seed); this converts those
    replicated host values into one global array per leaf, sharded on
    the leading replica axis over ALL processes' devices, so a single
    jitted program (GSPMD) runs each replica shard on its own host.
    PRNG-key leaves are unwrapped/rewrapped around placement. Scalars
    and None pass through. Validated by the two-process localhost test
    (tests/test_multihost.py)."""
    import numpy as np_

    def put(x):
        if x is None or np_.ndim(x) == 0:
            return x
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(put(jax.random.key_data(x)))
        xh = np_.asarray(x)
        return jax.make_array_from_callback(
            xh.shape, NamedSharding(mesh, P("replica")),
            lambda idx: xh[idx])

    return jax.tree.map(put, tree)


def host_fetch(tree):
    """Make every leaf fully addressable on this host: identity in
    single-process runs; under the multi-controller runtime, a DCN
    all-gather (jax.experimental.multihost_utils) of exactly the leaves
    that are GLOBALLY sharded, so record/frame writers see the whole
    ensemble. Leaves that are already fully addressable (process-local
    or replicated arrays) pass through untouched — all-gathering those
    would CONCATENATE duplicate copies and corrupt the output shapes."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def fetch(x):
        if x is None or getattr(x, "is_fully_addressable", True):
            return x
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(fetch(jax.random.key_data(x)))
        return multihost_utils.process_allgather(x, tiled=True)

    # one collective per sharded leaf; every process traverses the same
    # tree structure, so the collective order matches across processes
    return jax.tree.map(fetch, tree)
