"""Multi-host (DCN) scale-out: the distributed LIO step across processes.

SURVEY §7 phase 9 / BASELINE config 5's "1 chip -> N hosts": the same
shard_map programs that ride ICI within a slice span hosts when the mesh
is built over ALL processes' devices — XLA routes the psum/ppermute
segments that cross process boundaries over DCN (Gloo on CPU test rigs).
The reference has no counterpart (single-host ROS graph, SURVEY §2).

Usage (every participating process runs the same program):

    from lio_mapping_tpu.parallel import multihost as MH
    MH.initialize("10.0.0.1:8476", num_processes=4, process_id=rank)
    mesh = MH.global_mesh()
    step = lio_dist.make_sharded_lio_step(mesh, cfg)   # spans all hosts
    state = MH.replicate(state, mesh)                  # host value -> global
    for sweep in sequence:                             # every host ingests
        cloud, samples = MH.replicate((cloud, samples), mesh)
        state, out = step(state, cloud, samples)       # state stays global
        pose = MH.fetch(out["laser_pose"])             # local copy

Or drive the whole host loop through the pipeline with SHARDED ingest
(each process transfers only its row slice of the packed cloud; the
program reassembles it with a tiled all_gather riding ICI/DCN — per-host
transfer volume drops ~1/P):

    pipe = LioPipeline(cfg, mesh=MH.global_mesh(), ingest_shard=True)
    out = pipe.process(xyz, mask, pipe.make_samples(...))  # every host

Validated by tests/test_multihost.py (2 CPU processes x 2 virtual devices,
cross-process psum + window-BA equivalence vs single-process) and
``tools/bench_scaling.py --processes N``.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "data"


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the multi-process JAX runtime (jax.distributed.initialize).

    Call BEFORE any other JAX API touches devices. On CPU test rigs set
    ``JAX_PLATFORMS=cpu`` and (optionally)
    ``XLA_FLAGS=--xla_force_host_platform_device_count=K`` in the
    ENVIRONMENT (not via os.environ after import — the interpreter may
    have captured them at startup).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over every device of every process (ICI within a host,
    DCN across hosts)."""
    return Mesh(np.array(jax.devices()), (axis,))


def replicate(tree, mesh: Mesh):
    """Host-local pytree (identical on every process) -> replicated global
    jax.Arrays on the mesh. One broadcast; no cross-host data dependence
    because every host feeds the same value (the LIO host loop ingests the
    same sweep stream on every process)."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P()),
        tree)


def shard_rows(tree, mesh: Mesh, axis: str = AXIS):
    """Host-local arrays (identical on every process, full length) ->
    global arrays with the LEADING axis sharded over the mesh. Each
    process contributes its own slice of rows."""
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    pid = jax.process_index()

    def one(a):
        a = np.asarray(a)
        chunk = a.shape[0] // n_proc
        local = a[pid * chunk:(pid + 1) * chunk]
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, P(axis))

    return jax.tree.map(one, tree)


def fetch(tree):
    """Replicated global arrays -> local numpy copies (first addressable
    shard; identical on every process for replicated outputs)."""
    return jax.tree.map(
        lambda a: np.asarray(a.addressable_data(0))
        if isinstance(a, jax.Array) and not a.is_fully_addressable
        else np.asarray(a),
        tree)
