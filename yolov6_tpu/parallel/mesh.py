"""Device mesh + sharding utilities — the TPU-native replacement for the
reference's DDP/NCCL stack (reference: tools/train.py:120-125,
core/engine.py:455-468, data/data_load.py:79-81).

Detection training is data-parallel: a 1-D mesh over all devices, batches
sharded on the 'data' axis, state replicated. XLA inserts the gradient
all-reduces over ICI; `jax.distributed.initialize` extends the same program
across hosts (DCN) with per-host data sharding in the loader.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolov6_tpu.utils.events import LOGGER

DATA_AXIS = "data"


def initialize_distributed():
    """Multi-host init (replaces torch.distributed.init_process_group)."""
    if int(os.environ.get("YOLOV6_TPU_MULTIHOST", "0")):
        jax.distributed.initialize()
    # the import-time LOGGER level assumed primary (events._primary_process
    # must not initialize a backend); re-evaluate now that jax is up
    from yolov6_tpu.utils.events import refresh_log_level

    refresh_log_level()
    if jax.process_index() == 0:
        LOGGER.info(
            f"jax devices: {jax.device_count()} total, {jax.local_device_count()} local, "
            f"{jax.process_count()} process(es)"
        )


def create_mesh(num_devices: Optional[int] = None, local: bool = False) -> Mesh:
    """1-D data-parallel mesh over (up to) all devices.

    ``local=True`` restricts the mesh to this process's addressable devices
    — the right mesh for per-host SPMD work (e.g. in-training eval, where
    each host evals its own dataset shard and results are gathered on the
    host side; a global mesh there would reference non-addressable devices
    and hang the pod)."""
    devs = jax.local_devices() if local else jax.devices()
    devices = np.asarray(devs if num_devices is None else devs[:num_devices])
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), state)


def process_shard_info():
    """(shard_id, num_shards) for per-host data loading
    (replaces DistributedSampler)."""
    return jax.process_index(), jax.process_count()
