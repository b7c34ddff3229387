"""Device mesh and sharding helpers.

The reference's only multi-device construct is single-process
torch.nn.DataParallel (scripts/test_models.py:153). The TPU-native equivalent
is SPMD over a jax.sharding.Mesh:

  * 'data' axis: batch (clip) sharding — replaces DataParallel scatter/gather
    with XLA-inserted collectives over ICI.
  * 'model' axis: optional tensor parallelism for the widest 1x1 convolutions
    and the classifier head (not needed for parity — the largest model is
    8.5M params — but first-class here for scale-out).

Multi-host execution composes transparently: initialize jax.distributed and
build the mesh over all devices; XLA routes collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Multi-host bring-up: wire this process into a JAX distributed system.

    Call once per host before any other jax API, then build meshes with
    create_mesh() as usual — jax.devices() returns the devices of ALL hosts
    and XLA routes collectives over ICI within a slice and DCN across slices.

    With no arguments this relies on the TPU environment's automatic
    coordinator discovery (jax.distributed.initialize() no-arg form). On a
    single host with no coordinator configured, initialization is skipped and
    False is returned — single-process SPMD keeps working unchanged, so code
    can call this unconditionally.

    Returns True when a multi-process runtime was initialized.
    """
    import os

    # TPU_WORKER_HOSTNAMES is set even on single-host TPU VMs; it signals a
    # multi-host slice only when it lists more than one hostname.
    workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    single_host = (
        coordinator_address is None
        and num_processes in (None, 1)
        and "COORDINATOR_ADDRESS" not in os.environ
        and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ
        and len(workers) <= 1
    )
    if single_host:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. By default all devices go to the data
    axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )


def param_partition_spec(params, min_size_for_tp: int = 1 << 16):
    """Partition specs for tensor parallelism over the 'model' axis.

    Policy: shard the output-channel dimension of large kernels (1x1 conv
    kernels (1, 1, I, O) and dense kernels (I, O)) over 'model'; everything
    else (BN, shifts, biases, small kernels) is replicated. With model=1 this
    degenerates to full replication.
    """

    def spec(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        if not names:
            return P()
        if names[-1] == "kernel" and leaf.ndim >= 2 and leaf.size >= min_size_for_tp:
            return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params, specs=None):
    specs = specs if specs is not None else param_partition_spec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
