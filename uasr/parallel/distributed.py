"""Multi-host (pod slice) initialization helpers.

The reference was strictly single-process (SURVEY.md §2.3). For pod
slices (BASELINE.json wav2vec-U stretch config) the recipe is:

    from uasr.parallel.distributed import init_distributed, host_batch_slice
    init_distributed()                   # once, before any jax.* call
    mesh = make_mesh(model_parallel)     # over jax.devices() (global)

Input pipeline sharding: each host loads only its slice of the global
batch (`host_batch_slice`), places it with
`jax.make_array_from_process_local_data`, and the jitted step sees one
global array — DCN carries only input bytes and Orbax writes.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX multi-host; no-op (returns False) when the env
    describes a single process. Environment-driven on TPU pods
    (jax.distributed.initialize autodetects); explicit args for manual
    setups."""
    n = num_processes or int(os.environ.get("UASR_NUM_PROCESSES", "1"))
    if coordinator_address is None and n <= 1 and "COORDINATOR_ADDRESS" not in os.environ:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this host's slice of the global batch."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} % hosts {n} != 0")
    per = global_batch_size // n
    return i * per, per


def make_global_batch(local_batch, mesh, data_axis: str = "data"):
    """Assemble a global device array from per-host local shards.

    local_batch: pytree of numpy arrays holding THIS host's rows.
    Returns a pytree of jax.Arrays with global shape
    [local_rows * process_count, ...], sharded over the data axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(
            mesh, P(data_axis, *([None] * (x.ndim - 1)))
        )
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(place, local_batch)
