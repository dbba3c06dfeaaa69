"""Mesh and sharding utilities.

Design (scaling-book recipe): pick a mesh, annotate shardings on the
jit boundary, let XLA/GSPMD insert the collectives.

  - mesh axes: ('data', 'model'). DP rides `data`; `model` is the seam
    kept for tensor-parallel scaling of larger models (BASELINE.json
    wav2vec-U stretch config) — at the reference's model sizes it stays
    size 1 in recipes but is exercised by tests and the multichip
    dry-run.
  - batch arrays shard their leading axis over `data`.
  - parameters: replicated by default; when the mesh has a nontrivial
    `model` axis, weight matrices whose last dim divides the axis size
    are sharded column-wise (output-feature sharding -> the following
    elementwise ops stay local; GSPMD all-gathers activations only
    where needed).
  - gradients: GSPMD emits the psum over `data` automatically because
    params are replicated while batch inputs are data-sharded.

Multi-host pods: `jax.distributed.initialize` + the same mesh over
`jax.devices()`; DCN only carries the input pipeline and checkpoint IO.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    model_parallel: int = 1,
    devices: list | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh, data_axis: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), data_axis)),
        batch,
    )


def param_shardings(
    params: Any, mesh: Mesh, model_axis: str = "model"
) -> Any:
    """Sharding pytree for params: last-axis ("column") sharding over the
    model axis for 2D+ weights whose output dim divides the axis size;
    everything else replicated."""
    m = mesh.shape[model_axis]

    def rule(x):
        shape = x.shape if hasattr(x, "shape") else ()
        if m > 1 and len(shape) >= 2 and shape[-1] % m == 0 and shape[-1] >= 2 * m:
            spec = [None] * (len(shape) - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
