"""Parallelism: device mesh, shardings, and distributed initialization.

The reference was single-process, single-GPU with no distribution
machinery at all (SURVEY.md §2.3). Here data parallelism over ICI is
first-class: a (data, model) `jax.sharding.Mesh`, batches sharded on
`data`, parameters replicated (or sharded on `model` for the wav2vec-U
stretch seam), and gradient all-reduce emitted by GSPMD as `psum` over
the mesh — no hand-written collectives in the training loop.
"""

from uasr.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
