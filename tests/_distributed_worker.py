"""Worker for the 2-process `jax.distributed` smoke test
(tests/test_distributed.py::test_two_process_coordination).

Usage: python _distributed_worker.py <process_id> <num_processes> <addr>

Each process pins the CPU platform (the image's sitecustomize re-forces
the axon TPU plugin over JAX_PLATFORMS), joins the coordination service,
and runs the uasr multi-host helpers exactly as a pod launch would:
init -> mesh over GLOBAL devices -> host_batch_slice -> per-host local
rows -> make_global_batch -> one jitted reduction whose value every
process must agree on.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def main():
    pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from uasr.parallel.distributed import (
        host_batch_slice, init_distributed, make_global_batch,
    )

    assert init_distributed(
        coordinator_address=addr, num_processes=n, process_id=pid
    ) is True
    assert jax.process_count() == n, jax.process_count()

    from uasr.parallel.mesh import make_mesh

    mesh = make_mesh(1)  # data axis over the GLOBAL device set
    global_B = 8
    start, size = host_batch_slice(global_B)
    assert size == global_B // n
    assert start == pid * size
    # this host's rows of the global batch: x[i] = i
    local = {
        "x": np.arange(start, start + size, dtype=np.float32).reshape(size, 1)
    }
    gb = make_global_batch(local, mesh)
    assert gb["x"].shape == (global_B, 1), gb["x"].shape

    total = jax.jit(lambda x: jnp.sum(x))(gb["x"])  # GSPMD all-reduce
    print(f"RESULT {pid} {float(total):.1f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
