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


def build_case():
    """Deterministic tiny training case shared by the workers and the
    single-process parity check in the test: config, the full global
    batch, and a CTCTrainer-compatible state builder."""
    from uasr.config import Config, ModelConfig
    from uasr.data.dataset import Batch, batch_iterator, make_synthetic_dataset

    examples, vocab = make_synthetic_dataset(
        num_utts=8, num_phones=6, min_len=3, max_len=5, seed=7
    )
    cfg = Config(
        name="dist_parity",
        model=ModelConfig(encoder="classifier", classifier_hidden=32,
                          classifier_layers=2),
        vocab_size=len(vocab),
    )
    full = next(iter(batch_iterator(
        examples, batch_size=8, max_audio_samples=16 * 16000 // 10,
        max_label_len=8, seed=0, shuffle=False,
    )))
    return cfg, Batch(*map(np.asarray, full))


def run_train_step(trainer, state_batch, mesh):
    """One REAL jitted train step (frontend -> classifier -> CTC ->
    grads -> Adam) on a (possibly multi-process) mesh; returns
    (loss, grad_norm) floats. Params are built replicated via a jitted
    initializer so multi-process execution sees global arrays."""
    import jax.numpy as jnp

    from uasr.parallel.mesh import replicated
    from uasr.train import TrainState

    _ = trainer.frontend_state  # materialize the lazy cache OUTSIDE jit

    def build_state(batch):
        feats, flen = trainer._feats(batch.audio, batch.audio_lengths)
        params = trainer.model.init(jax.random.PRNGKey(0), feats, flen)
        return TrainState(
            jnp.zeros((), jnp.int32), params, trainer.optimizer.init(params)
        )

    state = jax.jit(build_state, out_shardings=replicated(mesh))(state_batch)
    step = jax.jit(
        lambda s, b: trainer.train_step(s, b, jax.random.PRNGKey(1))
    )
    new_state, aux = step(state, state_batch)
    return float(aux["loss"]), float(aux["grad_norm"]), new_state


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

    # phase 2: a REAL training step across processes — each host
    # contributes its host_batch_slice rows of the deterministic case,
    # the jitted step runs SPMD over the global mesh (GSPMD grad psum
    # crosses the process boundary), and the replicated loss must agree
    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    cfg, full = build_case()
    start, size = host_batch_slice(full.audio.shape[0])
    local = Batch(*(np.asarray(f)[start:start + size] for f in full))
    gbatch = make_global_batch(local, mesh)
    trainer = CTCTrainer(cfg, mesh=mesh)
    loss, gnorm, new_state = run_train_step(trainer, gbatch, mesh)
    print(f"TRAIN {pid} {loss:.6f} {gnorm:.6f}", flush=True)

    # phase 3: multi-process Orbax checkpointing — the one pod surface
    # the virtual mesh cannot exercise. BOTH processes save the post-
    # step state (global, replicated arrays) into ONE shared directory
    # (Orbax coordinates the commit across processes over the same
    # jax.distributed service), wait for the async write, then restore
    # and verify bitwise equality; the printed checksum must agree
    # across processes AND with what the test recomputes.
    if len(sys.argv) > 4 and sys.argv[4]:
        from uasr.checkpoint import CheckpointManager

        mgr = CheckpointManager(sys.argv[4], max_to_keep=2)
        mgr.save(1, new_state)
        mgr.wait()
        restored, rstep = mgr.restore_latest(new_state)
        assert rstep == 1, rstep
        saved_leaves = jax.tree.leaves(jax.device_get(new_state))
        rest_leaves = jax.tree.leaves(jax.device_get(restored))
        ok = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(saved_leaves, rest_leaves)
        )
        cks = sum(
            float(np.abs(np.asarray(x, np.float64)).sum())
            for x in rest_leaves
            if np.issubdtype(np.asarray(x).dtype, np.floating)
        )
        print(f"CKPT {pid} {int(ok)} {cks:.6f}", flush=True)
        mgr.close()
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
