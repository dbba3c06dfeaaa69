"""Distributed-without-a-cluster tests (SURVEY.md §4): the 8-device CPU
mesh must reproduce single-device math — data-parallel loss/grads equal
the global-batch computation, and model-axis sharded params give the
same forward logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.config import Config, FrontendConfig, ModelConfig, TrainConfig
from uasr.data.dataset import Batch, batch_iterator, make_synthetic_dataset
from uasr.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from uasr.train import CTCTrainer


def _cfg(vocab_size):
    return Config(
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(encoder="cnn", hidden_size=64, num_conv_layers=1),
        train=TrainConfig(total_steps=10, lr=1e-3),
        vocab_size=vocab_size,
    )


def _one_batch(B=8):
    examples, vocab = make_synthetic_dataset(num_utts=B, num_phones=8, seed=4)
    b = next(iter(batch_iterator(
        examples, batch_size=B, max_audio_samples=16000, max_label_len=8,
        shuffle=False,
    )))
    return b, vocab


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_dp_loss_and_grads_match_single_device():
    b, vocab = _one_batch()
    cfg = _cfg(len(vocab))
    mesh = make_mesh(1)  # (data=8, model=1)
    trainer = CTCTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), b)

    # single-device reference: plain value_and_grad on the global batch
    gb = Batch(*map(jnp.asarray, b))
    rng = jax.random.PRNGKey(42)
    (ref_loss, _), ref_grads = jax.value_and_grad(
        trainer._loss, has_aux=True
    )(state.params, gb, rng)
    ref_norm = float(jnp.sqrt(sum(
        jnp.sum(g**2) for g in jax.tree.leaves(ref_grads)
    )))

    # data-parallel: batch sharded over the mesh
    sb = shard_batch(gb, mesh)
    state2, aux = trainer.jitted_train_step()(state, sb, rng)
    np.testing.assert_allclose(float(aux["ctc_loss"]), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(aux["grad_norm"]), ref_norm, rtol=1e-4)


def test_dp_matches_manual_psum():
    """Gradient of the mean loss over a sharded batch == mean of per-shard
    gradients (manual all-reduce)."""
    b, vocab = _one_batch()
    cfg = _cfg(len(vocab))
    mesh = make_mesh(1)
    trainer = CTCTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    rng = jax.random.PRNGKey(7)

    grads_fn = jax.grad(
        lambda p, bb: trainer._loss(p, bb, rng)[0]
    )
    # manual: average of the 8 per-example-shard grads
    B = b.audio.shape[0]
    manual = None
    for i in range(B):
        shard = Batch(*(np.asarray(x[i : i + 1]) for x in b))
        g = grads_fn(state.params, Batch(*map(jnp.asarray, shard)))
        manual = g if manual is None else jax.tree.map(jnp.add, manual, g)
    manual = jax.tree.map(lambda x: x / B, manual)

    sharded = grads_fn(state.params, shard_batch(Batch(*map(jnp.asarray, b)), mesh))
    for a, m in zip(jax.tree.leaves(sharded), jax.tree.leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(m), atol=2e-5)


def test_model_axis_sharding_forward_equivalence():
    """Params sharded on the model axis must produce the same logits as
    replicated params (GSPMD inserts the collectives)."""
    b, vocab = _one_batch()
    cfg = _cfg(len(vocab))
    mesh = make_mesh(2)  # (data=4, model=2)
    trainer = CTCTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), b)

    shardings = param_shardings(state.params, mesh)
    # at least one tensor actually gets model-sharded
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(s) for s in specs), specs

    sharded_params = jax.device_put(state.params, shardings)
    gb = Batch(*map(jnp.asarray, b))
    rng = jax.random.PRNGKey(42)
    loss_rep, _ = trainer._loss(state.params, gb, rng)
    loss_tp, _ = jax.jit(trainer._loss)(
        sharded_params, shard_batch(gb, mesh), rng
    )
    np.testing.assert_allclose(float(loss_tp), float(loss_rep), rtol=1e-5)


def test_mesh_shapes():
    m = make_mesh(4)
    assert m.shape["data"] == 2 and m.shape["model"] == 4
    r = replicated(m)
    bs = batch_sharding(m, 2)
    assert "data" in str(bs.spec)


@pytest.mark.parametrize("encoder", ["transformer", "conformer"])
def test_transformer_tp_forward_equivalence(encoder):
    """The attention encoders' QKV/FFN weights column-shard over the
    model axis via the same generic rule; sharded and replicated
    params must agree."""
    b, vocab = _one_batch()
    cfg = _cfg(len(vocab))
    cfg.model.encoder = encoder
    cfg.model.transformer_layers = 2
    cfg.model.num_heads = 4
    cfg.model.conformer_kernel = 7
    cfg.model.conformer_rel_clip = 8
    mesh = make_mesh(2)
    trainer = CTCTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    shardings = param_shardings(state.params, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(s) for s in specs), specs
    sharded_params = jax.device_put(state.params, shardings)
    gb = Batch(*map(jnp.asarray, b))
    rng = jax.random.PRNGKey(42)
    loss_rep, _ = trainer._loss(state.params, gb, rng)
    loss_tp, _ = jax.jit(trainer._loss)(
        sharded_params, shard_batch(gb, mesh), rng
    )
    np.testing.assert_allclose(float(loss_tp), float(loss_rep), rtol=1e-5)


@pytest.mark.parametrize("encoder", ["transformer", "conformer"])
def test_sequence_shard_parity(encoder):
    """model.sequence_shard (SURVEY.md §5 sequence-parallel seam):
    activations' time axis is sharding-constrained over the model mesh
    axis between attention blocks. Values and gradients must equal the
    unconstrained run — GSPMD may only move data, never change math."""
    b, vocab = _one_batch()
    base = _cfg(len(vocab))
    base.model.encoder = encoder
    base.model.transformer_layers = 2
    base.model.num_heads = 4
    base.model.conformer_kernel = 7
    base.model.conformer_rel_clip = 8
    mesh = make_mesh(4)  # (data=2, model=4) on the 8-device CPU mesh

    import dataclasses

    cfg_sp = dataclasses.replace(
        base, model=dataclasses.replace(base.model, sequence_shard=True)
    )
    tr_plain = CTCTrainer(base, mesh=mesh)
    tr_sp = CTCTrainer(cfg_sp, mesh=mesh)
    state = tr_plain.init_state(jax.random.PRNGKey(0), b)
    gb = Batch(*map(jnp.asarray, b))
    rng = jax.random.PRNGKey(42)

    def lossgrad(trainer):
        return jax.jit(jax.value_and_grad(
            lambda p: trainer._loss(p, gb, rng)[0]
        ))(state.params)

    (l0, g0), (l1, g1) = lossgrad(tr_plain), lossgrad(tr_sp)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    # resharding changes f32 reduction order — bound the drift by each
    # leaf's RELATIVE L2 error, with an absolute floor for analytically-
    # zero grads (the MHA key bias: softmax is shift-invariant per
    # query, so its true grad is 0 and both sides are ~1e-7 noise)
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, c = np.asarray(a), np.asarray(c)
        d = np.linalg.norm(a - c)
        rel = d / (np.linalg.norm(a) + 1e-8)
        assert rel < 1e-3 or d < 1e-5, (a.shape, rel, d)


def test_sequence_shard_rejected_for_finite_rf_encoders():
    from uasr.models.models import build_model

    cfg = _cfg(10)
    cfg.model.sequence_shard = True
    cfg.model.encoder = "cnn"
    with pytest.raises(ValueError, match="sequence_shard"):
        build_model(cfg.model, 10)


@pytest.mark.parametrize("use_beam", [False, True, "pallas"])
def test_sharded_inference_matches_single_device(tmp_path, use_beam,
                                                 monkeypatch):
    """run_inference over the 8-device mesh == single-device decode:
    same PER/error counts and identical hyp files, including a ragged
    batch (B=10 not divisible by 8 -> zero-pad + slice-back path).
    use_beam="pallas" engages the whole-recursion beam KERNEL per data
    shard via shard_map (interpret mode on CPU) — the round-4 sharded
    Pallas beam path — and asserts it was actually selected."""
    from uasr.config import CTCConfig
    from uasr.infer import run_inference

    examples, vocab = make_synthetic_dataset(num_utts=20, num_phones=8,
                                             seed=11)
    cfg = _cfg(len(vocab))
    if use_beam:
        cfg = cfg.replace(ctc=CTCConfig(blank_id=0, use_beam=True,
                                        beam_width=4))
    if use_beam == "pallas":
        monkeypatch.setenv("UASR_PALLAS_BEAM", "interpret")

    def batches():
        return batch_iterator(
            examples, batch_size=10, max_audio_samples=16000,
            max_label_len=8, shuffle=False, drop_remainder=False,
            num_epochs=1,
        )

    t_multi = CTCTrainer(cfg)
    assert int(t_multi.mesh.shape["data"]) == 8
    state = t_multi.init_state(jax.random.PRNGKey(0), next(batches()))
    t_single = CTCTrainer(
        cfg, mesh=make_mesh(1, devices=[jax.devices()[0]])
    )

    import uasr.infer as I

    res_m = run_inference(cfg, t_multi, state, batches(), vocab=vocab,
                          hyp_path=str(tmp_path / "hyp_multi.txt"))
    if use_beam == "pallas":
        assert I.LAST_BEAM_IMPL == "pallas_sharded"
    res_s = run_inference(cfg, t_single, state, batches(), vocab=vocab,
                          hyp_path=str(tmp_path / "hyp_single.txt"))
    if use_beam == "pallas":
        assert I.LAST_BEAM_IMPL == "pallas"
    assert res_m["errors"] == res_s["errors"]
    assert res_m["ref_tokens"] == res_s["ref_tokens"]
    assert res_m["per"] == pytest.approx(res_s["per"])
    assert (tmp_path / "hyp_multi.txt").read_text() == \
        (tmp_path / "hyp_single.txt").read_text()
