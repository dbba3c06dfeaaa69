"""End-to-end integration (SURVEY.md §4 "Integration"): the TIMIT-mini
analogue on CPU — synthetic tone-language corpus, full pipeline
(on-device frontend -> encoder -> CTC -> decode -> PER -> Orbax ckpt)."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.config import Config, DataConfig, FrontendConfig, ModelConfig, TrainConfig
from uasr.data.dataset import Batch, batch_iterator, make_synthetic_dataset
from uasr.train import CTCTrainer, TrainState


@pytest.fixture(scope="module")
def tiny_setup():
    examples, vocab = make_synthetic_dataset(
        num_utts=64, num_phones=8, min_len=3, max_len=6, seed=0
    )
    cfg = Config(
        name="tiny",
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(
            encoder="cnn", hidden_size=64, num_conv_layers=2,
            conv_time_stride=2, conv_kernel=5,
        ),
        train=TrainConfig(total_steps=150, lr=2e-3, warmup_steps=20,
                          grad_clip=5.0),
        vocab_size=len(vocab),
    )
    return examples, vocab, cfg


def _batches(examples, n=None, batch_size=8, seed=0):
    it = batch_iterator(
        examples, batch_size=batch_size,
        max_audio_samples=16 * 16000 // 10,  # 1.6s cap
        max_label_len=8, seed=seed, num_epochs=None,
    )
    return itertools.islice(it, n) if n else it


def test_ctc_learns_synthetic(tiny_setup):
    examples, vocab, cfg = tiny_setup
    trainer = CTCTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    first = next(_batches(examples, 1))
    state = trainer.init_state(rng, first)
    step_fn = trainer.jitted_train_step()

    losses = []
    for i, b in enumerate(_batches(examples, 200)):
        rng, sub = jax.random.split(rng)
        state, aux = step_fn(state, Batch(*map(jnp.asarray, b)), sub)
        losses.append(float(aux["ctc_loss"]))
    assert np.isfinite(losses).all()
    # loss must drop substantially
    assert np.mean(losses[-20:]) < 0.5 * np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-20:]),
    )
    # PER on training data should be well below chance
    per = trainer.evaluate(state.params, _batches(examples, 4, seed=9))
    assert per < 0.5, per
    # stash for the checkpoint test
    tiny_setup_state["state"] = state
    tiny_setup_state["trainer"] = trainer


tiny_setup_state: dict = {}


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    examples, vocab, cfg = tiny_setup
    from uasr.checkpoint import CheckpointManager

    trainer = tiny_setup_state.get("trainer") or CTCTrainer(cfg)
    state = tiny_setup_state.get("state")
    if state is None:
        state = trainer.init_state(jax.random.PRNGKey(0), next(_batches(examples, 1)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(int(state.step), state)
    mgr.wait()
    restored, step = mgr.restore_latest(state)
    assert step == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restores bitwise too (resume semantics)
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_keep_n_checkpoints(tmp_path, tiny_setup):
    examples, vocab, cfg = tiny_setup
    from uasr.checkpoint import CheckpointManager

    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), next(_batches(examples, 1)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in [1, 2, 3]:
        mgr.save(s, state._replace(step=jnp.asarray(s)))
        mgr.wait()
    assert mgr.latest_step() == 3
    restored, step = mgr.restore_latest(state)
    assert step == 3
    mgr.close()


def test_keep_best_tracks_min_dev_per(tmp_path, tiny_setup):
    """train.keep_best: the supervised loop keeps the best-dev-PER
    checkpoint under model_dir/best_ckpt (reference 'restore latest or
    best' semantics), score.json records the minimum dev PER seen, and
    the crash-safe keeper refuses to regress after a 'restart'."""
    import json
    import os

    from uasr.train import BestCheckpointKeeper, run_ctc_training

    examples, vocab, cfg = tiny_setup
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        model_dir=str(tmp_path / "exp"),
        train=TrainConfig(total_steps=40, lr=2e-3, warmup_steps=10,
                          eval_every=10, save_every=40, log_every=20,
                          keep_best=True),
    )
    pers = []

    def dev_fn():
        return _batches(examples, 2, seed=9)

    trainer, state = run_ctc_training(
        cfg, _batches(examples, 50), dev_batches_fn=dev_fn
    )
    score_path = os.path.join(cfg.model_dir, "best_ckpt", "score.json")
    assert os.path.exists(score_path)
    rec = json.load(open(score_path))
    with open(os.path.join(cfg.model_dir, "metrics.jsonl")) as f:
        recs = [json.loads(ln) for ln in f]
    pers = {r["step"]: r["per"] for r in recs if r["tag"] == "dev"}
    assert rec["score"] == pytest.approx(min(pers.values()))
    assert pers[rec["step"]] == pytest.approx(rec["score"])
    # the keeper reloads the recorded best and refuses a worse score
    k = BestCheckpointKeeper(cfg.model_dir, higher_is_better=False)
    assert not k.update(rec["score"] + 0.1, 99, state)
    k.close()
    # keep_best without a dev split must fail loudly
    with pytest.raises(ValueError, match="keep_best"):
        run_ctc_training(
            dataclasses.replace(cfg, model_dir=str(tmp_path / "exp2")),
            _batches(examples, 2),
        )


def test_restore_averaged_exact_mean(tmp_path):
    """Checkpoint averaging: float leaves are the exact arithmetic mean
    of the newest N retained steps; int leaves come from the newest;
    N larger than the retained count falls back to all of them."""
    from uasr.checkpoint import CheckpointManager, restore_averaged

    state = {
        "step": np.asarray(0, np.int32),
        "w": np.zeros((3, 2), np.float32),
        "b": np.zeros((4,), np.float64),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    for s in (1, 2, 3, 4):  # step 1 is GC'd by keep-3
        mgr.save(s, {
            "step": np.asarray(s, np.int32),
            "w": np.full((3, 2), float(s), np.float32),
            "b": np.full((4,), 10.0 * s, np.float64),
        })
        mgr.wait()

    avg, step = restore_averaged(mgr, state, 2)  # steps 3, 4
    assert step == 4
    assert avg["step"] == 4  # int leaf: newest wins
    np.testing.assert_allclose(np.asarray(avg["w"]), 3.5)
    np.testing.assert_allclose(np.asarray(avg["b"]), 35.0)
    assert np.asarray(avg["w"]).dtype == np.float32

    avg_all, step = restore_averaged(mgr, state, 99)  # only 2..4 retained
    np.testing.assert_allclose(np.asarray(avg_all["w"]), 3.0)
    mgr.close()

    empty = CheckpointManager(str(tmp_path / "none"), max_to_keep=2)
    assert restore_averaged(empty, state, 2) is None
    empty.close()


def test_grad_accum_matches_big_batch(tiny_setup):
    """train.grad_accum=k over k equal micro-batches produces EXACTLY
    the parameters of one big-batch step (mean-reduced loss, equal
    micro-batch sizes; the clip/Adam chain runs on the accumulated
    mean)."""
    import dataclasses

    examples, vocab, cfg = tiny_setup
    big = Batch(*next(iter(_batches(examples, batch_size=8, seed=3))))
    halves = [
        Batch(*map(lambda a: a[:4], big)),
        Batch(*map(lambda a: a[4:], big)),
    ]
    rng = jax.random.PRNGKey(0)

    cfg1 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=1)
    )
    tr1 = CTCTrainer(cfg1)
    s1 = tr1.init_state(jax.random.PRNGKey(7), big)
    s1, _ = tr1.jitted_train_step()(s1, big, rng)

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2)
    )
    tr2 = CTCTrainer(cfg2)
    s2 = tr2.init_state(jax.random.PRNGKey(7), big)
    step2 = tr2.jitted_train_step()
    for h in halves:
        s2, _ = step2(s2, h, rng)

    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_structure_mismatch_restore_error(tmp_path, tiny_setup):
    """Resuming with a different opt_state structure (e.g. a changed
    train.grad_accum) fails with a message naming the likely cause, not
    Orbax's bare pytree diff."""
    import dataclasses

    from uasr.checkpoint import CheckpointManager

    examples, vocab, cfg = tiny_setup
    batch = Batch(*next(iter(_batches(examples, batch_size=4, seed=5))))
    tr1 = CTCTrainer(cfg)
    s1 = tr1.init_state(jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, s1)
    mgr.close()

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2)
    )
    tr2 = CTCTrainer(cfg2)
    s2 = tr2.init_state(jax.random.PRNGKey(0), batch)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    with pytest.raises(ValueError, match="grad_accum"):
        mgr2.restore_latest(s2)
    mgr2.close()


@pytest.mark.slow
def test_transformer_ctc_learns(tiny_setup):
    """The transformer encoder trains under CTC on the synthetic corpus
    (SURVEY.md §5 seam made real: attention model on the same mesh)."""
    import dataclasses

    examples, vocab, cfg = tiny_setup
    mcfg = dataclasses.replace(
        cfg.model, encoder="transformer", transformer_layers=2,
        num_heads=4, hidden_size=64,
    )
    tcfg = dataclasses.replace(cfg, model=mcfg)
    trainer = CTCTrainer(tcfg)
    it = iter(_batches(examples))
    first = Batch(*next(it))
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    step = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(150):
        b = Batch(*(first if i == 0 else next(it)))
        rng, sub = jax.random.split(rng)
        state, aux = step(state, b, sub)
        losses.append(float(aux["ctc_loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    per = trainer.evaluate(
        state.params, itertools.islice(_batches(examples, seed=9), 4)
    )
    assert per < 0.6, per


@pytest.mark.slow
def test_patch_front_ctc_learns(tiny_setup):
    """conv_front: patch (the TPU-first GEMM subsampling front) learns
    the synthetic corpus under CTC — quality gate for making it the
    bench flagship front (round-3 backward decomposition: the conv2d
    stack was 3.9 ms of the 18.4 ms step on layout-padding traffic)."""
    import dataclasses

    examples, vocab, cfg = tiny_setup
    mcfg = dataclasses.replace(
        cfg.model, encoder="conv_bigru", conv_front="patch",
        hidden_size=64, num_gru_layers=1,
    )
    tcfg = dataclasses.replace(cfg, model=mcfg)
    trainer = CTCTrainer(tcfg)
    it = iter(_batches(examples))
    first = Batch(*next(it))
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    step = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(150):
        b = Batch(*(first if i == 0 else next(it)))
        rng, sub = jax.random.split(rng)
        state, aux = step(state, b, sub)
        losses.append(float(aux["ctc_loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    per = trainer.evaluate(
        state.params, itertools.islice(_batches(examples, seed=9), 4)
    )
    assert per < 0.5, per


def test_frame_ce_learns_from_alignments():
    """train.mode=frame_ce: the alignment-supervised pathway (reference
    ASR_align_DataSet, SURVEY.md §2.2) — per-frame CE on the synthetic
    corpus's exact frame alignments reaches high frame accuracy within
    a few steps, and greedy decode of the trained posteriors beats
    chance PER."""
    import dataclasses

    from uasr.data.dataset import AlignedBatch, aligned_batch_iterator
    from uasr.train import CTCTrainer

    examples, vocab = make_synthetic_dataset(
        num_utts=16, num_phones=6, min_len=3, max_len=6, seed=3,
        with_alignments=True,
    )
    cfg = Config(
        name="frame_ce",
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(encoder="classifier", classifier_hidden=64,
                          classifier_layers=2),
        train=TrainConfig(mode="frame_ce", total_steps=30, lr=2e-3,
                          warmup_steps=5),
        vocab_size=len(vocab),
    )
    trainer = CTCTrainer(cfg)
    assert trainer.frame_ce
    it = aligned_batch_iterator(
        examples, batch_size=8, max_audio_samples=16 * 16000 // 10,
        max_label_len=8, max_frames=160,
    )
    batch = AlignedBatch(*map(jnp.asarray, next(iter(it))))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    accs, losses = [], []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub)
        accs.append(float(aux["frame_acc"]))
        losses.append(float(aux["loss"]))
    assert accs[-1] > 0.85, accs[-5:]
    assert losses[-1] < 0.5 * losses[0]
    # decode-based eval consumes the aligned batches' first 4 fields
    per = trainer.evaluate(state.params, [batch])
    assert per < 0.5, per


def test_frame_ce_strided_encoder_label_downsample():
    """The alignment track is downsampled by frontend.downsample x
    encoder stride; a strided conv_bigru encoder must still improve
    frame accuracy (labels land on the right logits frames)."""
    import dataclasses

    from uasr.data.dataset import AlignedBatch, aligned_batch_iterator
    from uasr.train import CTCTrainer

    examples, vocab = make_synthetic_dataset(
        num_utts=8, num_phones=6, min_len=3, max_len=5, seed=4,
        with_alignments=True,
    )
    cfg = Config(
        name="frame_ce_strided",
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(encoder="conv_bigru", hidden_size=48,
                          num_gru_layers=1, conv_channels=8,
                          num_conv_layers=2, conv_time_stride=2),
        train=TrainConfig(mode="frame_ce", lr=3e-3, warmup_steps=5),
        vocab_size=len(vocab),
    )
    from uasr.models.models import encoder_time_subsample
    assert encoder_time_subsample(cfg.model) == 4
    trainer = CTCTrainer(cfg)
    it = aligned_batch_iterator(
        examples, batch_size=8, max_audio_samples=16 * 16000 // 10,
        max_label_len=8, max_frames=160,
    )
    batch = AlignedBatch(*map(jnp.asarray, next(iter(it))))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    accs = []
    for i in range(40):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub)
        accs.append(float(aux["frame_acc"]))
    assert accs[-1] > 2.0 * max(accs[0], 0.05), (accs[0], accs[-1])


@pytest.mark.slow
def test_conformer_ctc_learns(tiny_setup):
    """The conformer encoder (macaron FFN / rel-pos MHSA / depthwise
    conv module) learns the synthetic corpus under CTC and decodes it."""
    import dataclasses

    examples, vocab, cfg = tiny_setup
    mcfg = dataclasses.replace(
        cfg.model, encoder="conformer", hidden_size=64,
        transformer_layers=2, num_heads=4, ffn_dim=128,
        conformer_kernel=7, conformer_rel_clip=16,
    )
    tcfg = dataclasses.replace(cfg, model=mcfg)
    trainer = CTCTrainer(tcfg)
    it = iter(_batches(examples))
    first = Batch(*next(it))
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    step = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(150):
        b = Batch(*(first if i == 0 else next(it)))
        rng, sub = jax.random.split(rng)
        state, aux = step(state, b, sub)
        losses.append(float(aux["ctc_loss"]))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    per = trainer.evaluate(
        state.params, itertools.islice(_batches(examples, seed=9), 4)
    )
    assert per < 0.3, per


@pytest.mark.slow
def test_ctc_learns_formant_corpus():
    """The round-4 HARD stand-in corpus (narrowband-noise formants +
    speaker/channel variation) must remain supervised-learnable:
    held-out PER well below the tone corpus's chance while clearly
    harder than tones (measured 0.031 at 512 utts/300 steps,
    BASELINE.md round 4)."""
    from uasr.config import (
        Config, FrontendConfig, ModelConfig, TrainConfig,
    )

    examples, vocab = make_synthetic_dataset(
        num_utts=256, num_phones=6, min_len=4, max_len=8, seed=0,
        syntax="markov", style="formant",
    )
    heldout, _ = make_synthetic_dataset(
        num_utts=48, num_phones=6, min_len=4, max_len=8, seed=1,
        syntax="markov", style="formant",
    )
    cfg = Config(
        name="formant_sup",
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(encoder="cnn", hidden_size=64,
                          num_conv_layers=2, conv_time_stride=2,
                          conv_kernel=5),
        train=TrainConfig(total_steps=250, lr=2e-3, warmup_steps=20,
                          grad_clip=5.0),
        vocab_size=len(vocab),
    )
    trainer = CTCTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    first = next(_batches(examples, 1))
    state = trainer.init_state(rng, first)
    step_fn = trainer.jitted_train_step()
    for b in _batches(examples, 250):
        rng, sub = jax.random.split(rng)
        state, _aux = step_fn(state, Batch(*map(jnp.asarray, b)), sub)
    per = trainer.evaluate(
        state.params,
        batch_iterator(heldout, 8, 16 * 16000 // 10, 8, shuffle=False,
                       num_epochs=1),
    )
    assert per < 0.25, per
