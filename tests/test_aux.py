"""Auxiliary subsystems: prep tools, feature cache, frame-CE alignment
loss, profiling harness, preemption guard (SURVEY.md §5)."""

import json
import os
import signal
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prepare_synth_and_vocab_and_ngrams(tmp_path):
    from uasr.tools.prepare import main

    out = str(tmp_path / "synth")
    assert main(["synth", "--out-dir", out, "--num-utts", "12",
                 "--num-phones", "5"]) == 0
    assert os.path.exists(os.path.join(out, "train.tsv"))
    assert os.path.exists(os.path.join(out, "vocab.txt"))

    # lists round-trip through the dataset reader
    from uasr.data.dataset import ASRDataset
    from uasr.vocab import load_vocab

    vocab = load_vocab(os.path.join(out, "vocab.txt"))
    ds = ASRDataset.from_file(os.path.join(out, "train.tsv"), vocab)
    audio, ids = ds.example(0)
    assert len(audio) > 0 and len(ids) > 0

    # ngram table dump
    ng = str(tmp_path / "ngrams.npz")
    assert main(["ngrams", "--text", os.path.join(out, "text.txt"),
                 "--vocab", os.path.join(out, "vocab.txt"),
                 "--orders", "2", "--top-k", "16", "--out", ng]) == 0
    z = np.load(ng)
    assert z["ids_2"].shape[1] == 2
    np.testing.assert_allclose(z["probs_2"].sum(), 1.0, rtol=1e-5)

    # vocab build from raw text
    vout = str(tmp_path / "vocab2.txt")
    assert main(["vocab", "--text", os.path.join(out, "text.txt"),
                 "--out", vout]) == 0
    v2 = load_vocab(vout)
    assert v2.tokens[0] == "<blk>"


def test_feature_cache_roundtrip(tmp_path):
    from uasr.data.cache import FeatureCache, write_cache

    rng = np.random.RandomState(0)
    examples = [
        (f"u{i}", rng.randn(10 + i, 8).astype(np.float32), [1, 2, 3])
        for i in range(7)
    ]
    write_cache(str(tmp_path), iter(examples), shard_size=3)
    cache = FeatureCache(str(tmp_path))
    assert len(cache) == 7
    for i, (utt, feat, ids) in enumerate(cache):
        assert utt == f"u{i}"
        np.testing.assert_array_equal(feat, examples[i][1])
        assert ids == [1, 2, 3]


def test_frame_ce_loss_and_accuracy():
    from uasr.ops.frame_ce import frame_accuracy, frame_ce_loss

    B, T, V = 2, 6, 5
    labels = jnp.asarray([[1, 2, 3, -1, -1, -1], [4, 4, -1, -1, -1, -1]])
    # logits that exactly predict the labels
    logits = jax.nn.one_hot(jnp.maximum(labels, 0), V) * 10.0
    lengths = jnp.array([3, 2])
    loss = frame_ce_loss(logits, lengths, labels)
    acc = frame_accuracy(logits, lengths, labels)
    assert float(loss) < 0.01
    assert float(acc) == 1.0
    # wrong predictions -> high loss
    bad = jnp.roll(logits, 1, axis=-1)
    assert float(frame_ce_loss(bad, lengths, labels)) > 5.0
    # gradient flows
    g = jax.grad(lambda lg: frame_ce_loss(lg, lengths, labels))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_step_timer_and_checked():
    from uasr.profiling import StepTimer, checked

    timer = StepTimer()
    x = jnp.ones((32, 32))
    f = jax.jit(lambda a: a @ a)
    for _ in range(3):
        timer.start()
        y = f(x)
        timer.stop(y)
    s = timer.stats(payload_per_step=1.0)
    assert s["steps"] == 3 and s["median_s"] > 0

    ok = checked(lambda a: jnp.log(a))
    assert np.isfinite(float(ok(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        ok(jnp.asarray(-1.0))  # NaN from log of negative


def test_preemption_guard_saves_and_exits(tmp_path):
    """SIGTERM mid-training -> clean exit with a checkpoint on disk."""
    code = f"""
import os, signal, sys, threading
os.environ["UASR_FORCE_CPU"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
from uasr.config import Config, FrontendConfig, ModelConfig, TrainConfig, DataConfig
from uasr.data.dataset import batch_iterator, make_synthetic_dataset
from uasr.train import run_ctc_training
examples, vocab = make_synthetic_dataset(num_utts=32, num_phones=6)
cfg = Config(
    model_dir=r"{tmp_path}/exp",
    frontend=FrontendConfig(num_mel_bins=40),
    model=ModelConfig(encoder="cnn", hidden_size=32, num_conv_layers=1),
    train=TrainConfig(total_steps=100000, log_every=5, save_every=100000,
                      eval_every=1000000),
    vocab_size=len(vocab),
)
batches = batch_iterator(examples, 8, 16000, 8)
# SIGTERM ourselves once training has demonstrably started (first metrics
# line written) — a fixed timer races the jit compile under load and can
# fire before run_ctc_training registers its handler
def _kill_when_training():
    import time
    path = r"{tmp_path}/exp/metrics.jsonl"
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(path) and os.path.getsize(path) > 0:
            break
        time.sleep(0.5)
    time.sleep(1.0)
    os.kill(os.getpid(), signal.SIGTERM)
threading.Thread(target=_kill_when_training, daemon=True).start()
run_ctc_training(cfg, batches)
print("CLEAN_EXIT")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, timeout=400,
    )
    assert "CLEAN_EXIT" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
    ckpt_dir = str(tmp_path / "exp" / "ckpt")
    assert os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) > 0


def test_device_feature_batches_matches_host_iterator(tmp_path):
    """Round 5: the device-resident corpus gather must yield the SAME
    batch content as the host feature_batch_iterator (same seed/order;
    feats padded to the corpus max instead of the cap), including the
    zero-masked final partial batch."""
    from uasr.data.cache import (
        FeatureCache, device_feature_batches, feature_batch_iterator,
        write_cache,
    )

    rng = np.random.RandomState(0)
    examples = [
        (f"u{i}", rng.randn(8 + 3 * i, 6).astype(np.float32),
         [1 + i % 3, 2])
        for i in range(11)
    ]
    write_cache(str(tmp_path), iter(examples), shard_size=4)
    cache = FeatureCache(str(tmp_path))

    host = list(feature_batch_iterator(
        cache, batch_size=4, max_frames=64, max_label_len=5, seed=3,
        num_epochs=1, drop_remainder=False,
    ))
    dev = list(device_feature_batches(
        cache, batch_size=4, max_frames=64, max_label_len=5, seed=3,
        num_epochs=1, drop_remainder=False,
    ))
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        B = int(np.sum(np.asarray(hb.audio_lengths) > 0))
        for b in range(len(hb.audio_lengths)):
            if b < B or b < len(hb.audio_lengths):
                pass
        # valid rows match exactly (device batches pad rows to
        # batch_size with zero lengths at the tail)
        nh = len(hb.audio_lengths)
        np.testing.assert_array_equal(
            np.asarray(db.audio_lengths)[:nh], hb.audio_lengths
        )
        np.testing.assert_array_equal(
            np.asarray(db.labels)[:nh], hb.labels
        )
        np.testing.assert_array_equal(
            np.asarray(db.label_lengths)[:nh], hb.label_lengths
        )
        T = min(hb.audio.shape[1], np.asarray(db.audio).shape[1])
        np.testing.assert_allclose(
            np.asarray(db.audio)[:nh, :T], hb.audio[:, :T]
        )
        # padded tail rows are zero-length (never scored/trained)
        assert (np.asarray(db.audio_lengths)[nh:] == 0).all()
        assert (np.asarray(db.label_lengths)[nh:] == 0).all()
