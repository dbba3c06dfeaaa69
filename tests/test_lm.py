"""Shallow-fusion LM + unsupervised model selection: the label-free
selection metric must rank text-like transcriptions above garbage
(wav2vec-U's validation trick; SURVEY.md lineage — the reference had no
model selection beyond keep-latest)."""

import numpy as np

from uasr.ops.lm import (
    build_bigram_lm, build_unigram, load_lm, load_unigram, save_lm,
    unsup_selection_score,
)


def _corpus(rng, n=200):
    """Markov-ish corpus over tokens 1..5 (0 reserved = blank)."""
    seqs = []
    trans = {1: [2, 3], 2: [3], 3: [4, 1], 4: [5], 5: [1, 2]}
    for _ in range(n):
        tok = int(rng.choice([1, 3, 5]))
        seq = [tok]
        for _ in range(rng.randint(3, 9)):
            tok = int(rng.choice(trans[tok]))
            seq.append(tok)
        seqs.append(seq)
    return seqs


def test_selection_score_ranks_real_text_above_garbage():
    rng = np.random.RandomState(0)
    corpus = _corpus(rng)
    V = 6
    lm = build_bigram_lm(corpus[:150], V, exclude=(0,))
    uni = build_unigram(corpus[:150], V, exclude=(0,))

    held_out = corpus[150:]
    lens = np.asarray([len(s) for s in held_out])
    good = unsup_selection_score(held_out, lens, lm, uni)

    garbage = [list(rng.randint(1, V, len(s))) for s in held_out]
    bad = unsup_selection_score(garbage, lens, lm, uni)

    # a constant-token output: great LM score possible, terrible usage
    const = [[4] * len(s) for s in held_out]
    degen = unsup_selection_score(const, lens, lm, uni, kl_weight=1.0)

    assert good["score"] > bad["score"]
    assert good["score"] > degen["score"]
    assert good["lm_logprob_per_token"] > bad["lm_logprob_per_token"]
    # silence must never win
    empty = unsup_selection_score([[]], np.asarray([0]), lm, uni)
    assert empty["score"] < bad["score"]


def test_lm_save_load_roundtrip_with_unigram(tmp_path):
    rng = np.random.RandomState(1)
    corpus = _corpus(rng, n=20)
    lm = build_bigram_lm(corpus, 6, exclude=(0,))
    uni = build_unigram(corpus, 6, exclude=(0,))
    p = str(tmp_path / "lm.npz")
    save_lm(p, lm, unigram=uni)
    np.testing.assert_array_equal(load_lm(p), lm)
    np.testing.assert_array_equal(load_unigram(p), uni)


def test_gan_selector_tracks_best_checkpoint(tmp_path):
    """run_gan_training with gan.select_lm_path logs the unsupervised
    score and writes model_dir/best_ckpt — no labels consulted."""
    import jax

    from uasr.config import (
        Config, DataConfig, FrontendConfig, GANConfig, ModelConfig,
        TrainConfig,
    )
    from uasr.data.dataset import batch_iterator, make_synthetic_dataset
    from uasr.train import run_gan_training

    vocab_size = 8
    examples, _vocab = make_synthetic_dataset(
        num_utts=24, num_phones=vocab_size - 2, seed=0, syntax="markov"
    )
    lm = build_bigram_lm([e[1] for e in examples], vocab_size, exclude=(0,))
    uni = build_unigram([e[1] for e in examples], vocab_size, exclude=(0,))
    lm_path = str(tmp_path / "lm.npz")
    save_lm(lm_path, lm, unigram=uni)

    cfg = Config(
        name="sel",
        model_dir=str(tmp_path / "exp"),
        frontend=FrontendConfig(num_mel_bins=16, cmvn="utterance",
                                downsample=3),
        model=ModelConfig(encoder="classifier", classifier_hidden=16,
                          classifier_layers=1, disc_channels=8,
                          disc_layers=1),
        gan=GANConfig(disc_steps=1, select_lm_path=lm_path),
        data=DataConfig(batch_size=8, max_audio_seconds=2.0,
                        max_label_len=12),
        train=TrainConfig(total_steps=4, eval_every=2, save_every=4,
                          log_every=2, lr=1e-3),
        vocab_size=vocab_size,
    )

    def batches():
        return batch_iterator(examples, 8, 32000, 12, num_epochs=None)

    text = [e[1] for e in examples]
    run_gan_training(cfg, batches(), text,
                     dev_batches_fn=lambda: batch_iterator(
                         examples, 8, 32000, 12, num_epochs=1))
    import os

    assert os.path.isdir(os.path.join(cfg.model_dir, "best_ckpt"))
    import json

    lines = [json.loads(ln) for ln in open(
        os.path.join(cfg.model_dir, "metrics.jsonl"))]
    dev = [ln for ln in lines if ln.get("tag") == "dev"]
    assert any("unsup_score" in ln for ln in dev), dev


def test_selector_best_score_survives_restart(tmp_path):
    """A resumed run must not clobber best_ckpt with a worse checkpoint:
    the best score persists in best_ckpt/score.json."""
    import json
    import os

    from uasr.config import Config, FrontendConfig, GANConfig, TrainConfig
    from uasr.train import UnsupSelector

    rng = np.random.RandomState(0)
    corpus = _corpus(rng, n=30)
    lm = build_bigram_lm(corpus, 6, exclude=(0,))
    uni = build_unigram(corpus, 6, exclude=(0,))
    lm_path = str(tmp_path / "lm.npz")
    save_lm(lm_path, lm, unigram=uni)
    cfg = Config(
        name="sel2", model_dir=str(tmp_path / "exp"),
        frontend=FrontendConfig(num_mel_bins=8),
        gan=GANConfig(select_lm_path=lm_path),
        train=TrainConfig(), vocab_size=6,
    )
    os.makedirs(cfg.model_dir, exist_ok=True)
    s1 = UnsupSelector(cfg)
    assert s1.update(0.5, 3, {"dummy": np.zeros(2)})
    assert not s1.update(0.2, 4, {"dummy": np.zeros(2)})
    s1.close()
    # "restart": a fresh selector restores the recorded best
    s2 = UnsupSelector(cfg)
    assert s2.best == 0.5
    assert not s2.update(0.3, 5, {"dummy": np.zeros(2)})
    s2.close()
    rec = json.load(open(os.path.join(cfg.model_dir, "best_ckpt",
                                      "score.json")))
    assert rec == {"score": 0.5, "step": 3}


def test_selector_rejects_mismatched_lm(tmp_path):
    from uasr.config import Config, FrontendConfig, GANConfig, TrainConfig
    from uasr.train import UnsupSelector

    lm = build_bigram_lm([[1, 2]], 4, exclude=(0,))  # [5, 4] table
    lm_path = str(tmp_path / "lm.npz")
    save_lm(lm_path, lm)
    cfg = Config(
        name="selbad", model_dir=str(tmp_path / "exp"),
        frontend=FrontendConfig(num_mel_bins=8),
        gan=GANConfig(select_lm_path=lm_path),
        train=TrainConfig(), vocab_size=9,  # mismatch
    )
    try:
        UnsupSelector(cfg)
    except ValueError as e:
        assert "does not match" in str(e)
    else:
        raise AssertionError("shape mismatch not rejected")
