"""run_inference: PER/RTF reporting, hyp files, TIMIT-folded scoring."""

import itertools

import numpy as np

import jax

from uasr.config import Config, FrontendConfig, ModelConfig, TrainConfig
from uasr.data.dataset import batch_iterator, make_synthetic_dataset
from uasr.infer import run_inference
from uasr.train import CTCTrainer
from uasr.vocab import Vocab


def _setup():
    examples, vocab = make_synthetic_dataset(num_utts=16, num_phones=6, seed=6)
    cfg = Config(
        frontend=FrontendConfig(num_mel_bins=40),
        model=ModelConfig(encoder="cnn", hidden_size=32, num_conv_layers=1),
        train=TrainConfig(total_steps=1),
        vocab_size=len(vocab),
    )
    trainer = CTCTrainer(cfg)
    first = next(iter(batch_iterator(examples, 8, 16000, 8, shuffle=False)))
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    return cfg, trainer, state, examples, vocab


def _batches(examples, n=2):
    return itertools.islice(
        batch_iterator(examples, 8, 16000, 8, shuffle=False), n
    )


def test_inference_report(tmp_path):
    cfg, trainer, state, examples, vocab = _setup()
    hyp = str(tmp_path / "hyp.txt")
    res = run_inference(cfg, trainer, state, _batches(examples), vocab=vocab,
                        hyp_path=hyp)
    assert 0 <= res["per"] <= 10.0  # untrained model: hyps much longer than refs
    assert res["rtf"] > 0 and res["audio_seconds"] > 0
    lines = open(hyp).read().strip().split("\n")
    assert len(lines) == 16


def test_viterbi_infer_path(tmp_path):
    """ctc.use_viterbi decodes through the LM-transition HMM — bigram
    AND trigram tables (the trigram pair-state lattice, round 4) —
    with loud shape validation."""
    import dataclasses

    import pytest

    from uasr.ops.lm import build_bigram_lm, build_trigram_lm, save_lm

    cfg, trainer, state, examples, vocab = _setup()
    V = len(vocab)
    seqs = [ids for _a, ids in examples]
    lm_path = str(tmp_path / "lm.npz")
    save_lm(lm_path, build_bigram_lm(seqs, V, exclude=(0,)))
    cfg.ctc = dataclasses.replace(
        cfg.ctc, use_viterbi=True, lm_path=lm_path
    )
    res = run_inference(cfg, trainer, state, _batches(examples), vocab=vocab)
    assert 0 <= res["per"] <= 10.0 and res["rtf"] > 0

    # trigram tables decode through the (prev, cur) pair-state HMM
    tri_path = str(tmp_path / "lm3.npz")
    save_lm(tri_path, build_trigram_lm(seqs, V, exclude=(0,)))
    cfg.ctc = dataclasses.replace(cfg.ctc, lm_path=tri_path)
    res3 = run_inference(cfg, trainer, state, _batches(examples),
                         vocab=vocab)
    assert 0 <= res3["per"] <= 10.0 and res3["rtf"] > 0

    # mismatched tables still fail loudly, not silently
    bad_path = str(tmp_path / "bad.npz")
    save_lm(bad_path, build_bigram_lm(seqs, V + 3, exclude=(0,)))
    cfg.ctc = dataclasses.replace(cfg.ctc, lm_path=bad_path)
    with pytest.raises(ValueError, match="bigram"):
        run_inference(cfg, trainer, state, _batches(examples), vocab=vocab)

    cfg.ctc = dataclasses.replace(cfg.ctc, lm_path=None)
    with pytest.raises(ValueError, match="lm_path"):
        run_inference(cfg, trainer, state, _batches(examples), vocab=vocab)


def test_folded_scoring():
    """With fold_timit=True a host-side folded PER is reported; folding
    'ao'->'aa' means the two symbols stop counting as errors."""
    cfg, trainer, state, examples, vocab = _setup()
    # rename two phones to a TIMIT fold pair so the fold actually fires
    vocab2 = Vocab(tokens=[t if t != "p1" else "ao" for t in
                           [t if t != "p2" else "aa" for t in vocab.tokens]],
                   blank_id=vocab.blank_id)
    res = run_inference(cfg, trainer, state, _batches(examples),
                        vocab=vocab2, fold_timit=True)
    assert "per_folded" in res
    assert 0 <= res["per_folded"] <= res["per"] + 1e-9 + 2.0
