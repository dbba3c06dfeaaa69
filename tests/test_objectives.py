"""Unsupervised objectives: EODM vs a numpy n-gram counter; WGAN-GP vs a
hand-derived penalty on a linear critic (SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from uasr.config import ModelConfig
from uasr.models import PhoneDiscriminator
from uasr.ops.eodm import build_ngram_table, eodm_loss, expected_ngram_logprobs
from uasr.ops.wgan import d_loss_fn, g_loss_fn, gradient_penalty


# ------------------------------------------------------------------ EODM


def test_build_ngram_table():
    seqs = [[1, 2, 3, 1, 2], [1, 2]]
    tab = build_ngram_table(seqs, order=2, top_k=3)
    # bigram (1,2) occurs 3x of 5 total bigrams
    assert tuple(tab.ids[0]) == (1, 2)
    np.testing.assert_allclose(tab.probs[0], 3 / 5 if len(tab.ids) == 3 else None)


def _np_expected_ngram(probs, lengths, ngrams):
    B, T, V = probs.shape
    K, n = ngrams.shape
    total = np.zeros(K)
    denom = 0
    for b in range(B):
        for t in range(max(lengths[b] - n + 1, 0)):
            denom += 1
            for k, g in enumerate(ngrams):
                p = 1.0
                for i, c in enumerate(g):
                    p *= probs[b, t + i, c]
                total[k] += p
    return np.log(np.maximum(total / max(denom, 1), 1e-10))


def test_expected_ngram_matches_numpy():
    rng = np.random.RandomState(0)
    B, T, V = 3, 12, 6
    logits = rng.randn(B, T, V).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    lengths = np.array([12, 7, 3])
    ngrams = np.array([[1, 2], [2, 2], [0, 5]], np.int32)
    ref = _np_expected_ngram(probs, lengths, ngrams)
    got = expected_ngram_logprobs(
        jnp.asarray(probs), jnp.asarray(lengths), jnp.asarray(ngrams)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4)


def test_eodm_loss_minimized_by_matching_stats():
    """A model whose output reproduces the text unigram/bigram stats has
    lower EODM loss than a mismatched one."""
    V = 5
    seqs = [[1, 2, 3, 4] * 5 for _ in range(4)]
    tab = build_ngram_table(seqs, order=2, top_k=8)
    tables = [(jnp.asarray(tab.ids), jnp.asarray(tab.probs))]
    T = 20
    # matched: frames cycle 1,2,3,4 with near-one-hot posteriors
    good = np.full((1, T, V), -8.0, np.float32)
    for t in range(T):
        good[0, t, 1 + t % 4] = 8.0
    # mismatched: constant phone 1
    bad = np.full((1, T, V), -8.0, np.float32)
    bad[:, :, 1] = 8.0
    lengths = jnp.array([T])
    l_good = float(eodm_loss(jnp.asarray(good), lengths, tables))
    l_bad = float(eodm_loss(jnp.asarray(bad), lengths, tables))
    assert l_good < l_bad


def test_eodm_gradients_finite():
    V, T = 5, 10
    tab = build_ngram_table([[1, 2, 3]] * 3, order=2, top_k=4)
    tables = [(jnp.asarray(tab.ids), jnp.asarray(tab.probs))]
    logits = jnp.asarray(np.random.RandomState(1).randn(2, T, V), jnp.float32)
    g = jax.grad(lambda lg: eodm_loss(lg, jnp.array([T, T]), tables))(logits)
    assert np.all(np.isfinite(np.asarray(g)))


# --------------------------------------------------------------- WGAN-GP


def test_gradient_penalty_linear_critic():
    """For D(x) = <w, x>, grad_x D = w for every interpolate, so
    GP = (||w|| - 1)^2 exactly."""
    B, T, V = 4, 6, 5
    rng = np.random.RandomState(0)
    w = rng.randn(T, V).astype(np.float32)

    def disc_apply(params, x, lengths):
        return jnp.sum(x * params, axis=(1, 2))

    real = jnp.asarray(rng.rand(B, T, V), jnp.float32)
    fake = jnp.asarray(rng.rand(B, T, V), jnp.float32)
    gp = gradient_penalty(
        disc_apply, jnp.asarray(w), real, fake, jnp.full((B,), T),
        jax.random.PRNGKey(0),
    )
    expected = (np.linalg.norm(w) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


def test_d_loss_and_double_backward():
    cfg = ModelConfig(disc_channels=16, disc_layers=2)
    V, T, B = 8, 16, 4
    disc = PhoneDiscriminator(cfg)
    rng = np.random.RandomState(1)
    real = jax.nn.one_hot(
        jnp.asarray(rng.randint(1, V, (B, T))), V
    )
    fake = jax.nn.softmax(jnp.asarray(rng.randn(B, T, V), jnp.float32))
    lengths = jnp.full((B,), T)
    params = disc.init(jax.random.PRNGKey(0), real, lengths)

    def loss(p):
        l, m = d_loss_fn(
            disc.apply, p, real, lengths, fake, lengths, 10.0,
            jax.random.PRNGKey(1),
        )
        return l

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(grads))
    assert float(g_loss_fn(disc.apply(params, fake, lengths))) == -float(
        jnp.mean(disc.apply(params, fake, lengths))
    )


def test_expected_ngram_k_chunk_equivalence():
    """K-chunked table scan (stretch-recipe memory bound) matches the
    unchunked computation, values and gradients."""
    rng = np.random.RandomState(3)
    B, T, V, K = 2, 10, 6, 7
    logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    lengths = jnp.asarray([10, 5])
    ngrams = jnp.asarray(rng.randint(0, V, size=(K, 3)), jnp.int32)
    probs = jax.nn.softmax(logits, -1)
    ref = expected_ngram_logprobs(probs, lengths, ngrams)
    for c in (1, 2, 3, 7, 100):
        got = expected_ngram_logprobs(probs, lengths, ngrams, k_chunk=c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)

    p_hat = jnp.asarray(rng.dirichlet(np.ones(K)).astype(np.float32))
    g_ref = jax.grad(lambda lg: eodm_loss(lg, lengths, [(ngrams, p_hat)]))(logits)
    g_chk = jax.grad(
        lambda lg: eodm_loss(lg, lengths, [(ngrams, p_hat)], k_chunk=3)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_ref), rtol=1e-4)


def test_ngram_table_save_load_roundtrip(tmp_path):
    from uasr.config import EODMConfig
    from uasr.ops.eodm import device_ngram_tables

    seqs = [[1, 2, 3, 1, 2, 4], [2, 3, 1, 2]]
    built = device_ngram_tables(EODMConfig(ngram_orders=(2, 3), top_k=5), seqs)
    # persist via the prepare-format npz and reload through ngram_path
    payload = {}
    for (ids, probs), n in zip(built, (2, 3)):
        payload[f"ids_{n}"] = np.asarray(ids)
        payload[f"probs_{n}"] = np.asarray(probs)
    path = str(tmp_path / "ngrams.npz")
    np.savez(path, **payload)
    loaded = device_ngram_tables(
        EODMConfig(ngram_orders=(2, 3), ngram_path=path), seqs
    )
    for (i1, p1), (i2, p2) in zip(built, loaded):
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


# -------------------------------------------------- generator regularizers


def test_smoothness_penalty_on_pre_merge_stream():
    """gan.smoothness_weight penalizes ||p_t - p_{t+1}||^2 on the RAW
    frame posteriors (wav2vec-U's anti-flicker term): a flickering
    generator output must score a strictly higher penalty than a
    piecewise-constant one, and the penalty must see the pre-merge
    stream (post-merge both streams look identical)."""
    import dataclasses

    from uasr.config import Config, FrontendConfig, GANConfig, TrainConfig
    from uasr.train import GANTrainer

    cfg = Config(
        name="sm",
        frontend=FrontendConfig(num_mel_bins=8),
        model=ModelConfig(classifier_hidden=8, classifier_layers=1),
        gan=GANConfig(smoothness_weight=2.0, merge_repeats=True),
        train=TrainConfig(),
        vocab_size=5,
    )
    tr = GANTrainer.__new__(GANTrainer)  # only _aux_penalties is exercised
    tr.cfg = cfg

    B, T, V = 2, 6, 5
    lengths = jnp.asarray([6, 4])
    flicker = jnp.asarray(
        np.stack([np.eye(V)[[1, 2, 1, 2, 1, 2]], np.eye(V)[[3, 4, 3, 4, 3, 4]]])
    ).astype(jnp.float32)
    constant = jnp.asarray(
        np.stack([np.eye(V)[[1, 1, 1, 2, 2, 2]], np.eye(V)[[3, 3, 4, 4, 4, 4]]])
    ).astype(jnp.float32)
    aux_f, aux_c = {}, {}
    lf = tr._aux_penalties(flicker, lengths, aux_f, 0.0,
                           raw_probs=flicker, raw_len=lengths)
    lc = tr._aux_penalties(constant, lengths, aux_c, 0.0,
                           raw_probs=constant, raw_len=lengths)
    assert float(lf) > float(lc) > 0.0
    # hand value for the flicker stream: every valid adjacent pair differs
    # in exactly two one-hot coordinates -> squared distance 2
    assert np.isclose(float(aux_f["g_smooth"]), 2.0, atol=1e-6)
    # padding beyond lengths must not contribute
    dirty = flicker.at[1, 4:].set(7.0)
    aux_d = {}
    ld = tr._aux_penalties(dirty, lengths, aux_d, 0.0,
                           raw_probs=dirty, raw_len=lengths)
    assert np.isclose(float(ld), float(lf), atol=1e-6)
