"""Self-supervised pretraining: InfoNCE loss vs a numpy oracle, model
padding invariance, learning on the synthetic tone corpus, and the full
pretrain -> featurize -> downstream-cache pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.config import Config, DataConfig, ModelConfig, SSLConfig, TrainConfig
from uasr.ops.infonce import info_nce_loss, sample_negatives


def _nce_oracle(preds, z, lengths, temperature, neg_indices=None):
    """Straightforward per-pair loop implementing the InfoNCE definition."""
    B, T, K, C = preds.shape

    def norm(v):
        return v / np.sqrt(np.sum(v * v) + 1e-8)

    losses, wins = [], []
    for b in range(B):
        L = int(lengths[b])
        for t in range(T):
            for k in range(K):
                s_target = t + k + 1
                if s_target >= L:
                    continue
                p = norm(preds[b, t, k])
                pos = float(p @ norm(z[b, s_target])) / temperature
                if neg_indices is None:
                    cand = [float(p @ norm(z[b, s])) / temperature
                            for s in range(L)]
                    negs = [c for s, c in enumerate(cand) if s != s_target]
                else:
                    negs = [float(p @ norm(z[b, int(s)])) / temperature
                            for s in neg_indices[b] if int(s) != s_target]
                all_sc = np.array([pos] + negs)
                m = all_sc.max()
                losses.append(-(pos - m) + np.log(np.sum(np.exp(all_sc - m))))
                wins.append(float(pos >= (max(negs) if negs else -np.inf)))
    return float(np.mean(losses)), float(np.mean(wins))


@pytest.mark.parametrize("sampled", [False, True])
def test_infonce_matches_oracle(sampled):
    rng = np.random.RandomState(0)
    B, T, K, C = 3, 9, 2, 5
    preds = rng.randn(B, T, K, C).astype(np.float32)
    z = rng.randn(B, T, C).astype(np.float32)
    lengths = np.array([9, 6, 3], np.int32)
    neg = None
    if sampled:
        neg = np.stack([
            rng.randint(0, max(int(l), 1), size=7) for l in lengths
        ]).astype(np.int32)
    loss, acc = info_nce_loss(
        jnp.asarray(preds), jnp.asarray(z), jnp.asarray(lengths),
        temperature=0.2,
        neg_indices=None if neg is None else jnp.asarray(neg),
    )
    ref_loss, ref_acc = _nce_oracle(preds, z, lengths, 0.2, neg)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(acc), ref_acc, rtol=1e-6, atol=1e-6)


def test_sample_negatives_in_range():
    lengths = jnp.asarray([50, 3, 1], jnp.int32)
    neg = sample_negatives(jax.random.PRNGKey(0), lengths, 64, 80)
    neg = np.asarray(neg)
    assert neg.shape == (3, 64)
    for b, L in enumerate([50, 3, 1]):
        assert neg[b].min() >= 0 and neg[b].max() < L


def _ssl_cfg(**kw):
    ssl = SSLConfig(
        conv_channels=(64, 64, 64),
        # L1 kernel 64 samples = 4 ms: one full period of the lowest
        # synthetic tone (250 Hz); a 16-sample window cannot resolve it
        conv_kernels=(64, 10, 8),
        conv_strides=(8, 5, 4),
        context_hidden=32,
        predict_steps=3,
        num_negatives=0,
    )
    return Config(
        name="ssl_test", model_dir=kw.pop("model_dir", "/tmp/ssl_test"),
        ssl=ssl,
        model=ModelConfig(dtype="float32"),
        data=DataConfig(synthetic=True, synthetic_num_utts=32,
                        batch_size=8, max_audio_seconds=1.2,
                        max_label_len=12),
        train=TrainConfig(mode="ssl", total_steps=60, lr=2e-3,
                          warmup_steps=5, eval_every=1000,
                          save_every=60, log_every=20),
        vocab_size=10,
        **kw,
    )


def test_cpc_model_padding_invariance():
    from uasr.models.ssl import CPCModel

    cfg = _ssl_cfg()
    model = CPCModel(cfg.ssl, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    L = 4000
    audio = rng.randn(2, L).astype(np.float32)
    lengths = np.array([L, L // 2], np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                        jnp.asarray(lengths))
    z1, c1, p1, f1 = model.apply(params, jnp.asarray(audio),
                                 jnp.asarray(lengths))
    # same content, extra padding appended
    audio_pad = np.concatenate(
        [audio, np.zeros((2, 960), np.float32)], axis=1
    )
    z2, c2, p2, f2 = model.apply(params, jnp.asarray(audio_pad),
                                 jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    n = int(f1[1])
    np.testing.assert_allclose(
        np.asarray(z1)[1, :n], np.asarray(z2)[1, :n], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(c1)[1, :n], np.asarray(c2)[1, :n], atol=2e-5
    )


@pytest.mark.slow
def test_ssl_pretraining_learns(tmp_path):
    """Contrastive accuracy on the tone corpus should rise well above
    the ~1/T chance of picking the right future frame."""
    from uasr.data.dataset import batch_iterator, make_synthetic_dataset
    from uasr.pretrain import SSLTrainer

    cfg = _ssl_cfg(model_dir=str(tmp_path / "exp"))
    examples, _ = make_synthetic_dataset(num_utts=32, num_phones=8, seed=0)
    batches = batch_iterator(
        examples, batch_size=8,
        max_audio_samples=int(1.2 * 16000), max_label_len=12,
        seed=0, num_epochs=None,
    )
    trainer = SSLTrainer(cfg)
    it = iter(batches)
    first = next(it)
    from uasr.data.dataset import Batch

    state = trainer.init_state(jax.random.PRNGKey(0), Batch(*first))
    step_fn = trainer.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    first_loss = last = None
    for i in range(80):
        b = Batch(*(first if i == 0 else next(it)))
        rng, sub = jax.random.split(rng)
        state, aux = step_fn(state, b, sub)
        if first_loss is None:
            first_loss = float(aux["nce_loss"])
        last = aux
    assert float(last["nce_loss"]) < 0.7 * first_loss
    assert float(last["nce_acc"]) > 0.25  # chance ~1/60 valid positions


@pytest.mark.slow
def test_pretrain_featurize_downstream_pipeline(tmp_path):
    """The self-contained wav2vec-U loop: pretrain (API) -> featurize ->
    feature cache -> GAN trainer consumes the cached features."""
    from uasr.cli import _batches, _load_source
    from uasr.data.cache import FeatureCache, feature_batch_iterator
    from uasr.data.dataset import Batch, TextBatch
    from uasr.pretrain import run_ssl_pretraining
    from uasr.tools.featurize import dump_features

    cfg = _ssl_cfg(model_dir=str(tmp_path / "exp"))
    cfg.train.total_steps = 30
    cfg.train.save_every = 30
    source, vocab = _load_source(cfg, "train")
    run_ssl_pretraining(cfg, _batches(cfg, source, seed=0))

    out = str(tmp_path / "feats")
    n = dump_features(cfg, source, out)
    assert n == 32
    cache = FeatureCache(out)
    utt, feats, ids = cache.example(0)
    assert feats.ndim == 2 and feats.shape[1] == cfg.ssl.context_hidden
    assert len(ids) > 0  # transcripts preserved for downstream eval

    # downstream: GAN trainer runs on the cached features (3-dim batch
    # bypasses the frontend)
    from uasr.train import GANTrainer

    gcfg = cfg.replace()
    gcfg.model.encoder = "classifier"
    gcfg.model.classifier_hidden = 32
    gcfg.model.classifier_layers = 1
    gcfg.model.disc_channels = 16
    gcfg.model.disc_layers = 1
    gcfg.train.mode = "gan"
    gcfg.gan.disc_steps = 1
    fit = feature_batch_iterator(cache, batch_size=8, max_frames=128,
                                 max_label_len=12, seed=0)
    first = Batch(*next(fit))
    text = [list(ids) for _, _, ids in cache if len(ids)]
    tb = TextBatch(
        np.array([t[:4] + [0] * (4 - len(t[:4])) for t in text[:8]],
                 np.int32),
        np.array([min(len(t), 4) for t in text[:8]], np.int32),
    )
    gan = GANTrainer(gcfg)
    gstate = gan.init_state(jax.random.PRNGKey(0), first, tb)
    d_step = jax.jit(gan.d_step)
    rng = jax.random.PRNGKey(2)
    gstate, aux = d_step(gstate, first, tb, rng)
    assert np.isfinite(float(aux["d_loss"]))


@pytest.mark.slow
def test_ssl_linear_probe_ctc(tmp_path):
    """Quality probe: a small CTC classifier trained on FROZEN cached
    SSL features reaches low PER — the contrastive representation
    carries phone identity, not just local signal statistics."""
    from uasr.cli import _batches, _load_source
    from uasr.data.cache import FeatureCache, feature_batch_iterator
    from uasr.data.dataset import Batch
    from uasr.pretrain import run_ssl_pretraining
    from uasr.tools.featurize import dump_features
    from uasr.train import CTCTrainer

    cfg = _ssl_cfg(model_dir=str(tmp_path / "exp"))
    cfg.train.total_steps = 300
    cfg.train.save_every = 300
    cfg.data.synthetic_num_utts = 64
    source, vocab = _load_source(cfg, "train")
    run_ssl_pretraining(cfg, _batches(cfg, source, seed=0))
    out = str(tmp_path / "feats")
    # probe the conv latents: frame-local (the causal context smears
    # phone boundaries, which a frame-rate CTC probe then has to undo)
    dump_features(cfg, source, out, layer="latents")

    pcfg = cfg.replace()
    pcfg.model.encoder = "classifier"
    pcfg.model.classifier_hidden = 128
    pcfg.model.classifier_layers = 2
    pcfg.model.classifier_context = 2
    pcfg.train.mode = "ctc"
    pcfg.train.lr = 2e-3
    cache = FeatureCache(out)

    def batches():
        return feature_batch_iterator(
            cache, batch_size=8, max_frames=128, max_label_len=12, seed=0
        )

    probe = CTCTrainer(pcfg)
    it = iter(batches())
    first = Batch(*next(it))
    state = probe.init_state(jax.random.PRNGKey(0), first)
    step_fn = probe.jitted_train_step()
    rng = jax.random.PRNGKey(1)
    for i, b in zip(range(300), it):
        rng, sub = jax.random.split(rng)
        state, aux = step_fn(state, Batch(*b), sub)
    import itertools

    per = probe.evaluate(
        state.params, itertools.islice(batches(), 4)
    )
    # Calibration (measured): chance 0.87; the SAME probe on raw fbank
    # reaches 0.0 (supervised upper bound); frozen CPC latents reach
    # 0.39-0.43 across configs (K=3 wide-kernel 0.39, K=8 0.43, context
    # layer 0.52). CPC on pure sinusoids must encode phase-within-phone
    # to win the in-utterance task, so phone identity is present but
    # entangled — the repo's unsupervised-GAN milestone on fbank is the
    # apt comparison (PER 0.39-0.55, tests/test_unsup_integration.py).
    assert per < 0.55, per


def test_ssl_fbank_input_type(tmp_path):
    """input_type=fbank: the SSL encoder consumes the log-mel frontend
    output (frame-rate convs) instead of raw waveform; one train step is
    finite and featurize dumps context-sized features."""
    from uasr.cli import _batches, _load_source
    from uasr.data.dataset import Batch
    from uasr.pretrain import SSLTrainer

    cfg = _ssl_cfg(model_dir=str(tmp_path / "exp"))
    cfg.ssl.input_type = "fbank"
    cfg.ssl.fbank_conv_channels = (32, 32)
    cfg.ssl.fbank_conv_kernels = (3, 3)
    cfg.ssl.fbank_conv_strides = (1, 1)
    cfg.frontend.num_mel_bins = 24
    source, _ = _load_source(cfg, "train")
    it = iter(_batches(cfg, source, seed=0))
    first = Batch(*next(it))
    trainer = SSLTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    state, aux = trainer.jitted_train_step()(
        state, first, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(aux["nce_loss"]))
    z, c, preds, flen = trainer.encode(
        state.params, first.audio, first.audio_lengths
    )
    assert c.shape[-1] == cfg.ssl.context_hidden
    # frame rate matches the frontend (10 ms hop), not the waveform path
    assert int(flen[0]) <= first.audio.shape[1] // 160 + 1


def test_fused_infonce_matches_unfused():
    """ssl.fused_loss (round 5): the heads-folded, time-chunked loss
    must reproduce info_nce_loss(preds=heads(c), ...) — values AND
    gradients w.r.t. c, heads kernel/bias, and z — including a T that
    is not a multiple of the chunk."""
    from uasr.ops.infonce import info_nce_loss_fused

    rng = np.random.RandomState(0)
    B, T, Ch, K, C, N = 3, 50, 16, 4, 12, 9
    c = jnp.asarray(rng.randn(B, T, Ch), jnp.float32)
    w = jnp.asarray(0.3 * rng.randn(Ch, K * C), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(K * C), jnp.float32)
    z = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    lengths = jnp.asarray([50, 37, 12], jnp.int32)
    neg = jnp.asarray(rng.randint(0, 12, size=(B, N)), jnp.int32)

    def unfused(c, w, b, z):
        preds = (c @ w + b).reshape(B, T, K, C)
        return info_nce_loss(preds, z, lengths, temperature=0.1,
                             neg_indices=neg)

    def fused(c, w, b, z):
        return info_nce_loss_fused(c, w, b, z, lengths, num_steps=K,
                                   temperature=0.1, neg_indices=neg,
                                   chunk=16)  # 50 = 3*16 + 2 (ragged)

    (l0, a0) = jax.jit(unfused)(c, w, b, z)
    (l1, a1) = jax.jit(fused)(c, w, b, z)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(a0), float(a1), rtol=1e-6)

    g0 = jax.jit(jax.grad(lambda *a: unfused(*a)[0],
                          argnums=(0, 1, 2, 3)))(c, w, b, z)
    g1 = jax.jit(jax.grad(lambda *a: fused(*a)[0],
                          argnums=(0, 1, 2, 3)))(c, w, b, z)
    for x0, x1 in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                   rtol=2e-4, atol=2e-6)


def test_fused_loss_trainer_parity(tmp_path):
    """SSLTrainer with ssl.fused_loss=True computes the same loss/acc
    (and interchangeable params) as the unfused trainer."""
    from uasr.data.dataset import Batch, batch_iterator, make_synthetic_dataset
    from uasr.pretrain import SSLTrainer

    examples, _ = make_synthetic_dataset(num_utts=8, num_phones=6, seed=0)
    cfg = Config(
        name="fused_ssl", model_dir=str(tmp_path),
        model=ModelConfig(dtype="float32"),
        ssl=SSLConfig(conv_channels=(32, 32), conv_kernels=(10, 8),
                      conv_strides=(80, 2), context_hidden=32,
                      predict_steps=3, num_negatives=8,
                      loss_chunk=16),
        data=DataConfig(batch_size=8, max_audio_seconds=1.6,
                        max_label_len=12),
        train=TrainConfig(mode="ssl", total_steps=1),
        vocab_size=8,
    )
    import dataclasses

    batch = Batch(*next(batch_iterator(examples, 8, 25600, 12,
                                       num_epochs=1)))
    t0 = SSLTrainer(cfg)
    s0 = t0.init_state(jax.random.PRNGKey(0), batch)
    cfg_f = cfg.replace(ssl=dataclasses.replace(cfg.ssl, fused_loss=True))
    t1 = SSLTrainer(cfg_f)
    # params are interchangeable between fused/unfused models
    rng = jax.random.PRNGKey(7)
    l0, _ = t0._loss(s0.params, batch, rng)
    l1, _ = t1._loss(s0.params, batch, rng)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
