"""wav2vec-U-style segmental preprocessing: k-means quantizer, cluster-
change segmentation, segment pooling, and end-to-end GAN usage."""

import numpy as np

import jax
import jax.numpy as jnp

from uasr.ops.segment import (
    kmeans_fit,
    kmeans_segment_frontend,
    quantize,
    segment_pool,
)


def test_kmeans_recovers_blobs():
    rng = np.random.RandomState(0)
    centers = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, 5.0]])
    pts = np.concatenate(
        [c + 0.2 * rng.randn(100, 2) for c in centers], axis=0
    ).astype(np.float32)
    cents = kmeans_fit(pts, 3, iters=20)
    # every true center has a centroid within 0.5
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=1)) < 0.5


def test_quantize_nearest():
    cents = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    feats = jnp.asarray([[[1.0, 1.0], [9.0, 9.0], [0.2, -0.1]]])
    ids = quantize(feats, cents)
    assert list(np.asarray(ids[0])) == [0, 1, 0]


def test_segment_pool_matches_numpy():
    rng = np.random.RandomState(1)
    B, T, D = 2, 12, 4
    feats = rng.randn(B, T, D).astype(np.float32)
    ids = np.array([
        [0, 0, 1, 1, 1, 2, 2, 0, 0, 0, 5, 5],
        [3, 3, 3, 3, 1, 1, 0, 0, 0, 0, 0, 0],
    ])
    lengths = np.array([12, 6])
    pooled, seg_len = segment_pool(
        jnp.asarray(feats), jnp.asarray(lengths), jnp.asarray(ids)
    )
    # reference: python run-length segmentation
    for b in range(B):
        segs = []
        start = 0
        for t in range(1, lengths[b]):
            if ids[b, t] != ids[b, t - 1]:
                segs.append((start, t))
                start = t
        segs.append((start, lengths[b]))
        assert int(seg_len[b]) == len(segs)
        for s, (lo, hi) in enumerate(segs):
            np.testing.assert_allclose(
                np.asarray(pooled[b, s]), feats[b, lo:hi].mean(0), atol=1e-5
            )
        # segments past the count are zero
        assert np.all(np.asarray(pooled[b, len(segs):]) == 0)


def test_tone_corpus_segments_approximate_phones():
    """On the synthetic tone language, cluster changes should land near
    phone boundaries: segments per utterance ~ phones per utterance."""
    from uasr.config import FrontendConfig
    from uasr.data.dataset import make_synthetic_dataset
    from uasr.frontend import oracle
    from uasr.frontend.features import compute_features, make_frontend_state

    examples, vocab = make_synthetic_dataset(num_utts=12, num_phones=5, seed=3)
    cfg = FrontendConfig(num_mel_bins=24, cmvn="utterance")
    fe = make_frontend_state(cfg)
    # fit centroids on the SAME feature distribution that will be
    # quantized (the on-device per-utterance-CMVN path)
    frame_list = []
    for audio, _ in examples[:6]:
        f, fl = compute_features(
            jnp.asarray(audio)[None], jnp.asarray([len(audio)]), fe, cfg
        )
        frame_list.append(np.asarray(f[0, : int(fl[0])]))
    frames = np.concatenate(frame_list, axis=0).astype(np.float32)
    cents = kmeans_fit(frames, 5, iters=15)

    ratios = []
    for audio, ids in examples[6:]:
        L = len(audio)
        feats, flen = compute_features(
            jnp.asarray(audio)[None], jnp.asarray([L]), fe, cfg
        )
        pooled, seg_len = kmeans_segment_frontend(
            feats, flen, jnp.asarray(cents), smooth_passes=3
        )
        ratios.append(int(seg_len[0]) / len(ids))
    mean_ratio = float(np.mean(ratios))
    # coarse sanity: segments track phones within a small factor (k-means
    # splits some tones into two clusters on this noisy toy corpus; the
    # frame rate is ~12x the phone rate, so anything near 1-3x means the
    # segmentation is doing real work)
    assert 0.5 < mean_ratio < 3.0, mean_ratio


def test_gan_with_kmeans_segmenter():
    from uasr.config import Config, FrontendConfig, GANConfig, ModelConfig, TrainConfig
    from uasr.data.dataset import Batch, TextBatch, batch_iterator, make_synthetic_dataset
    from uasr.train import GANTrainer

    examples, vocab = make_synthetic_dataset(num_utts=16, num_phones=5, seed=4)
    rng = np.random.RandomState(0)
    cents = rng.randn(6, 40).astype(np.float32)
    cfg = Config(
        frontend=FrontendConfig(num_mel_bins=40, cmvn="utterance"),
        model=ModelConfig(classifier_hidden=32, classifier_layers=2,
                          classifier_context=1, disc_channels=16, disc_layers=2),
        gan=GANConfig(segmenter="kmeans", max_segments=64, disc_steps=1),
        train=TrainConfig(total_steps=2),
        vocab_size=len(vocab),
    )
    trainer = GANTrainer(cfg, centroids=cents)
    it = batch_iterator(examples, 8, 16000, 8)
    text = TextBatch(np.full((8, 6), 2, np.int32), np.full((8,), 6, np.int32))
    state = trainer.init_state(jax.random.PRNGKey(0), next(it), text)
    d_step = trainer.jitted("d_step")
    g_step = trainer.jitted("g_step")
    a = Batch(*map(jnp.asarray, next(it)))
    t = TextBatch(*map(jnp.asarray, text))
    state, d_aux = d_step(state, a, t, jax.random.PRNGKey(1))
    state, g_aux = g_step(state, a, jax.random.PRNGKey(2))
    assert np.isfinite(float(d_aux["d_loss"]))
    assert np.isfinite(float(g_aux["g_loss"]))


def test_mode_filter_ignores_padding_votes():
    """A short final phone run must survive the windowed majority vote
    even when the padding frames past the utterance end quantize to a
    different (zero-vector) cluster."""
    from uasr.ops.segment import mode_filter

    ids = jnp.asarray([[1, 1, 1, 2, 2, 0, 0, 0]], jnp.int32)
    lengths = jnp.asarray([5], jnp.int32)
    out = mode_filter(ids, num_clusters=3, radius=3, lengths=lengths)
    np.testing.assert_array_equal(
        np.asarray(out[0, :5]), np.array([1, 1, 1, 2, 2])
    )
    # without lengths, the padding cluster outvotes the 2-frame run
    bad = mode_filter(ids, num_clusters=3, radius=3)
    assert int(bad[0, 4]) == 0
