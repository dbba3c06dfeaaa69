"""wav2vec-U prep transforms: streaming PCA vs a direct eigendecomposition
oracle, reservoir uniformity, adjacent-cluster pooling, and the
featurize integration (fit on train, reuse on dev)."""

import numpy as np
import pytest

from uasr.data import transforms as T


def test_streaming_pca_matches_direct():
    rng = np.random.RandomState(0)
    # anisotropic data: random covariance with distinct spectrum
    D = 12
    A = rng.randn(D, D)
    X = rng.randn(5000, D) @ A + rng.randn(D)
    acc = T.StreamingPCA()
    for block in np.array_split(X, 13):
        acc.update(block)
    pca = acc.finalize(5)
    # direct oracle
    mean = X.mean(0)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:5]
    np.testing.assert_allclose(pca.mean, mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pca.explained, evals[order], rtol=1e-4)
    # components match up to sign
    for i in range(5):
        dot = abs(float(pca.components[i] @ evecs[:, order[i]]))
        assert dot > 1 - 1e-5
    # projection decorrelates: off-diagonal covariance ~ 0, variances
    # equal the eigenvalues in descending order
    Y = pca(X)
    cy = np.cov(Y.T, bias=True)
    np.testing.assert_allclose(np.diag(cy), evals[order], rtol=1e-4)
    off = cy - np.diag(np.diag(cy))
    assert np.abs(off).max() < 1e-3 * evals.max()


def test_pca_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    acc = T.StreamingPCA()
    X = rng.randn(300, 6).astype(np.float32)
    acc.update(X)
    pca = acc.finalize(3)
    path = str(tmp_path / "pca.npz")
    pca.save(path)
    pca2 = T.PCATransform.load(path)
    np.testing.assert_array_equal(pca(X), pca2(X))


def test_reservoir_capacity_and_uniformity():
    rng_stream = np.random.RandomState(2)
    # stream of 1-d frames carrying their own global index
    N, cap = 20_000, 500
    res = T.Reservoir(cap, seed=3)
    data = np.arange(N, dtype=np.float32)[:, None]
    start = 0
    while start < N:
        m = rng_stream.randint(1, 700)
        res.update(data[start : start + m])
        start += m
    s = res.sample()
    assert s.shape == (cap, 1)
    idx = s[:, 0].astype(np.int64)
    # all sampled values are real stream elements, no duplicates
    assert len(np.unique(idx)) == cap
    assert idx.min() >= 0 and idx.max() < N
    # uniform over the stream: the mean index is near N/2 (std of the
    # mean of 500 uniform draws over [0, N) is ~N/sqrt(12*500) ≈ 258)
    assert abs(idx.mean() - N / 2) < 4 * N / np.sqrt(12 * cap)


def test_pool_adjacent_runs():
    f = np.array(
        [[0.0], [2.0], [4.0], [6.0], [8.0], [10.0]], np.float32
    )
    ids = np.array([5, 5, 1, 1, 1, 2])
    pooled = T.pool_adjacent(f, ids)
    np.testing.assert_allclose(pooled, [[1.0], [6.0], [10.0]])
    # single run collapses to one row
    np.testing.assert_allclose(
        T.pool_adjacent(f, np.zeros(6, np.int64)), [[5.0]]
    )


def test_assign_clusters_nearest():
    c = np.array([[0.0, 0.0], [10.0, 10.0]], np.float32)
    f = np.array([[1.0, -1.0], [9.0, 11.0], [4.0, 4.0]], np.float32)
    np.testing.assert_array_equal(T.assign_clusters(f, c), [0, 1, 0])


@pytest.mark.slow
def test_featurize_pca_pool_and_reuse(tmp_path):
    """featurize --pca --pool-kmeans fits on train and writes the
    artifacts; a second dump with --transforms-from reuses them (same
    projection => same feature subspace), and pooled caches hold
    shorter, reduced-dim features."""
    import jax

    from test_ssl import _ssl_cfg
    from uasr.cli import _batches, _load_source
    from uasr.data.cache import FeatureCache
    from uasr.pretrain import run_ssl_pretraining
    from uasr.tools.featurize import dump_features

    cfg = _ssl_cfg(model_dir=str(tmp_path / "exp"))
    cfg.train.total_steps = 20
    cfg.train.save_every = 20
    source, vocab = _load_source(cfg, "train")
    run_ssl_pretraining(cfg, _batches(cfg, source, seed=0))

    raw = str(tmp_path / "raw")
    n_raw = dump_features(cfg, source, raw)
    raw_cache = FeatureCache(raw)
    _, f_raw, _ = raw_cache.example(0)

    out = str(tmp_path / "train_feats")
    n = dump_features(cfg, source, out, pca_dim=8, pool_clusters=6,
                      sample_frames=5000)
    assert n == n_raw
    assert (tmp_path / "train_feats" / "pca.npz").exists()
    assert (tmp_path / "train_feats" / "pool_kmeans.npz").exists()
    cache = FeatureCache(out)
    _, f, _ = cache.example(0)
    assert f.shape[1] == 8
    assert f.shape[0] <= f_raw.shape[0]  # pooling never lengthens

    # reuse the fitted transforms for a "dev" dump: identical features
    # for identical inputs (same source here), zero refitting
    dev = str(tmp_path / "dev_feats")
    n2 = dump_features(cfg, source, dev, transforms_from=out)
    assert n2 == n
    cache2 = FeatureCache(dev)
    _, f2, _ = cache2.example(0)
    np.testing.assert_allclose(f2, f, rtol=1e-5, atol=1e-5)
