"""Streaming frontend: the chunked/online path must be chunk-size
invariant (same features whether audio arrives in one piece or chunk by
chunk) and causal, and must train end-to-end (AISHELL streaming config,
BASELINE.json #4)."""

import numpy as np

import jax
import jax.numpy as jnp

from uasr.config import Config, FrontendConfig, ModelConfig, TrainConfig
from uasr.frontend.features import compute_features, make_frontend_state
from uasr.frontend.streaming import (
    init_stream_state,
    stream_chunk,
    streaming_features,
)


def _audio(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    return (
        0.4 * np.sin(2 * np.pi * 600.0 * t) + 0.05 * rng.randn(n)
    ).astype(np.float32)


def test_chunk_size_invariance():
    """Feeding chunks one at a time == the lax.scan offline driver."""
    cfg = FrontendConfig(num_mel_bins=40, cmvn="streaming",
                         streaming_chunk_frames=16)
    fe = make_frontend_state(cfg)
    B, L = 2, 16 * 160 * 5  # 5 chunks exactly
    audio = jnp.stack([jnp.asarray(_audio(L, s)) for s in range(B)])
    full = streaming_features(audio, fe, cfg)

    # manual chunk-by-chunk loop
    S = 16 * 160
    state = init_stream_state(B, cfg)
    outs = []
    for c in range(5):
        state, f = stream_chunk(state, audio[:, c * S : (c + 1) * S], fe, cfg)
        outs.append(f)
    manual = jnp.concatenate(outs, axis=1)
    # f32 running-sum association order differs between the scan and the
    # eager loop; 2e-3 in log-mel space is well below any training signal
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(manual), atol=2e-3
    )


def test_causality():
    """Changing future samples must not change past features."""
    cfg = FrontendConfig(num_mel_bins=40, cmvn="streaming",
                         streaming_chunk_frames=8)
    fe = make_frontend_state(cfg)
    L = 8 * 160 * 4
    a = jnp.asarray(_audio(L, 7))[None]
    b = a.at[:, -8 * 160 :].set(0.77)  # mutate only the last chunk
    fa = streaming_features(a, fe, cfg)
    fb = streaming_features(b, fe, cfg)
    n_past = 8 * 3  # frames of the first three chunks
    np.testing.assert_allclose(
        np.asarray(fa[:, :n_past]), np.asarray(fb[:, :n_past]), atol=1e-6
    )
    assert np.abs(np.asarray(fa[:, n_past:]) - np.asarray(fb[:, n_past:])).max() > 1e-3


def test_streaming_stats_converge_to_global():
    """After many frames the running CMVN approaches per-utterance CMVN
    (stationary input)."""
    cfg = FrontendConfig(num_mel_bins=40, cmvn="streaming",
                         streaming_chunk_frames=32)
    fe = make_frontend_state(cfg)
    L = 32 * 160 * 12
    audio = jnp.asarray(_audio(L, 1))[None]
    feats = np.asarray(streaming_features(audio, fe, cfg))
    tail = feats[0, -64:]
    assert abs(tail.mean()) < 0.5
    assert 0.5 < tail.std() < 2.0


def test_streaming_through_compute_features_and_training():
    cfg = Config(
        frontend=FrontendConfig(num_mel_bins=40, cmvn="streaming",
                                streaming_chunk_frames=16),
        model=ModelConfig(encoder="cnn", hidden_size=32, num_conv_layers=1),
        train=TrainConfig(total_steps=3),
        vocab_size=10,
    )
    fe = make_frontend_state(cfg.frontend)
    audio = jnp.stack([jnp.asarray(_audio(12000, s)) for s in range(2)])
    lengths = jnp.array([12000, 9000])
    feats, flen = jax.jit(
        lambda a, l: compute_features(a, l, fe, cfg.frontend)
    )(audio, lengths)
    assert feats.shape[0] == 2 and feats.shape[2] == 40
    assert int(flen[1]) < int(flen[0])
    # trains
    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    batch = Batch(
        np.asarray(audio), np.asarray(lengths, np.int32),
        np.full((2, 4), 2, np.int32), np.full((2,), 4, np.int32),
    )
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.jitted_train_step()
    state, aux = step(state, Batch(*map(jnp.asarray, batch)), jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["ctc_loss"]))


def test_streaming_pallas_matches_xla_path():
    """BASELINE.json #4 "chunked Pallas feature kernels": the streaming
    chunk dispatches to the fused Pallas log-mel kernel; interpreter mode
    must match the XLA chunk path to float32 tolerance."""
    cfg = FrontendConfig(num_mel_bins=24, cmvn="streaming",
                         streaming_chunk_frames=32)
    fe = make_frontend_state(cfg)
    B, L = 2, 3 * 5120
    audio = jnp.asarray(np.stack([_audio(L, s) for s in (1, 2)]))
    ref = streaming_features(audio, fe, cfg, use_pallas=False)
    got = streaming_features(audio, fe, cfg, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # chunk-by-chunk (online) Pallas path carries state identically
    st_ref = init_stream_state(B, cfg)
    st_pl = init_stream_state(B, cfg)
    S = 32 * cfg.frame_shift
    for k in range(3):
        chunk = audio[:, k * S : (k + 1) * S]
        st_ref, f_ref = stream_chunk(st_ref, chunk, fe, cfg, use_pallas=False)
        st_pl, f_pl = stream_chunk(st_pl, chunk, fe, cfg, use_pallas=True,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-4)
