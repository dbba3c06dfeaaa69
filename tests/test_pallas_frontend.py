"""Fused Pallas log-mel kernel vs the XLA path / numpy oracle.

Runs in interpreter mode on CPU (tests are CPU-only, conftest); the real
compiled kernel is exercised on TPU by bench.py and by running these same
functions with interpret=False on hardware.
"""

import numpy as np

import jax.numpy as jnp

from uasr.config import FrontendConfig
from uasr.frontend import oracle
from uasr.frontend.features import log_mel_frontend, make_frontend_state
from uasr.frontend.pallas_frontend import pallas_log_mel_frontend


def _audio(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    return (
        0.5 * np.sin(2 * np.pi * 523.0 * t) + 0.05 * rng.randn(n)
    ).astype(np.float32)


def test_pallas_matches_xla_path():
    cfg = FrontendConfig(num_mel_bins=64)
    state = make_frontend_state(cfg)
    B, L = 2, 16000
    audio = jnp.stack([jnp.asarray(_audio(L, s)) for s in range(B)])
    ref = log_mel_frontend(audio, state, cfg)
    got = pallas_log_mel_frontend(audio, state, cfg, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_pallas_matches_oracle():
    cfg = FrontendConfig(num_mel_bins=40)
    state = make_frontend_state(cfg)
    sig = _audio(12345, seed=3)
    ref = oracle.oracle_fbank(sig.astype(np.float64), cfg)
    got = pallas_log_mel_frontend(
        jnp.asarray(sig)[None], state, cfg, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got[0, : len(ref)]), ref, atol=1e-4, rtol=1e-4
    )


def test_pallas_partial_last_block():
    """T not a multiple of block_frames: tail block computed correctly."""
    cfg = FrontendConfig(num_mel_bins=40)
    state = make_frontend_state(cfg)
    audio = jnp.asarray(_audio(7000, seed=5))[None]  # 42 frames
    ref = log_mel_frontend(audio, state, cfg)
    got = pallas_log_mel_frontend(
        audio, state, cfg, block_frames=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
