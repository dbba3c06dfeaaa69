"""Streaming frontend: chunked feature extraction with carried CMVN state.

BASELINE.json config #4 (AISHELL streaming): features are produced chunk
by chunk with a *causal* running CMVN — each frame is normalized using
statistics of frames seen so far only (plus a warmup prior), so results
are identical whether the utterance arrives in one piece or in chunks.
That invariance is the correctness contract (tested), and it is what
lets the same jitted chunk function serve online inference.

State carried across chunks: (count, running sum, running sum of
squares) per feature dim. The chunk step is a pure function
(state, audio_chunk) -> (state, features), jit/scan-friendly; offline
training uses `lax.scan` over the chunk axis (SURVEY.md §5 "sharded
lax.scan over time for streaming CMVN chunks").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uasr.config import FrontendConfig
from uasr.frontend.features import (
    FrontendState,
    frame_audio,
    power_frames,
    _LOG_FLOOR,
    _HI,
)


class StreamState(NamedTuple):
    """Running CMVN statistics + the audio overlap tail and pre-emphasis
    carry needed to glue chunk boundaries seamlessly."""

    count: jax.Array  # [B, 1]
    total: jax.Array  # [B, D]
    total_sq: jax.Array  # [B, D]
    tail: jax.Array  # [B, frame_len - frame_shift] last samples of prev chunk
    last_sample: jax.Array  # [B, 1] for pre-emphasis across the boundary


def init_stream_state(
    batch: int, cfg: FrontendConfig, dtype=jnp.float32
) -> StreamState:
    D = cfg.num_mel_bins
    overlap = cfg.frame_length - cfg.frame_shift
    return StreamState(
        count=jnp.zeros((batch, 1), dtype),
        total=jnp.zeros((batch, D), dtype),
        total_sq=jnp.zeros((batch, D), dtype),
        tail=jnp.zeros((batch, overlap), dtype),
        last_sample=jnp.zeros((batch, 1), dtype),
    )


def _use_pallas(cfg: FrontendConfig, override: bool | None) -> bool:
    if override is not None:
        return override
    return cfg.use_pallas and jax.default_backend() not in ("cpu",)


def stream_chunk(
    state: StreamState,
    audio_chunk: jax.Array,
    fe: FrontendState,
    cfg: FrontendConfig,
    prior_count: float = 8.0,
    eps: float = 1e-8,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> tuple[StreamState, jax.Array]:
    """Process one chunk of `chunk_frames * frame_shift` samples.

    audio_chunk: [B, S] raw samples (S a multiple of frame_shift).
    Returns (new_state, feats [B, S // frame_shift, D]) — exactly
    S/frame_shift frames per chunk, each normalized causally by the
    running statistics including itself.

    The log-mel itself dispatches to the fused Pallas kernel on TPU
    (BASELINE.json config #4 "chunked Pallas feature kernels"); the
    glued chunk of `overlap + S` samples yields exactly S/frame_shift
    frames, so the kernel output needs no re-windowing. `use_pallas`
    overrides the auto gating (cfg.use_pallas and non-CPU backend);
    `interpret` runs the kernel in interpreter mode (CPU tests).
    """
    B, S = audio_chunk.shape
    FS, FL = cfg.frame_shift, cfg.frame_length
    assert S % FS == 0, "chunk must be a multiple of the frame shift"
    n_frames = S // FS

    # pre-emphasis with carry across the chunk boundary
    prev = jnp.concatenate([state.last_sample, audio_chunk[:, :-1]], axis=1)
    x = audio_chunk - cfg.preemph * prev

    # splice the overlap tail from the previous chunk in front
    glued = jnp.concatenate([state.tail, x], axis=1)  # [B, overlap + S]
    if _use_pallas(cfg, use_pallas):
        import math

        from uasr.frontend.pallas_frontend import _pallas_log_mel

        group = 128 // math.gcd(FS, 128)
        block = -(-n_frames // group) * group
        logmel = _pallas_log_mel(
            glued, fe, FL, FS, cfg.n_fft, block_frames=block,
            interpret=interpret, precision=cfg.precision,
        )[:, :n_frames]
    else:
        frames = frame_audio(glued, FL, FS)[:, :n_frames]
        pspec = power_frames(frames, fe, cfg.n_fft, cfg.precision)
        logmel = jnp.log(
            jnp.maximum(jnp.matmul(pspec, fe.mel_fb, precision=_HI), _LOG_FLOOR)
        )  # [B, n, D]

    # causal running CMVN: frame t is normalized with stats of frames
    # <= t (cumulative within the chunk, seeded by the carried totals)
    csum = state.total[:, None, :] + jnp.cumsum(logmel, axis=1)
    csum_sq = state.total_sq[:, None, :] + jnp.cumsum(logmel**2, axis=1)
    cnt = state.count[:, :, None] + jnp.arange(1, n_frames + 1, dtype=logmel.dtype)[
        None, :, None
    ]
    # warmup prior keeps early frames stable (variance shrinks toward 1)
    mean = csum / cnt
    var = jnp.maximum(csum_sq / cnt - mean**2, 0.0)
    w = cnt / (cnt + prior_count)
    var = w * var + (1.0 - w) * 1.0
    feats = (logmel - w * mean) / (jnp.sqrt(var) + eps)

    new_state = StreamState(
        count=state.count + n_frames,
        total=csum[:, -1, :],
        total_sq=csum_sq[:, -1, :],
        tail=glued[:, -(FL - FS):] if FL > FS else glued[:, :0],
        last_sample=audio_chunk[:, -1:],
    )
    return new_state, feats


def streaming_features(
    audio: jax.Array,
    fe: FrontendState,
    cfg: FrontendConfig,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Offline driver: run the streaming path over a full utterance with
    `lax.scan` over chunks. Output frames equal feeding the chunks one
    at a time (the streaming contract)."""
    B, L = audio.shape
    FS = cfg.frame_shift
    chunk_frames = cfg.streaming_chunk_frames or 64
    S = chunk_frames * FS
    n_chunks = -(-L // S)
    audio = jnp.pad(audio, ((0, 0), (0, n_chunks * S - L)))
    chunks = audio.reshape(B, n_chunks, S).swapaxes(0, 1)  # [n, B, S]

    state = init_stream_state(B, cfg, audio.dtype)

    def step(st, chunk):
        st, f = stream_chunk(
            st, chunk, fe, cfg, use_pallas=use_pallas, interpret=interpret
        )
        return st, f

    _, feats = jax.lax.scan(step, state, chunks)  # [n, B, cf, D]
    feats = jnp.moveaxis(feats, 0, 1).reshape(B, n_chunks * chunk_frames, -1)
    return feats
