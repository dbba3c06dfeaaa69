"""On-device acoustic frontend in JAX.

The reference computed features on the host in a one-time prep pass
(SURVEY.md §3.5); here the full chain (pre-emphasis, framing, window,
STFT power, mel, log, MFCC, deltas, CMVN, splice, downsample) runs on
device per batch, inside jit, with static shapes.

TPU-first design decisions:
  - The STFT is a GEMM against precomputed cos/sin DFT bases
    ([frame_len, n_fft//2+1]) instead of an FFT — at 400-sample frames
    this maps straight onto the MXU (PAPERS.md: "MelT: GEMM-Native NDFT")
    and fuses with the mel-filterbank GEMM.
  - All length-dependent logic (CMVN statistics, delta / splice edge
    replication) is masked or index-clipped per utterance so a padded
    batch reproduces the numpy oracle exactly on the valid frames
    (tolerance 1e-4, BASELINE.json).
  - A fused Pallas kernel for the hot path lives in
    `uasr.frontend.pallas_frontend`; this module is the XLA reference
    path and the source of the precomputed constant bank.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uasr.config import FrontendConfig
from uasr.frontend import oracle

_LOG_FLOOR = float(np.finfo(np.float64).eps)  # oracle parity


class FrontendState(NamedTuple):
    """Precomputed constant bank (device arrays)."""

    window: jax.Array  # [frame_len]
    cos_basis: jax.Array  # [frame_len, n_bins]
    sin_basis: jax.Array  # [frame_len, n_bins]
    mel_fb: jax.Array  # [n_bins, num_mel]
    dct: jax.Array | None  # [num_mel, num_ceps]
    lifter: jax.Array | None  # [num_ceps]
    global_mean: jax.Array | None
    global_std: jax.Array | None
    # pre-emphasis + window folded into the DFT bases (computed in
    # float64 at state-build time): for a RAW frame x[s : s+FL],
    #   DFT_k(window ⊙ preemph(frame)) =
    #       x[s : s+FL] @ pre_cos[:, k]  +  x[s-1] * pre_bvec[0, k]
    # (sin analogous with pre_sin / pre_bvec[1]). Lets the Pallas
    # frontend consume raw audio — the explicit preemphasize() pass is
    # an unaligned 1-sample shift whose relayout cost ~1.4 ms at
    # B=128 x 8 s on v5e, while the folded bases cost nothing (the
    # GEMM K dim pads to the same MXU tile either way).
    pre_cos: jax.Array | None = None  # [frame_len, n_bins]
    pre_sin: jax.Array | None = None  # [frame_len, n_bins]
    pre_bvec: jax.Array | None = None  # [2, n_bins] boundary (cos, sin)


def dft_matrices(frame_len: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases such that rfft(x, n_fft)[k] = x@cos[:,k] - i*(x@sin[:,k])
    for len(x) = frame_len <= n_fft (implicit zero padding)."""
    n = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang), np.sin(ang)


def make_frontend_state(
    cfg: FrontendConfig,
    global_mean: np.ndarray | None = None,
    global_std: np.ndarray | None = None,
    dtype=jnp.float32,
) -> FrontendState:
    win = oracle.window_fn(cfg.window, cfg.frame_length)
    cos_b, sin_b = dft_matrices(cfg.frame_length, cfg.n_fft)
    fb = oracle.mel_filterbank(
        cfg.num_mel_bins, cfg.n_fft, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq or cfg.sample_rate / 2.0,
    )
    dct = lift = None
    if cfg.feature_type == "mfcc":
        n = cfg.num_mel_bins
        k = np.arange(cfg.num_ceps, dtype=np.float64)[:, None]
        t = np.arange(n, dtype=np.float64)[None, :]
        basis = np.cos(np.pi * k * (2 * t + 1) / (2 * n))
        scale = np.full((cfg.num_ceps, 1), np.sqrt(2.0 / n))
        scale[0, 0] = np.sqrt(1.0 / n)
        dct = jnp.asarray((basis * scale).T, dtype)  # [num_mel, num_ceps]
        if cfg.cep_lifter > 0:
            idx = np.arange(cfg.num_ceps, dtype=np.float64)
            lift = jnp.asarray(
                1.0 + (cfg.cep_lifter / 2.0) * np.sin(np.pi * idx / cfg.cep_lifter),
                dtype,
            )
        else:
            lift = jnp.ones((cfg.num_ceps,), dtype)
    # window+preemph folded bases (see FrontendState docstring); the
    # shift-by-one combination is exact in float64, so the folded path
    # is at least as close to the oracle as the sequential f32 one
    p = float(cfg.preemph)
    wc = win[:, None] * cos_b  # [FL, NB] float64
    ws = win[:, None] * sin_b
    zrow = np.zeros((1, wc.shape[1]), np.float64)
    pre_cos = wc - p * np.vstack([wc[1:], zrow])
    pre_sin = ws - p * np.vstack([ws[1:], zrow])
    pre_bvec = -p * np.stack([wc[0], ws[0]])  # [2, NB]
    return FrontendState(
        window=jnp.asarray(win, dtype),
        cos_basis=jnp.asarray(cos_b, dtype),
        sin_basis=jnp.asarray(sin_b, dtype),
        mel_fb=jnp.asarray(fb.T, dtype),  # [n_bins, num_mel]
        dct=dct,
        lifter=lift,
        global_mean=None if global_mean is None else jnp.asarray(global_mean, dtype),
        global_std=None if global_std is None else jnp.asarray(global_std, dtype),
        pre_cos=jnp.asarray(pre_cos, dtype),
        pre_sin=jnp.asarray(pre_sin, dtype),
        pre_bvec=jnp.asarray(pre_bvec, dtype),
    )


def frontend_state_from_config(cfg: FrontendConfig, dtype=jnp.float32) -> FrontendState:
    """Build the constant bank, loading dataset-level CMVN statistics
    from ``cfg.cmvn_stats_path`` when ``cmvn == "global"`` (the stats the
    reference stored alongside its TFRecords, SURVEY.md §2.2; written by
    ``python -m uasr.tools.prepare cmvn``)."""
    mean = std = None
    if cfg.cmvn == "global":
        if not cfg.cmvn_stats_path:
            raise ValueError(
                "frontend.cmvn='global' requires frontend.cmvn_stats_path "
                "(write one with: python -m uasr.tools.prepare cmvn)"
            )
        z = np.load(cfg.cmvn_stats_path)
        mean, std = z["mean"], z["std"]
        if mean.shape[-1] != cfg.base_dim:
            raise ValueError(
                f"CMVN stats dim {mean.shape[-1]} != frontend base_dim "
                f"{cfg.base_dim} ({cfg.cmvn_stats_path})"
            )
    return make_frontend_state(cfg, mean, std, dtype)


def num_frames(num_samples, frame_len: int, frame_shift: int):
    """Oracle framing count: 1 + floor((L - frame_len)/shift), min 1."""
    return jnp.maximum(1 + (num_samples - frame_len) // frame_shift, 1)


def frame_audio(audio: jax.Array, frame_len: int, frame_shift: int) -> jax.Array:
    """[B, L] -> [B, T, frame_len] overlapping frames (gather)."""
    L = audio.shape[-1]
    T = max(1 + (L - frame_len) // frame_shift, 1)
    idx = np.arange(frame_len)[None, :] + frame_shift * np.arange(T)[:, None]
    idx = np.minimum(idx, L - 1)  # only reachable when L < frame_len
    return audio[..., idx]


def preemphasize(audio: jax.Array, k: float) -> jax.Array:
    return jnp.concatenate([audio[..., :1], audio[..., 1:] - k * audio[..., :-1]], -1)


# Feature fidelity (1e-4 vs the float64 oracle) requires full-f32 GEMMs:
# on TPU the default matmul precision is bfloat16 passes, which would cost
# ~3 decimal digits. These GEMMs are tiny relative to the encoder, so
# HIGHEST costs nothing measurable.
_HI = jax.lax.Precision.HIGHEST


def _gemm(a: jax.Array, b: jax.Array, precision: str) -> jax.Array:
    """Frontend GEMM at the configured fidelity: "highest" = 6-pass f32
    emulation (oracle parity to 1e-4), "high" = 3-pass (~2x faster,
    ~1e-3 feature error), "bfloat16" = native single-pass MXU (~4x
    faster but log() blows up silent-bin error; training-only)."""
    if precision == "bfloat16":
        return jnp.matmul(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if precision == "high":
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)
    return jnp.matmul(a, b, precision=_HI)


def power_frames(
    frames: jax.Array, state: FrontendState, n_fft: int,
    precision: str = "highest",
) -> jax.Array:
    """Windowed frames -> power spectrum via two MXU GEMMs."""
    w = frames * state.window
    re = _gemm(w, state.cos_basis, precision)
    im = _gemm(w, state.sin_basis, precision)
    return (re * re + im * im) * (1.0 / n_fft)


def log_mel_frontend(
    audio: jax.Array, state: FrontendState, cfg: FrontendConfig
) -> jax.Array:
    """[B, L] waveform -> [B, T, num_mel] log-mel (the kernel-bank hot path)."""
    x = preemphasize(audio, cfg.preemph)
    frames = frame_audio(x, cfg.frame_length, cfg.frame_shift)
    pspec = power_frames(frames, state, cfg.n_fft, cfg.precision)
    return jnp.log(
        jnp.maximum(_gemm(pspec, state.mel_fb, cfg.precision), _LOG_FLOOR)
    )


def _mfcc_from_logmel(
    logmel: jax.Array, pspec_energy: jax.Array, state: FrontendState, cfg: FrontendConfig
) -> jax.Array:
    ceps = jnp.matmul(logmel, state.dct, precision=_HI) * state.lifter
    if cfg.use_energy:
        loge = jnp.log(jnp.maximum(pspec_energy, _LOG_FLOOR))
        ceps = ceps.at[..., 0].set(loge)
    return ceps


def _clip_gather(feat: jax.Array, offsets: list[int], lengths: jax.Array):
    """For each offset, gather feat[t+off] with t+off clipped to
    [0, length-1] per utterance (edge replication at true utterance end,
    matching the oracle on padded batches). feat: [B, T, D]."""
    B, T, D = feat.shape
    t = jnp.arange(T)[None, :]
    hi = (lengths - 1)[:, None]
    outs = []
    for off in offsets:
        idx = jnp.clip(t + off, 0, hi)  # [B, T]
        outs.append(jnp.take_along_axis(feat, idx[:, :, None], axis=1))
    return outs


def add_deltas(feat: jax.Array, lengths: jax.Array, N: int) -> jax.Array:
    """Append delta + delta-delta (regression window N, edge-replicated)."""

    def one_delta(f):
        denom = 2.0 * sum(i * i for i in range(1, N + 1))
        acc = jnp.zeros_like(f)
        for n in range(1, N + 1):
            plus, minus = _clip_gather(f, [n, -n], lengths)
            acc = acc + n * (plus - minus)
        return acc / denom

    d1 = one_delta(feat)
    d2 = one_delta(d1)
    return jnp.concatenate([feat, d1, d2], axis=-1)


def apply_cmvn(
    feat: jax.Array, lengths: jax.Array, cfg: FrontendConfig, state: FrontendState,
    eps: float = 1e-8,
) -> jax.Array:
    """Masked per-utterance or precomputed-global CMVN."""
    if cfg.cmvn == "none":
        return feat
    if cfg.cmvn == "global":
        if state.global_mean is None:
            raise ValueError(
                "cmvn='global' but the FrontendState has no stats; build it "
                "with frontend_state_from_config (or pass mean/std explicitly)"
            )
        return (feat - state.global_mean) / (state.global_std + eps)
    # per-utterance, masked over valid frames
    T = feat.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
    n = jnp.maximum(lengths, 1).astype(feat.dtype)[:, None, None]
    mu = jnp.sum(feat * mask, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(feat - mu) * mask, axis=1, keepdims=True) / n
    return jnp.where(mask, (feat - mu) / (jnp.sqrt(var) + eps), 0.0)


def splice_and_downsample(
    feat: jax.Array, lengths: jax.Array, cfg: FrontendConfig
) -> tuple[jax.Array, jax.Array]:
    """Splice +-context then keep every k-th frame (reference `splice` +
    `down_sample`, SURVEY.md §2.2)."""
    if cfg.splice_left or cfg.splice_right:
        offs = list(range(-cfg.splice_left, cfg.splice_right + 1))
        feat = jnp.concatenate(_clip_gather(feat, offs, lengths), axis=-1)
    if cfg.downsample > 1:
        feat = feat[:, :: cfg.downsample]
        lengths = (lengths + cfg.downsample - 1) // cfg.downsample
    return feat, lengths


def compute_features(
    audio: jax.Array,
    audio_lengths: jax.Array,
    state: FrontendState,
    cfg: FrontendConfig,
) -> tuple[jax.Array, jax.Array]:
    """Full frontend: [B, L] waveform (+ lengths) -> ([B, T, D], lengths).

    Jit-compatible, static output shape; frames past an utterance's
    length are zeroed.
    """
    if cfg.cmvn == "streaming":
        # causal chunked frontend with running CMVN (AISHELL streaming
        # config): frame t ends at sample (t+1)*frame_shift and is
        # normalized by statistics of frames <= t only
        from uasr.frontend.streaming import streaming_features

        feat = streaming_features(audio, state, cfg)
        lengths = jnp.minimum(
            (audio_lengths + cfg.frame_shift - 1) // cfg.frame_shift,
            feat.shape[1],
        )
        if cfg.add_deltas:
            feat = add_deltas(feat, lengths, cfg.delta_window)
        feat, lengths = splice_and_downsample(feat, lengths, cfg)
        mask = (jnp.arange(feat.shape[1])[None, :] < lengths[:, None])[..., None]
        return feat * mask, lengths
    # fused Pallas kernel on TPU for the log-mel hot path; the XLA path
    # is the reference implementation and the fallback (CPU tests).
    # MFCC-with-energy gets the log power sum as an extra kernel output
    # column (the raw power spectrum never leaves VMEM).
    use_pallas = cfg.use_pallas and jax.default_backend() not in ("cpu",)
    if use_pallas:
        from uasr.frontend.pallas_frontend import pallas_log_mel_frontend

        want_e = cfg.feature_type == "mfcc" and cfg.use_energy
        feat = pallas_log_mel_frontend(audio, state, cfg,
                                       precision=cfg.precision,
                                       want_energy=want_e)
        if cfg.feature_type == "mfcc":
            if want_e:
                loge, feat = feat[..., -1], feat[..., :-1]
                ceps = jnp.matmul(feat, state.dct, precision=_HI) * state.lifter
                feat = ceps.at[..., 0].set(loge)
            else:
                feat = _mfcc_from_logmel(feat, None, state, cfg)
    else:
        x = preemphasize(audio, cfg.preemph)
        frames = frame_audio(x, cfg.frame_length, cfg.frame_shift)
        pspec = power_frames(frames, state, cfg.n_fft, cfg.precision)
        feat = jnp.log(
            jnp.maximum(_gemm(pspec, state.mel_fb, cfg.precision), _LOG_FLOOR)
        )
        if cfg.feature_type == "mfcc":
            feat = _mfcc_from_logmel(feat, pspec.sum(-1), state, cfg)
    lengths = num_frames(audio_lengths, cfg.frame_length, cfg.frame_shift)
    lengths = jnp.minimum(lengths, feat.shape[1])
    if cfg.add_deltas:
        feat = add_deltas(feat, lengths, cfg.delta_window)
    feat = apply_cmvn(feat, lengths, cfg, state)
    feat, lengths = splice_and_downsample(feat, lengths, cfg)
    # zero out padding frames
    mask = (jnp.arange(feat.shape[1])[None, :] < lengths[:, None])[..., None]
    return feat * mask, lengths
