"""Numpy oracle for the acoustic frontend — the executable spec.

The reference repo prepared features on the host with
python_speech_features/Kaldi-compatible numpy code (SURVEY.md §2.2
"Acoustic frontend": pre-emphasis 0.97, 25 ms / 10 ms frames, window,
STFT power spectrum, HTK mel filterbank, log, DCT->MFCC with liftering,
delta/delta-delta regression, CMVN, frame splicing, x3 downsampling).
Since the reference tree is unavailable (SURVEY.md provenance banner),
this oracle is derived from those published formulas and doubles as the
golden reference for the JAX / Pallas implementations (tolerance 1e-4,
BASELINE.json).

Everything is float64 numpy, deliberately simple and loop-free, with no
JAX: tests diff the on-device implementations against this module.

Conventions (python_speech_features compatible):
  - pre-emphasis: y[0] = x[0]; y[t] = x[t] - k * x[t-1]
  - framing: first frame starts at sample 0; frames that would run past
    the end of the (padded) signal are zero-padded; number of frames for
    a signal of length L is 1 + floor((L - frame_len) / shift) when
    L >= frame_len (we require padded fixed-length input on device, so
    the oracle uses the same formula)
  - power spectrum: (1 / n_fft) * |rfft(frame, n_fft)|^2
  - mel scale: HTK, mel(f) = 2595 * log10(1 + f / 700)
  - filterbank: triangular filters on FFT-bin centers via the integer-bin
    construction
  - log: natural log with values floored at machine eps
  - MFCC: DCT-II with 'ortho' norm over the log-mel vector, keep num_ceps,
    sinusoidal liftering with L = cep_lifter
  - delta: regression window N: d[t] = sum_n n*(c[t+n]-c[t-n]) / (2*sum n^2),
    edge frames use edge replication
"""

from __future__ import annotations

import numpy as np

from uasr.config import FrontendConfig

# ---------------------------------------------------------------- windows


def window_fn(name: str, n: int) -> np.ndarray:
    """Periodic-symmetric analysis windows.

    'hamming'/'hann' are the symmetric numpy windows (what
    python_speech_features users pass); 'povey' is Kaldi's default
    (hann ** 0.85); 'rect' is python_speech_features' default (ones).
    """
    t = np.arange(n, dtype=np.float64)
    if name == "rect":
        return np.ones(n, dtype=np.float64)
    if name == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * t / (n - 1))
    if name == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * t / (n - 1))
    if name == "povey":
        return (0.5 - 0.5 * np.cos(2 * np.pi * t / (n - 1))) ** 0.85
    raise ValueError(f"unknown window {name!r}")


# ------------------------------------------------------------- mel scale


def hz2mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def mel2hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    num_bins: int, n_fft: int, sample_rate: float, low_freq: float, high_freq: float
) -> np.ndarray:
    """python_speech_features-style triangular filterbank, shape
    [num_bins, n_fft // 2 + 1], built on integer FFT-bin centers."""
    high_freq = high_freq or sample_rate / 2.0
    assert high_freq <= sample_rate / 2.0
    lowmel, highmel = hz2mel(low_freq), hz2mel(high_freq)
    melpoints = np.linspace(lowmel, highmel, num_bins + 2)
    # round center freqs to fft bins
    bins = np.floor((n_fft + 1) * mel2hz(melpoints) / sample_rate).astype(np.int64)
    fbank = np.zeros((num_bins, n_fft // 2 + 1), dtype=np.float64)
    for j in range(num_bins):
        for i in range(int(bins[j]), int(bins[j + 1])):
            fbank[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(int(bins[j + 1]), int(bins[j + 2])):
            fbank[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    return fbank


# ----------------------------------------------------------- core stages


def preemphasis(signal: np.ndarray, k: float) -> np.ndarray:
    signal = np.asarray(signal, dtype=np.float64)
    return np.concatenate([signal[:1], signal[1:] - k * signal[:-1]])


def frame_signal(signal: np.ndarray, frame_len: int, frame_shift: int) -> np.ndarray:
    """[L] -> [N, frame_len]; N = 1 + floor((L - frame_len)/shift) for
    L >= frame_len, else 1 zero-padded frame."""
    L = len(signal)
    if L >= frame_len:
        n = 1 + (L - frame_len) // frame_shift
    else:
        n = 1
        signal = np.pad(signal, (0, frame_len - L))
    idx = np.arange(frame_len)[None, :] + frame_shift * np.arange(n)[:, None]
    return signal[idx]


def power_spectrum(frames: np.ndarray, n_fft: int) -> np.ndarray:
    """(1/n_fft) |rfft|^2 — python_speech_features powspec."""
    spec = np.fft.rfft(frames, n_fft)
    return (1.0 / n_fft) * (spec.real**2 + spec.imag**2)


def log_floor(x: np.ndarray) -> np.ndarray:
    return np.log(np.maximum(x, np.finfo(np.float64).eps))


def dct_ortho(x: np.ndarray, num_ceps: int) -> np.ndarray:
    """DCT-II with ortho norm over the last axis, keeping num_ceps."""
    n = x.shape[-1]
    k = np.arange(num_ceps, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    basis = np.cos(np.pi * k * (2 * t + 1) / (2 * n))
    scale = np.full((num_ceps, 1), np.sqrt(2.0 / n))
    scale[0, 0] = np.sqrt(1.0 / n)
    return x @ (basis * scale).T


def lifter(ceps: np.ndarray, L: float) -> np.ndarray:
    if L <= 0:
        return ceps
    n = np.arange(ceps.shape[-1], dtype=np.float64)
    return ceps * (1.0 + (L / 2.0) * np.sin(np.pi * n / L))


def delta(feat: np.ndarray, N: int) -> np.ndarray:
    """Regression deltas with edge replication, window half-width N."""
    denom = 2.0 * sum(i * i for i in range(1, N + 1))
    padded = np.pad(feat, ((N, N), (0, 0)), mode="edge")
    out = np.zeros_like(feat)
    for n in range(1, N + 1):
        out += n * (padded[N + n : N + n + len(feat)] - padded[N - n : N - n + len(feat)])
    return out / denom


def cmvn_utterance(feat: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    mu = feat.mean(axis=0, keepdims=True)
    sd = feat.std(axis=0, keepdims=True)
    return (feat - mu) / (sd + eps)


def cmvn_global(feat: np.ndarray, mean: np.ndarray, std: np.ndarray, eps: float = 1e-8):
    return (feat - mean) / (std + eps)


def splice(feat: np.ndarray, left: int, right: int) -> np.ndarray:
    """Concat +-context frames: [T, D] -> [T, D*(left+1+right)], edges
    replicated (reference `splice`, SURVEY.md §2.2)."""
    if left == 0 and right == 0:
        return feat
    T = len(feat)
    cols = []
    for off in range(-left, right + 1):
        idx = np.clip(np.arange(T) + off, 0, T - 1)
        cols.append(feat[idx])
    return np.concatenate(cols, axis=1)


def downsample(feat: np.ndarray, rate: int) -> np.ndarray:
    """Keep every rate-th frame (reference `down_sample`)."""
    return feat[::rate] if rate > 1 else feat


# --------------------------------------------------------------- drivers


def oracle_fbank(signal: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Raw waveform -> log-mel filterbank [T, num_mel_bins]."""
    x = preemphasis(signal, cfg.preemph)
    frames = frame_signal(x, cfg.frame_length, cfg.frame_shift)
    frames = frames * window_fn(cfg.window, cfg.frame_length)[None, :]
    pspec = power_spectrum(frames, cfg.n_fft)
    fb = mel_filterbank(
        cfg.num_mel_bins, cfg.n_fft, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq or cfg.sample_rate / 2.0,
    )
    return log_floor(pspec @ fb.T)


def oracle_mfcc(signal: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Raw waveform -> liftered MFCCs [T, num_ceps]."""
    x = preemphasis(signal, cfg.preemph)
    frames = frame_signal(x, cfg.frame_length, cfg.frame_shift)
    frames = frames * window_fn(cfg.window, cfg.frame_length)[None, :]
    pspec = power_spectrum(frames, cfg.n_fft)
    energy = np.maximum(pspec.sum(axis=1), np.finfo(np.float64).eps)
    fb = mel_filterbank(
        cfg.num_mel_bins, cfg.n_fft, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq or cfg.sample_rate / 2.0,
    )
    logmel = log_floor(pspec @ fb.T)
    ceps = lifter(dct_ortho(logmel, cfg.num_ceps), cfg.cep_lifter)
    if cfg.use_energy:
        ceps[:, 0] = np.log(energy)
    return ceps


def oracle_features(
    signal: np.ndarray,
    cfg: FrontendConfig,
    global_mean: np.ndarray | None = None,
    global_std: np.ndarray | None = None,
) -> np.ndarray:
    """Full chain: fbank/mfcc -> deltas -> CMVN -> splice -> downsample.

    Mirrors the reference's data-prep pass (SURVEY.md §3.5) end to end.
    """
    feat = (
        oracle_mfcc(signal, cfg)
        if cfg.feature_type == "mfcc"
        else oracle_fbank(signal, cfg)
    )
    if cfg.add_deltas:
        d1 = delta(feat, cfg.delta_window)
        d2 = delta(d1, cfg.delta_window)
        feat = np.concatenate([feat, d1, d2], axis=1)
    if cfg.cmvn == "utterance":
        feat = cmvn_utterance(feat)
    elif cfg.cmvn == "global":
        assert global_mean is not None and global_std is not None
        feat = cmvn_global(feat, global_mean, global_std)
    feat = splice(feat, cfg.splice_left, cfg.splice_right)
    feat = downsample(feat, cfg.downsample)
    return feat
