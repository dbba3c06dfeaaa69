"""Self-supervised (CPC / wav2vec-style) pretraining models.

Beyond the reference: the reference's wav2vec-U-style stretch recipe
consumed externally-produced SSL features (SURVEY.md §2.2 "Recipes",
BASELINE config #5); it had no pretraining of its own. These modules
close that loop inside the framework: raw waveform -> ConvFeatureEncoder
latents z -> causal GRU context c -> K affine heads predicting future
latents, trained with InfoNCE (uasr/ops/infonce.py). Features for the
downstream unsupervised GAN/EODM stage are dumped by
uasr.tools.featurize into the standard feature cache.

TPU-first: the conv stack and prediction heads are plain MXU GEMMs; the
causal context reuses the scan-based GRULayer (time-major lax.scan, the
same recurrence the Pallas kernel accelerates for the BiGRU encoder).
All shapes static; padding handled by masks so results are
padding-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uasr.config import SSLConfig
from uasr.models.layers import GRULayer, conv_out_length


def _length_mask(x: jax.Array, lengths: jax.Array) -> jax.Array:
    T = x.shape[1]
    return (jnp.arange(T)[None, :] < lengths[:, None])[..., None]


class ConvFeatureEncoder(nn.Module):
    """Strided 1-D conv stack over raw waveform: [B, L] samples ->
    [B, T, C] latents (default strides give 16 kHz -> 100 Hz, a 10 ms
    hop matching the fbank frontend). LayerNorm + GELU per layer;
    padding re-masked after each block so strided convs never mix
    padding into valid frames."""

    cfg: SSLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array, lengths: jax.Array):
        if audio.ndim == 3:
            # frame-rate features (input_type=fbank: the fused Pallas
            # frontend's output) — light frame-rate conv stack
            x = audio.astype(self.dtype)
            layers = zip(self.cfg.fbank_conv_channels,
                         self.cfg.fbank_conv_kernels,
                         self.cfg.fbank_conv_strides)
            x = x * _length_mask(x, lengths)
        elif self.cfg.front == "patch":
            # non-overlapping patch embed (one MXU GEMM) straight to
            # patch rate: kills the stride-5 first-layer intermediate
            # that made the conv front bandwidth-bound (round-4 SSL
            # attribution — backward was 64% of the step, dominated by
            # passes over [B, L/5, C])
            P = self.cfg.patch_size
            B, L = audio.shape
            x = audio.astype(self.dtype)
            x = x * (jnp.arange(L)[None, :] < lengths[:, None])
            if L % P:
                x = jnp.pad(x, ((0, 0), (0, P - L % P)))
            x = x.reshape(B, -1, P)
            x = nn.Dense(self.cfg.conv_channels[0], dtype=self.dtype,
                         name="patch_embed")(x)
            x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
            x = nn.gelu(x)
            lengths = (lengths + P - 1) // P
            layers = zip(self.cfg.conv_channels, self.cfg.conv_kernels,
                         self.cfg.conv_strides)
            x = x * _length_mask(x, lengths)
        else:
            x = audio[..., None].astype(self.dtype)  # [B, L, 1]
            layers = zip(self.cfg.conv_channels, self.cfg.conv_kernels,
                         self.cfg.conv_strides)
            x = x * _length_mask(x, lengths)
        for i, (c, k, s) in enumerate(layers):
            x = nn.Conv(c, (k,), strides=(s,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.gelu(x)
            lengths = jnp.minimum(conv_out_length(lengths, s, 1), x.shape[1])
            x = x * _length_mask(x, lengths)
        return x, lengths


class CPCModel(nn.Module):
    """Contrastive-predictive-coding model: latents z, causal context c,
    and K affine prediction heads (one GEMM producing all K).

    Returns (z, c, preds, frame_lengths) with z/c [B, T, C*] and preds
    [B, T, K, C_z]; the InfoNCE loss pairs preds[:, t, k] with
    z[:, t+k]."""

    cfg: SSLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array, lengths: jax.Array):
        enc_cls = (
            nn.remat(ConvFeatureEncoder)
            if self.cfg.remat_encoder else ConvFeatureEncoder
        )
        z, flen = enc_cls(self.cfg, dtype=self.dtype,
                          name="encoder")(audio, lengths)
        c = GRULayer(self.cfg.context_hidden, dtype=self.dtype,
                     use_pallas=self.cfg.context_pallas,
                     name="context")(z, flen)  # causal: left-to-right scan
        K, Cz = self.cfg.predict_steps, z.shape[-1]
        heads = nn.Dense(K * Cz, dtype=self.dtype, name="heads")
        if self.cfg.fused_loss:
            # the fused loss (ops/infonce.py::info_nce_loss_fused)
            # applies the heads kernel chunk-by-chunk itself, straight
            # from params — the [B, T, K, C] prediction tensor never
            # exists in HBM. A one-frame call still CREATES the heads
            # params, so fused/unfused checkpoints stay interchangeable.
            preds = heads(c[:, :1].astype(self.dtype))
            B = preds.shape[0]
            return z, c, preds.reshape(B, 1, K, Cz), flen
        preds = heads(c.astype(self.dtype))
        B, T = preds.shape[:2]
        preds = preds.reshape(B, T, K, Cz)
        return z, c, preds, flen
