"""SpecAugment (Park et al. 2019): frequency and time masking on device.

The reference applied SpecAugment-style masking for the LibriSpeech conv+
BiGRU CTC recipe (BASELINE.json config #3). Implemented as pure-jnp masked
multiplies with static shapes — mask positions are drawn uniformly inside
each utterance's valid region, widths uniform in [0, F] / [0, T_mask].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uasr.config import FrontendConfig


def _band_mask(rng, size: int, max_width: int, limit) -> jax.Array:
    """One random band mask per batch row: [B, size] bool, True = keep.

    limit: [B] upper bound for mask start (valid region size along axis).
    """
    B = limit.shape[0]
    r1, r2 = jax.random.split(rng)
    width = jax.random.randint(r1, (B,), 0, max_width + 1)
    max_start = jnp.maximum(limit - width, 1)
    start = jax.random.randint(r2, (B,), 0, jnp.iinfo(jnp.int32).max) % max_start
    pos = jnp.arange(size)[None, :]
    return ~((pos >= start[:, None]) & (pos < (start + width)[:, None]))


def spec_augment(
    rng: jax.Array,
    feat: jax.Array,
    lengths: jax.Array,
    cfg: FrontendConfig,
) -> jax.Array:
    """Apply SpecAugment masks. feat: [B, T, D]; masked bins set to 0
    (features are CMVN-normalized, so 0 is the mean)."""
    B, T, D = feat.shape
    keep = jnp.ones((B, T, D), dtype=bool)
    full_d = jnp.full((B,), D)
    for _ in range(cfg.specaug_freq_masks):
        rng, sub = jax.random.split(rng)
        m = _band_mask(sub, D, cfg.specaug_freq_mask, full_d)
        keep &= m[:, None, :]
    for _ in range(cfg.specaug_time_masks):
        rng, sub = jax.random.split(rng)
        m = _band_mask(sub, T, cfg.specaug_time_mask, jnp.maximum(lengths, 1))
        keep &= m[:, :, None]
    return jnp.where(keep, feat, 0.0)
