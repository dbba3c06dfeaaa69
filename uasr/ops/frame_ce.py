"""Frame-level cross-entropy on forced alignments.

The reference kept alignment-supervised dataset variants
(`ASR_align_DataSet`, SURVEY.md §2.2) to ablate the unsupervised
objectives: when per-frame phone labels exist, the phone classifier can
be trained with plain masked CE. Also used to probe how much of the GAN
/ EODM gap is segmentation vs classification error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def frame_ce_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    frame_labels: jax.Array,
    label_pad: int = -1,
) -> jax.Array:
    """Masked mean CE. logits [B, T, V]; frame_labels [B, T] with
    `label_pad` marking frames without a label (padding or downsample
    mismatch)."""
    T = logits.shape[1]
    labels = frame_labels[:, :T]
    valid = (
        (jnp.arange(T)[None, :] < logit_lengths[:, None])
        & (labels != label_pad)
    )
    safe = jnp.maximum(labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / n


def frame_accuracy(logits, logit_lengths, frame_labels, label_pad=-1):
    T = logits.shape[1]
    labels = frame_labels[:, :T]
    valid = (
        (jnp.arange(T)[None, :] < logit_lengths[:, None])
        & (labels != label_pad)
    )
    pred = jnp.argmax(logits, axis=-1)
    hit = jnp.where(valid, (pred == labels).astype(jnp.float32), 0.0)
    return jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)
