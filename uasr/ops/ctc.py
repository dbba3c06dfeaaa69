"""CTC loss as a log-semiring forward recursion in `lax.scan`.

The reference called TensorFlow's native C++ CTCLoss op
(SURVEY.md §2.1: `tf.nn.ctc_loss` in the CTC model's loss fn). Here the
forward algorithm is written directly in JAX:

  - the extended label sequence (blank-interleaved, length S = 2U+1) is
    static-shaped per batch;
  - one `lax.scan` step per frame updates all S alpha states of all B
    utterances at once on the VPU (two shifted adds + masked logsumexp);
  - variable logit lengths are handled by carrying alpha unchanged past
    each utterance's last frame;
  - the gradient comes from autodiff through the scan, which reproduces
    the classic alpha-beta gradient (logsumexp's VJP *is* the posterior).

Cross-checked against optax.ctc_loss in tests (SURVEY.md §4). Blank id is
explicit (default 0) rather than inherited from a framework convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_EPSILON = -1e5  # finite "-inf" (matches optax) so grads stay NaN-free


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, LOG_EPSILON)  # avoid -inf - -inf
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def ctc_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Per-utterance negative log likelihood, shape [B].

    logits: [B, T, V] unnormalized; labels: [B, U] int32 (values !=
    blank_id on the first `label_lengths` positions).
    """
    B, T, V = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1

    logp = jax.nn.log_softmax(logits, axis=-1)

    # Extended sequence z: [blank, l1, blank, l2, ..., blank] -> [B, S]
    z = jnp.full((B, S), blank_id, dtype=labels.dtype)
    z = z.at[:, 1::2].set(labels)

    # Transition-from-(s-2) allowed where z[s] != blank and z[s] != z[s-2]
    z_shift2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    skip_ok = (z[:, :] != blank_id) & (z != z_shift2)  # [B, S]

    # Valid alpha states: s < 2*label_len+1
    s_idx = jnp.arange(S)[None, :]
    s_valid = s_idx < (2 * label_lengths + 1)[:, None]

    neg = jnp.full((B, S), LOG_EPSILON, dtype=logp.dtype)

    # Emission log-probs per state per frame, gathered once: [T, B, S]
    emit = jnp.take_along_axis(
        logp, z[:, None, :].astype(jnp.int32), axis=-1
    )  # [B, T, S]
    emit = jnp.moveaxis(emit, 1, 0)

    alpha0 = neg.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit[0, :, 1], LOG_EPSILON)
    )
    alpha0 = jnp.where(s_valid, alpha0, LOG_EPSILON)

    def step(alpha, inputs):
        emit_t, t = inputs
        a_prev1 = jnp.pad(
            alpha, ((0, 0), (1, 0)), constant_values=LOG_EPSILON
        )[:, :S]
        a_prev2 = jnp.pad(
            alpha, ((0, 0), (2, 0)), constant_values=LOG_EPSILON
        )[:, :S]
        a_prev2 = jnp.where(skip_ok, a_prev2, LOG_EPSILON)
        new = _logsumexp3(alpha, a_prev1, a_prev2) + emit_t
        new = jnp.where(s_valid, new, LOG_EPSILON)
        # carry alpha unchanged for finished utterances
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha, _ = jax.lax.scan(
        step, alpha0, (emit[1:], jnp.arange(1, T)), unroll=8
    )

    # Final states: S_b - 1 (last blank) and S_b - 2 (last label)
    last = 2 * label_lengths  # index of final blank
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
    )[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, LOG_EPSILON)
    m = jnp.maximum(jnp.maximum(a_last, a_prev), LOG_EPSILON)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll


def ctc_loss_mean(logits, logit_lengths, labels, label_lengths, blank_id=0):
    """Batch-mean CTC loss over valid utterances (frames-normalized losses
    are the per-recipe choice; reference averaged per utterance)."""
    per = ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id)
    return jnp.mean(per)
