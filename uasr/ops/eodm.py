"""EODM: Empirical Output Distribution Matching (Yeh et al., ICLR 2019).

The reference minimized the cross-entropy between the top-K n-gram
statistics of unpaired phoneme text and the expected n-gram frequencies
of the model's per-frame output distribution (SURVEY.md §3.3), realized
as a conv1d of posteriors with one-hot n-gram kernels. Here the expected
n-gram probability is computed with gathers instead of one-hot convs —
mathematically identical:

    p_model(g) = mean over valid t of  prod_i  post[t + i, g_i]

and loss = - sum_g  p_hat(g) * log p_model(g), summed over orders.

The top-K table is built on the host once (`build_ngram_table`, the
analogue of the reference's `get_dataset_ngram`) and shipped to the
device as static [K, n] index + [K] probability arrays.
"""

from __future__ import annotations

from collections import Counter
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class NgramTable(NamedTuple):
    """Top-K n-grams of one order: ids [K, n] int32, probs [K] float32."""

    ids: np.ndarray
    probs: np.ndarray

    @property
    def order(self) -> int:
        return self.ids.shape[1]


def build_ngram_table(
    sequences: Sequence[Sequence[int]], order: int, top_k: int
) -> NgramTable:
    """Count n-grams over host-side id sequences and keep the top-K with
    renormalized probabilities (reference: `get_dataset_ngram`)."""
    counts: Counter = Counter()
    for seq in sequences:
        for i in range(len(seq) - order + 1):
            counts[tuple(seq[i : i + order])] += 1
    top = counts.most_common(top_k)
    if not top:
        raise ValueError(f"no {order}-grams found in text corpus")
    ids = np.asarray([g for g, _ in top], dtype=np.int32)
    c = np.asarray([n for _, n in top], dtype=np.float64)
    probs = (c / c.sum()).astype(np.float32)
    return NgramTable(ids=ids, probs=probs)


def expected_ngram_logprobs(
    probs: jax.Array,
    lengths: jax.Array,
    ngram_ids: jax.Array,
    log_floor: float = 1e-10,
) -> jax.Array:
    """log of batch-expected n-gram frequency for each table entry.

    probs: [B, T, V] frame posteriors; ngram_ids: [K, n].
    Returns [K] log p_model.
    """
    B, T, V = probs.shape
    K, n = ngram_ids.shape
    Tp = T - n + 1
    # positions with a full n-gram inside the valid region
    pos_valid = (
        jnp.arange(Tp)[None, :] < jnp.maximum(lengths - n + 1, 0)[:, None]
    )  # [B, Tp]
    prod = jnp.ones((B, Tp, K), probs.dtype)
    for i in range(n):
        # gather posteriors of symbol g_i at offset i: [B, Tp, K]
        prod = prod * probs[:, i : i + Tp, :][..., ngram_ids[:, i]]
    total = jnp.sum(prod * pos_valid[..., None], axis=(0, 1))  # [K]
    denom = jnp.maximum(jnp.sum(pos_valid), 1).astype(probs.dtype)
    return jnp.log(jnp.maximum(total / denom, log_floor))


def eodm_loss(
    logits: jax.Array,
    lengths: jax.Array,
    tables: Sequence[tuple[jax.Array, jax.Array]],
) -> jax.Array:
    """Cross-entropy of empirical n-gram stats under the model's expected
    output distribution, summed over orders.

    tables: per order, (ngram_ids [K, n] device array, probs [K]).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    loss = 0.0
    for ids, p_hat in tables:
        logp_model = expected_ngram_logprobs(probs, lengths, ids)
        loss = loss - jnp.sum(p_hat * logp_model)
    return loss
