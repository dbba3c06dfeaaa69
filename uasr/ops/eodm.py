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


def load_ngram_tables(path: str, orders: Sequence[int]) -> list[NgramTable]:
    """Load tables written by ``python -m uasr.tools.prepare ngrams``
    (npz with ids_{n}/probs_{n} per order)."""
    z = np.load(path)
    tables = []
    for n in orders:
        if f"ids_{n}" not in z:
            raise ValueError(f"{path} has no order-{n} table (keys: {list(z)})")
        tables.append(NgramTable(ids=z[f"ids_{n}"], probs=z[f"probs_{n}"]))
    return tables


def device_ngram_tables(ecfg, text_sequences) -> list[tuple[jax.Array, jax.Array]]:
    """Tables as device arrays, from ``ecfg.ngram_path`` if set (the
    reference's precomputed `get_dataset_ngram` artifact) else built from
    the unpaired text corpus."""
    if ecfg.ngram_path:
        tables = load_ngram_tables(ecfg.ngram_path, ecfg.ngram_orders)
    else:
        tables = [
            build_ngram_table(text_sequences, n, ecfg.top_k)
            for n in ecfg.ngram_orders
        ]
    return [(jnp.asarray(t.ids), jnp.asarray(t.probs)) for t in tables]


def expected_ngram_logprobs(
    probs: jax.Array,
    lengths: jax.Array,
    ngram_ids: jax.Array,
    log_floor: float = 1e-10,
    k_chunk: int = 0,
) -> jax.Array:
    """log of batch-expected n-gram frequency for each table entry.

    probs: [B, T, V] frame posteriors; ngram_ids: [K, n].
    Returns [K] log p_model.

    ``k_chunk > 0`` bounds peak memory to [B, Tp, k_chunk] by scanning the
    table in chunks (lax.map); K=4000 at stretch batch sizes would
    otherwise materialize ~3 GB per order.
    """
    B, T, V = probs.shape
    K, n = ngram_ids.shape
    Tp = T - n + 1
    # positions with a full n-gram inside the valid region
    pos_valid = (
        jnp.arange(Tp)[None, :] < jnp.maximum(lengths - n + 1, 0)[:, None]
    )  # [B, Tp]
    denom = jnp.maximum(jnp.sum(pos_valid), 1).astype(probs.dtype)

    def chunk_totals(ids: jax.Array) -> jax.Array:
        # ids: [C, n] -> [C] batch totals of the n-gram product
        prod = jnp.ones((B, Tp, ids.shape[0]), probs.dtype)
        for i in range(n):
            # gather posteriors of symbol g_i at offset i: [B, Tp, C]
            prod = prod * probs[:, i : i + Tp, :][..., ids[:, i]]
        return jnp.sum(prod * pos_valid[..., None], axis=(0, 1))

    if k_chunk <= 0 or K <= k_chunk:
        total = chunk_totals(ngram_ids)
    else:
        pad = (-K) % k_chunk
        ids_p = jnp.pad(ngram_ids, ((0, pad), (0, 0)))
        chunks = ids_p.reshape(-1, k_chunk, n)
        total = jax.lax.map(chunk_totals, chunks).reshape(-1)[:K]
    return jnp.log(jnp.maximum(total / denom, log_floor))


def eodm_loss(
    logits: jax.Array,
    lengths: jax.Array,
    tables: Sequence[tuple[jax.Array, jax.Array]],
    k_chunk: int = 0,
) -> jax.Array:
    """Cross-entropy of empirical n-gram stats under the model's expected
    output distribution, summed over orders.

    tables: per order, (ngram_ids [K, n] device array, probs [K]).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    loss = 0.0
    for ids, p_hat in tables:
        logp_model = expected_ngram_logprobs(probs, lengths, ids, k_chunk=k_chunk)
        loss = loss - jnp.sum(p_hat * logp_model)
    return loss
