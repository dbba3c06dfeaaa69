"""Batched Levenshtein distance on device (PER/CER).

The reference scored on the host with the `editdistance` C extension
(SURVEY.md §2.2 "Decode & metrics"). Here the DP is vectorized in JAX:
the classic row recurrence has a sequential dependency along the row
(the insertion chain), which we break with the min-plus prefix-scan
identity

    dp_new[j] = min_{k <= j} (base[k] + (j - k))
              = j + cummin(base[k] - k),

so each hypothesis token costs one O(N) vector step and the whole batch
runs in a single `lax.scan`. A C++ host implementation for bulk offline
scoring lives in uasr/native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)


def batch_edit_distance(
    refs: jax.Array,
    ref_lengths: jax.Array,
    hyps: jax.Array,
    hyp_lengths: jax.Array,
) -> jax.Array:
    """Levenshtein distance per pair. refs: [B, N], hyps: [B, M] int."""
    B, N = refs.shape
    M = hyps.shape[1]
    j = jnp.arange(N + 1)[None, :]  # [1, N+1]
    dp0 = jnp.minimum(j, ref_lengths[:, None] + 0) * 1  # dp[0][j] = j
    dp0 = jnp.where(j <= ref_lengths[:, None], j, BIG).astype(jnp.int32)

    def step(dp, inputs):
        hyp_tok, i = inputs  # hyp_tok: [B], i: scalar (1-based row)
        sub_cost = (refs != hyp_tok[:, None]).astype(jnp.int32)  # [B, N]
        diag = dp[:, :-1] + sub_cost  # dp_old[j-1] + cost, j = 1..N
        up = dp[:, 1:] + 1  # dp_old[j] + 1 (deletion from hyp view)
        base = jnp.concatenate(
            [jnp.full((B, 1), i, jnp.int32), jnp.minimum(diag, up)], axis=1
        )  # [B, N+1]
        shifted = base - j.astype(jnp.int32)
        cm = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        new = cm + j.astype(jnp.int32)
        new = jnp.where(j <= ref_lengths[:, None], new, BIG)
        active = (i <= hyp_lengths)[:, None]
        return jnp.where(active, new, dp), None

    dp, _ = jax.lax.scan(
        step,
        dp0,
        (jnp.moveaxis(hyps, 1, 0), jnp.arange(1, M + 1, dtype=jnp.int32)),
    )
    return jnp.take_along_axis(dp, ref_lengths[:, None], axis=1)[:, 0]


def error_rate(refs, ref_lengths, hyps, hyp_lengths) -> jax.Array:
    """Corpus-level token error rate (PER/CER): sum(dist) / sum(ref_len)."""
    d = batch_edit_distance(refs, ref_lengths, hyps, hyp_lengths)
    return jnp.sum(d) / jnp.maximum(jnp.sum(ref_lengths), 1)
