"""InfoNCE contrastive loss for self-supervised pretraining (CPC /
wav2vec-style).

Beyond the reference: the reference consumed externally-produced SSL
features for its wav2vec-U-style stretch recipe (SURVEY.md §2.2
"Recipes", BASELINE config #5) and had no pretraining of its own. This
op + uasr/models/ssl.py make the framework self-contained.

TPU-first design: the similarity computation is a handful of batched
GEMMs over static shapes — no per-step sampling loops, no dynamic
shapes. Positive scores are computed with K static shifted views of the
latent tensor (K is small), negatives either as one [B,T,K,S] einsum
against every in-utterance position (exact softmax — small T / tests)
or against N pre-sampled positions per utterance ([B,T,K,N] einsum —
production shapes, where the full T x T score tensor would not fit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _l2norm(x, eps=1e-8):
    # norm accumulated in f32, result kept in x's dtype: promoting the
    # normalized latents to f32 would force every downstream score
    # einsum off the bf16 MXU path (round-4 SSL attribution — the
    # heads+InfoNCE backward dominated the residual step time)
    inv = jax.lax.rsqrt(jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) + eps)
    return x * inv.astype(x.dtype)


def _pos_scores(pn, zn):
    """pn: [B, T, K, C] predictions; zn: [B, T, C] normalized latents.
    Returns [B, T, K] dot of pred (t, k) with z_{t+k}, via K static
    shifted slices (no [B,T,K,C] gather); f32 accumulation."""
    B, T, K, C = pn.shape
    zpad = jnp.pad(zn, ((0, 0), (0, K), (0, 0)))
    cols = [
        jnp.einsum(
            "btc,btc->bt", pn[:, :, k, :], zpad[:, k + 1 : k + 1 + T, :],
            preferred_element_type=jnp.float32,
        )
        for k in range(K)
    ]
    return jnp.stack(cols, axis=-1)  # [B, T, K]


def info_nce_loss(
    preds: jax.Array,  # [B, T, K, C] prediction of z_{t+k} from c_t
    z: jax.Array,  # [B, T, C] target latents
    lengths: jax.Array,  # [B] valid frames
    temperature: float = 0.1,
    neg_indices: jax.Array | None = None,  # [B, N] positions, or None=all
) -> tuple[jax.Array, jax.Array]:
    """Contrastive loss over cosine similarities.

    For each valid (t, k) the model must pick z_{t+k} against
    in-utterance negatives: every valid position (neg_indices=None) or
    the sampled positions in neg_indices (collisions with the true
    target are masked out, wav2vec-style). Returns (mean NLL over valid
    pairs, accuracy = fraction of pairs where the positive wins).
    """
    B, T, K, C = preds.shape
    # cosine = (p . z_n) / |p|: dividing SCORES by the prediction norm
    # instead of materializing a normalized [B, T, K, C] copy of preds
    # saves two full passes over the largest tensor in the loss
    # (round-4 SSL attribution: the loss was bandwidth-bound)
    inv_pn = jax.lax.rsqrt(jnp.sum(
        jnp.square(preds.astype(jnp.float32)), axis=-1) + 1e-8
    )  # [B, T, K]
    zn = _l2norm(z)
    tpos = jnp.arange(T)[None, :, None]  # [1, T, 1]
    targets = tpos + jnp.arange(1, K + 1)[None, None, :]  # [1, T, K]
    pair_valid = targets < lengths[:, None, None]  # [B, T, K]
    pos = _pos_scores(preds, zn) * inv_pn / temperature  # [B, T, K]

    if neg_indices is None:
        # exact softmax over every valid in-utterance position
        scores = jnp.einsum(
            "btkc,bsc->btks", preds, zn,
            preferred_element_type=jnp.float32,
        ) * inv_pn[..., None] / temperature
        valid_s = (jnp.arange(T)[None, :] < lengths[:, None])  # [B, S]
        scores = jnp.where(valid_s[:, None, None, :], scores, _NEG_INF)
        lse = jax.nn.logsumexp(scores, axis=-1)
        nll = lse - pos
        # accuracy compares pos against true negatives only (the target
        # column is the einsum's own copy of pos — float noise between
        # the two computations would flip near-ties)
        is_tgt = jnp.arange(T)[None, None, None, :] == targets[..., None]
        win = pos >= jnp.max(jnp.where(is_tgt, _NEG_INF, scores), axis=-1)
    else:
        zneg = jnp.take_along_axis(zn, neg_indices[:, :, None], axis=1)
        neg = jnp.einsum(
            "btkc,bnc->btkn", preds, zneg,
            preferred_element_type=jnp.float32,
        ) * inv_pn[..., None] / temperature  # [B, T, K, N]
        # mask negatives that happen to BE the target position (the
        # positive would compete with itself and the loss could never
        # reach zero)
        collide = neg_indices[:, None, None, :] == targets[..., None]
        neg = jnp.where(collide, _NEG_INF, neg)
        # lse over {pos} ∪ negatives without concatenating a
        # [B, T, K, N+1] copy of the biggest tensor in the loss: fold
        # the positive in with one [B, T, K]-shaped logaddexp
        lse = jnp.logaddexp(jax.nn.logsumexp(neg, axis=-1), pos)
        nll = lse - pos
        win = pos >= jnp.max(neg, axis=-1)

    denom = jnp.maximum(jnp.sum(pair_valid), 1)
    loss = jnp.sum(jnp.where(pair_valid, nll, 0.0)) / denom
    acc = jnp.sum(jnp.where(pair_valid, win, False)) / denom
    return loss, acc


def info_nce_loss_fused(
    c: jax.Array,  # [B, T, Ch] context vectors (heads INPUT)
    w: jax.Array,  # [Ch, K * C] prediction-heads kernel
    b: jax.Array,  # [K * C] prediction-heads bias
    z: jax.Array,  # [B, T, C] target latents
    lengths: jax.Array,  # [B] valid frames
    num_steps: int,  # K
    temperature: float = 0.1,
    neg_indices: jax.Array | None = None,  # [B, N] sampled positions
    chunk: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """`info_nce_loss` with the heads GEMM folded in and the time axis
    chunked (round-5, VERDICT round-4 weak #2).

    The unfused path materializes preds = heads(c) as a [B, T, K, C]
    HBM tensor (420 MB bf16 at bench shapes) and then streams it
    through norms, positive scores, and the negative einsum — the
    round-4 attribution showed those passes, not FLOPs, bound the SSL
    step. Here a `lax.scan` over T-chunks computes each chunk's
    predictions from `c` right where they are consumed; the chunk body
    is `jax.checkpoint`ed so the backward recomputes its [B, TC, K, C]
    slice instead of persisting it. HBM traffic drops from O(B*T*K*C)
    tensors to O(B*T*(Ch+C)) reads plus per-chunk negatives.

    Semantics match `info_nce_loss(preds=heads(c), ...)` with sampled
    negatives exactly (same masking, same accuracy rule); parity pinned
    by tests/test_ssl.py. Exact-softmax (neg_indices=None) stays on the
    unfused path — it is a small-T/test configuration."""
    if neg_indices is None:
        raise ValueError(
            "info_nce_loss_fused needs sampled negatives "
            "(ssl.num_negatives > 0); the exact-softmax path is the "
            "small-T/test configuration — use info_nce_loss"
        )
    B, T, Ch = c.shape
    K, C = num_steps, z.shape[-1]
    # match nn.Dense(dtype=...) semantics: params cast to the compute
    # dtype so the heads GEMM rides the bf16 MXU when the model does
    w = w.astype(c.dtype)
    b = b.astype(c.dtype)
    zn = _l2norm(z)
    zpad = jnp.pad(zn, ((0, 0), (0, K + chunk), (0, 0)))
    zneg = jnp.take_along_axis(zn, neg_indices[:, :, None], axis=1)
    n_chunks = (T + chunk - 1) // chunk
    Tp = n_chunks * chunk
    cpad = jnp.pad(c, ((0, 0), (0, Tp - T), (0, 0)))
    # [n_chunks, B, chunk, Ch] scan layout
    cs = cpad.reshape(B, n_chunks, chunk, Ch).transpose(1, 0, 2, 3)
    starts = jnp.arange(n_chunks) * chunk

    def body(carry, xs):
        nll_sum, win_sum, cnt = carry
        c_chunk, t0 = xs
        preds = (
            jnp.einsum("btc,cd->btd", c_chunk, w,
                       preferred_element_type=jnp.float32)
            .astype(c_chunk.dtype) + b
        ).reshape(B, chunk, K, C)
        inv_pn = jax.lax.rsqrt(jnp.sum(
            jnp.square(preds.astype(jnp.float32)), axis=-1) + 1e-8)
        zwin = jax.lax.dynamic_slice_in_dim(zpad, t0, chunk + K, axis=1)
        pos = jnp.stack([
            jnp.einsum("btc,btc->bt", preds[:, :, k, :],
                       zwin[:, k + 1 : k + 1 + chunk, :],
                       preferred_element_type=jnp.float32)
            for k in range(K)
        ], axis=-1) * inv_pn / temperature  # [B, chunk, K]
        targets = (t0 + jnp.arange(chunk))[None, :, None] \
            + jnp.arange(1, K + 1)[None, None, :]
        pair_valid = targets < lengths[:, None, None]
        neg = jnp.einsum(
            "btkc,bnc->btkn", preds, zneg,
            preferred_element_type=jnp.float32,
        ) * inv_pn[..., None] / temperature
        collide = neg_indices[:, None, None, :] == targets[..., None]
        neg = jnp.where(collide, _NEG_INF, neg)
        lse = jnp.logaddexp(jax.nn.logsumexp(neg, axis=-1), pos)
        nll = lse - pos
        win = pos >= jnp.max(neg, axis=-1)
        return (
            nll_sum + jnp.sum(jnp.where(pair_valid, nll, 0.0)),
            win_sum + jnp.sum(jnp.where(pair_valid, win, 0.0)),
            cnt + jnp.sum(pair_valid),
        ), None

    (nll_sum, win_sum, cnt), _ = jax.lax.scan(
        jax.checkpoint(body), (jnp.zeros(()), jnp.zeros(()),
                               jnp.zeros((), jnp.int32)),
        (cs, starts),
    )
    denom = jnp.maximum(cnt, 1)
    return nll_sum / denom, win_sum / denom


def sample_negatives(
    rng: jax.Array, lengths: jax.Array, num: int, T: int
) -> jax.Array:
    """[B, N] uniform positions in [0, length_b) per utterance (static
    shapes; all-padding utterances clamp to position 0)."""
    B = lengths.shape[0]
    u = jax.random.uniform(rng, (B, num))
    return jnp.minimum(
        (u * jnp.maximum(lengths, 1)[:, None]).astype(jnp.int32),
        jnp.maximum(lengths[:, None] - 1, 0),
    )
