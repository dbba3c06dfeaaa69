"""On-device CTC decoding: greedy and vectorized prefix beam search.

The reference decoded on the host (`tf.nn.ctc_greedy_decoder` /
`tf.nn.ctc_beam_search_decoder`, SURVEY.md §3.4 — the RTF bottleneck:
logits left the device every eval step). Both decoders here are pure
JAX with static shapes, so they jit, batch, and shard like any other op
and inference never leaves the chip (BASELINE.json north star).

Beam search design (TPU-first — no tries, no host sync):
  - fixed beam width W; each step expands all W beams by all V symbols
    at once (one [B, W, V] broadcast on the VPU);
  - prefixes are identified by a rolling hash; duplicate candidates are
    merged with a sort + segment-logsumexp (all static-shaped);
  - blank/non-blank probability split (p_b, p_nb) is carried per beam,
    exactly as in the classic prefix-beam-search recursion;
  - prefix token storage is a [B, W, T] buffer updated with
    take_along_axis gathers — no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e30
_HASH_MULT = jnp.uint32(2654435761)  # Knuth multiplicative hash


def ctc_greedy_decode(
    logits: jax.Array, lengths: jax.Array, blank_id: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Argmax -> collapse repeats -> drop blanks, all on device.

    Returns (ids [B, T] left-compacted and padded with blank_id,
    out_lengths [B]).
    """
    B, T, V = logits.shape
    ids = jnp.argmax(logits, axis=-1)
    t = jnp.arange(T)[None, :]
    valid = t < lengths[:, None]
    ids = jnp.where(valid, ids, blank_id)
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    keep = (ids != prev) & (ids != blank_id) & valid
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)  # dropped entries scatter out of bounds
    out = jnp.full((B, T), blank_id, dtype=ids.dtype)
    b_idx = jnp.arange(B)[:, None].repeat(T, 1)
    out = out.at[b_idx, pos].set(ids, mode="drop")
    return out, keep.sum(axis=1)


class _BeamState(NamedTuple):
    tokens: jax.Array  # [B, W, T] prefix buffer
    lengths: jax.Array  # [B, W]
    last: jax.Array  # [B, W] last symbol (-1 if empty)
    hash1: jax.Array  # [B, W] rolling hashes of the prefix
    hash2: jax.Array
    p_b: jax.Array  # [B, W] log prob of prefix ending in blank
    p_nb: jax.Array  # [B, W] log prob ending in non-blank


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return jnp.where(
        m <= NEG, NEG, m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))
    )


def _segment_logsumexp(scores, seg_ids, num_segments):
    """Log-sum-exp of `scores` grouped by seg_ids (per batch row folded
    into seg_ids already). scores: [N], seg_ids: [N] in [0, num_segments)."""
    seg_max = jax.ops.segment_max(
        scores, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )
    seg_max = jnp.maximum(seg_max, NEG)
    shifted = jnp.exp(scores - seg_max[seg_ids])
    seg_sum = jax.ops.segment_sum(
        shifted, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return seg_max + jnp.log(jnp.maximum(seg_sum, 1e-38))


def ctc_beam_search_decode(
    logits: jax.Array,
    lengths: jax.Array,
    beam_width: int = 8,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized CTC prefix beam search, fully on device.

    Returns (ids [B, T] best prefix padded with blank_id, out_lengths [B],
    log-prob [B] of the best prefix).
    """
    B, T, V = logits.shape
    W = beam_width
    logp = jax.nn.log_softmax(logits, axis=-1)

    init = _BeamState(
        tokens=jnp.zeros((B, W, T), jnp.int32),
        lengths=jnp.zeros((B, W), jnp.int32),
        last=jnp.full((B, W), -1, jnp.int32),
        hash1=jnp.zeros((B, W), jnp.uint32),
        hash2=jnp.zeros((B, W), jnp.uint32),
        # only beam 0 starts alive (empty prefix, p_b = 1)
        p_b=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, NEG).repeat(B, 0).reshape(B, W),
        p_nb=jnp.full((B, W), NEG),
    )

    sym = jnp.arange(V, dtype=jnp.int32)
    not_blank = sym != blank_id  # [V]

    def step(state, inputs):
        lp_t, t = inputs  # lp_t: [B, V]
        lp_blank = lp_t[:, blank_id][:, None]  # [B, 1]

        # ---- "stay" candidates (prefix unchanged), one per beam: [B, W]
        # end in blank: (p_b + p_nb) * p(blank)
        stay_pb = _logaddexp(state.p_b, state.p_nb) + lp_blank
        # repeat last symbol: p_nb * p(last)
        lp_last = jnp.take_along_axis(
            lp_t[:, None, :].repeat(W, 1), jnp.maximum(state.last, 0)[..., None], -1
        )[..., 0]
        stay_pnb = jnp.where(state.last >= 0, state.p_nb + lp_last, NEG)

        # ---- "extend" candidates: beam w + symbol c: [B, W, V]
        # extending with last symbol uses p_b only (repeat-after-blank);
        # other symbols use p_b + p_nb
        base = jnp.where(
            sym[None, None, :] == state.last[..., None],
            state.p_b[..., None],
            _logaddexp(state.p_b, state.p_nb)[..., None],
        )
        ext_pnb = base + lp_t[:, None, :]
        ext_pnb = jnp.where(not_blank[None, None, :], ext_pnb, NEG)

        # ---- flatten candidates: W stay + W*V extend = K
        K = W + W * V
        h1_ext = state.hash1[..., None] * _HASH_MULT + (sym + 1)[None, None, :].astype(
            jnp.uint32
        )
        h2_ext = state.hash2[..., None] * jnp.uint32(40503) + (sym + 7)[
            None, None, :
        ].astype(jnp.uint32)

        cand_pb = jnp.concatenate([stay_pb, jnp.full((B, W * V), NEG)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(B, W * V)], axis=1)
        cand_h1 = jnp.concatenate([state.hash1, h1_ext.reshape(B, W * V)], axis=1)
        cand_h2 = jnp.concatenate([state.hash2, h2_ext.reshape(B, W * V)], axis=1)
        cand_parent = jnp.concatenate(
            [
                jnp.arange(W, dtype=jnp.int32)[None].repeat(B, 0),
                jnp.arange(W, dtype=jnp.int32)[None, :, None]
                .repeat(V, 2)
                .reshape(1, W * V)
                .repeat(B, 0),
            ],
            axis=1,
        )
        cand_char = jnp.concatenate(
            [
                jnp.full((B, W), -1, jnp.int32),
                sym[None, None, :].repeat(W, 1).reshape(1, W * V).repeat(B, 0),
            ],
            axis=1,
        )

        # ---- merge duplicates: sort by hash, segment-logsumexp
        order = jnp.argsort(cand_h1, axis=1)
        h1 = jnp.take_along_axis(cand_h1, order, 1)
        h2 = jnp.take_along_axis(cand_h2, order, 1)
        pb = jnp.take_along_axis(cand_pb, order, 1)
        pnb = jnp.take_along_axis(cand_pnb, order, 1)
        parent = jnp.take_along_axis(cand_parent, order, 1)
        char = jnp.take_along_axis(cand_char, order, 1)

        prev_h1 = jnp.pad(h1, ((0, 0), (1, 0)))[:, :K]
        prev_h2 = jnp.pad(h2, ((0, 0), (1, 0)))[:, :K]
        first = (
            (h1 != prev_h1)
            | (h2 != prev_h2)
            | (jnp.arange(K)[None, :] == 0)
        )
        seg_in_row = jnp.cumsum(first, axis=1) - 1  # [B, K]
        seg_ids = (seg_in_row + jnp.arange(B)[:, None] * K).reshape(-1)
        m_pb = _segment_logsumexp(pb.reshape(-1), seg_ids, B * K).reshape(B, K)
        m_pnb = _segment_logsumexp(pnb.reshape(-1), seg_ids, B * K).reshape(B, K)
        # representative = first element of segment; others get NEG
        pb = jnp.where(first, jnp.take_along_axis(m_pb, seg_in_row, 1), NEG)
        pnb = jnp.where(first, jnp.take_along_axis(m_pnb, seg_in_row, 1), NEG)

        # ---- top-W by total score
        total = _logaddexp(pb, pnb)
        top_score, top_idx = jax.lax.top_k(total, W)  # [B, W]

        take = lambda arr: jnp.take_along_axis(arr, top_idx, 1)
        new_parent = take(parent)
        new_char = take(char)
        new_pb = take(pb)
        new_pnb = take(pnb)
        new_h1 = take(h1)
        new_h2 = take(h2)

        # ---- rebuild prefix buffers from parents
        gather_beam = lambda arr: jnp.take_along_axis(
            arr, new_parent[..., None] if arr.ndim == 3 else new_parent, 1
        )
        tokens = jnp.take_along_axis(
            state.tokens, new_parent[..., None].repeat(T, -1), 1
        )
        lengths_w = gather_beam(state.lengths)
        last_w = gather_beam(state.last)

        is_ext = new_char >= 0
        # write the new char at position lengths (static T buffer)
        wpos = jnp.where(is_ext, lengths_w, T)  # drop when not extending
        bi = jnp.arange(B)[:, None].repeat(W, 1)
        wi = jnp.arange(W)[None, :].repeat(B, 0)
        tokens = tokens.at[bi, wi, wpos].set(
            jnp.maximum(new_char, 0), mode="drop"
        )
        new_lengths = lengths_w + is_ext.astype(jnp.int32)
        new_last = jnp.where(is_ext, new_char, last_w)

        new_state = _BeamState(
            tokens=tokens,
            lengths=new_lengths,
            last=new_last,
            hash1=new_h1,
            hash2=new_h2,
            p_b=new_pb,
            p_nb=new_pnb,
        )
        # freeze finished utterances
        active = (t < lengths)[:, None]
        merged = jax.tree.map(
            lambda n, o: jnp.where(
                active.reshape((B,) + (1,) * (n.ndim - 1)), n, o
            ),
            new_state,
            state,
        )
        return merged, None

    state, _ = jax.lax.scan(
        step, init, (jnp.moveaxis(logp, 1, 0), jnp.arange(T))
    )
    best = jnp.argmax(_logaddexp(state.p_b, state.p_nb), axis=1)  # [B]
    pick = lambda arr: jnp.take_along_axis(
        arr, best.reshape(B, *([1] * (arr.ndim - 1))), 1
    ).squeeze(1)
    ids = pick(state.tokens)
    out_len = pick(state.lengths)
    score = pick(_logaddexp(state.p_b, state.p_nb))
    # pad tail with blank_id for cleanliness
    ids = jnp.where(jnp.arange(T)[None, :] < out_len[:, None], ids, blank_id)
    return ids, out_len, score
