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

# unroll factor of the beam time scans (the per-iteration while-loop
# bookkeeping is a measurable cost at the beam step's tiny tensor
# sizes); env override for sweeps
import os as _os

_BEAM_UNROLL = int(_os.environ.get("UASR_BEAM_UNROLL", "1"))


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
    last: jax.Array  # [B, W] last symbol (-1 if empty)
    last2: jax.Array  # [B, W] second-to-last symbol (trigram LM history)
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


def _segmented_logaddexp_to_first(values, first):
    """Per-segment log-sum-exp delivered AT THE FIRST element of each
    segment, where `first` [B, K] marks segment starts along axis 1 and
    segments are contiguous (the candidate list is hash-sorted).

    Implemented as a reverse segmented scan via associative_scan on the
    flipped axis — log-depth vector ops, no scatters (jax.ops.segment_*
    lowers to scatter-adds, the slowest op class on TPU)."""
    flags = jnp.pad(first[:, 1:], ((0, 0), (0, 1)), constant_values=True)
    rev = lambda x: x[:, ::-1]

    def op(a, b):
        # b is the later element in scan order; a its accumulated left
        out_v = tuple(
            jnp.where(b[-1], bv, _logaddexp(av, bv))
            for av, bv in zip(a[:-1], b[:-1])
        )
        return out_v + (a[-1] | b[-1],)

    carried = tuple(rev(v) for v in values) + (rev(flags),)
    scanned = jax.lax.associative_scan(op, carried, axis=1)
    return tuple(rev(s) for s in scanned[:-1])


def _pairwise_merge_first(h1, h2, pb, pnb):
    """Duplicate-prefix merge WITHOUT a sort: K is small (W + W*P), so
    an all-pairs [B, K, K] hash-equality matrix + masked log-sum-exp is
    a handful of fused VPU passes, vs the multi-operand bitonic sort's
    ~O(log^2 K) sequential stages that dominate the beam step's latency
    on TPU (each scan step is latency-bound at these tensor sizes).

    Returns (pb', pnb', first) where the merged mass sits at the FIRST
    occurrence of each duplicate group and later occurrences are NEG."""
    K = h1.shape[1]
    eq = (h1[:, :, None] == h1[:, None, :]) & (h2[:, :, None] == h2[:, None, :])
    tri = jnp.arange(K)[None, :] < jnp.arange(K)[:, None]  # j < i
    first = ~jnp.any(eq & tri[None], axis=2)

    def merge(p):
        pe = jnp.where(eq, p[:, None, :], NEG)  # [B, K(i), K(j)]
        m = jnp.max(pe, axis=2)
        m_safe = jnp.maximum(m, NEG)
        s = jnp.sum(jnp.exp(pe - m_safe[..., None]), axis=2)
        return jnp.where(m <= NEG, NEG, m_safe + jnp.log(s))

    return merge(pb), merge(pnb), first


def ctc_beam_search_decode(
    logits: jax.Array,
    lengths: jax.Array,
    beam_width: int = 8,
    blank_id: int = 0,
    prune: int | None = None,
    lm_logp: jax.Array | None = None,
    lm_weight: float = 1.0,
    lm_bonus: float = 0.0,
    merge_impl: str = "fold",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized CTC prefix beam search, fully on device.

    Returns (ids [B, T] best prefix padded with blank_id, out_lengths [B],
    log-prob [B] of the best prefix).

    Two design points keep the scan O(T) instead of O(T^2) (round-1
    version was 131x slower than greedy):

      - prefixes are never materialized in the scan; each step emits
        (parent, char) backpointers and the winning prefix is rebuilt by
        one reverse traceback scan at the end;
      - extend candidates are pruned per beam to the top `prune` symbols
        before the global hash-merge sort (default min(V, 2W)); a pruned
        extension can only lose mass that merging would have added to an
        already-surviving prefix, so sequence choice is unaffected in
        practice and exact whenever prune >= V.

    Shallow n-gram LM fusion (the decoding mode the unsupervised
    lineage — EODM / wav2vec-U — scores and selects models with; the
    reference's host decoder had no LM hook): `lm_logp` is a bigram
    [V + 1, V] or trigram [V + 1, V + 1, V] table of token
    log-probabilities (history index V = start-of-sequence) —
    `uasr.ops.lm.build_bigram_lm` / `build_trigram_lm` / `prepare lm`
    produce them; the beam carries (last2, last) so the trigram history
    is exact per prefix. Each prefix EXTENSION adds
    `lm_weight * logP(c | history) + lm_bonus` to the candidate score
    (the bonus counters the LM's per-token length penalty); stay
    candidates add nothing, so the fused score of a prefix is
    log P_ctc + lm_weight * log P_lm + lm_bonus * len, applied exactly
    once per emitted token on every alignment path.
    """
    B, T, V = logits.shape
    W = beam_width
    logp = jax.nn.log_softmax(logits, axis=-1)
    init = ctc_beam_init(B, W)
    state, parents, chars = ctc_beam_scan(
        logp, lengths, init, blank_id=blank_id, prune=prune,
        lm_logp=lm_logp, lm_weight=lm_weight, lm_bonus=lm_bonus,
        merge_impl=merge_impl,
    )
    best = jnp.argmax(_logaddexp(state.p_b, state.p_nb), axis=1)  # [B]

    # ---- traceback: walk parents from t = T-1 down, collecting chars
    def back(idx, inp):
        parent_t, char_t = inp  # [B, W]
        c = jnp.take_along_axis(char_t, idx[:, None], 1)[:, 0]
        nxt = jnp.take_along_axis(parent_t, idx[:, None], 1)[:, 0]
        return nxt, c

    _, path_chars = jax.lax.scan(back, best, (parents, chars), reverse=True,
                                 unroll=min(_BEAM_UNROLL, T))
    path = path_chars.T  # [B, T]; char emitted at step t, -1 = none

    # compact: drop -1 entries, left-align (same scatter trick as greedy)
    keep = path >= 0
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)
    ids = jnp.full((B, T), blank_id, dtype=jnp.int32)
    b_idx = jnp.arange(B)[:, None].repeat(T, 1)
    ids = ids.at[b_idx, pos].set(jnp.maximum(path, 0), mode="drop")
    out_len = keep.sum(axis=1)
    score = jnp.take_along_axis(
        _logaddexp(state.p_b, state.p_nb), best[:, None], 1
    )[:, 0]
    return ids, out_len, score


def ctc_beam_init(batch: int, beam_width: int) -> _BeamState:
    """Fresh beam state: one live beam (the empty prefix)."""
    B, W = batch, beam_width
    return _BeamState(
        last=jnp.full((B, W), -1, jnp.int32),
        last2=jnp.full((B, W), -1, jnp.int32),
        hash1=jnp.zeros((B, W), jnp.uint32),
        hash2=jnp.zeros((B, W), jnp.uint32),
        # only beam 0 starts alive (empty prefix, p_b = 1)
        p_b=jnp.where(jnp.arange(W)[None, :] == 0, 0.0, NEG).repeat(B, 0).reshape(B, W),
        p_nb=jnp.full((B, W), NEG),
    )


def ctc_beam_scan(
    logp: jax.Array,
    lengths: jax.Array,
    state: _BeamState,
    blank_id: int = 0,
    prune: int | None = None,
    lm_logp: jax.Array | None = None,
    lm_weight: float = 1.0,
    lm_bonus: float = 0.0,
    merge_impl: str = "fold",
    t_offset=0,
) -> tuple[_BeamState, jax.Array, jax.Array]:
    """Advance a beam state over `logp` [B, T, V] (log-probs, already
    softmaxed). Returns (state, parents [T, B, W], chars [T, B, W]) —
    the per-step backpointers for traceback. Steps with
    `t + t_offset >= lengths[b]` freeze that batch row's state and emit
    identity backpointers. Resumable: feeding chunks of the same logp
    sequentially (carrying the state, offsetting t) evolves the state
    EXACTLY as one full scan — the streaming beam contract
    (uasr.serve)."""
    B, T, V = logp.shape
    W = state.last.shape[1]
    P = min(V, 2 * W) if prune is None else min(V, max(prune, 1))
    if lm_logp is not None:
        lm_logp = lm_logp.astype(jnp.float32)

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
        ext_score = lp_t[:, None, :]
        if lm_logp is not None:
            hist = jnp.where(state.last >= 0, state.last, V)  # [B, W]
            if lm_logp.ndim == 2:  # bigram [V+1, V]
                lm_row = lm_logp[hist]
            else:  # trigram [V+1, V+1, V]
                hist2 = jnp.where(state.last2 >= 0, state.last2, V)
                lm_row = lm_logp[hist2, hist]
            ext_score = ext_score + lm_weight * lm_row + lm_bonus
        ext_pnb = base + ext_score
        ext_pnb = jnp.where(not_blank[None, None, :], ext_pnb, NEG)

        if merge_impl == "fold":
            # ---- O(W^2) exact merge BEFORE pruning/flattening.
            # Distinct live beams have distinct prefixes, so the ONLY
            # possible duplicate among candidates is ext(w, c) colliding
            # with stay(w') where prefix_w + c == prefix_w' — and then
            # necessarily c == last[w']. Fold that ext mass into the
            # stay and NEG the ext entry; every remaining candidate is
            # unique and the sort/merge machinery disappears from the
            # step. (Also more exact than merging after the top-P prune:
            # folded mass can never be pruned away.)
            c_p = jnp.maximum(state.last, 0).astype(jnp.uint32)  # [B, W']
            h1_f = state.hash1[:, :, None] * _HASH_MULT + (c_p[:, None, :] + 1)
            h2_f = (state.hash2[:, :, None] * jnp.uint32(40503)
                    + (c_p[:, None, :] + 7))
            match = (
                (h1_f == state.hash1[:, None, :])
                & (h2_f == state.hash2[:, None, :])
                & (state.last[:, None, :] >= 0)
            )  # [B, W(src), W'(dst)]
            gathered = jnp.take_along_axis(
                ext_pnb,
                jnp.broadcast_to(c_p[:, None, :].astype(jnp.int32),
                                 (B, W, W)),
                axis=2,
            )  # ext_pnb[b, w, last[w']]
            contrib = jnp.where(match, gathered, NEG)
            m = jnp.max(contrib, axis=1)  # [B, W']
            m_safe = jnp.maximum(m, NEG)
            fold_mass = jnp.where(
                m <= NEG, NEG,
                m_safe + jnp.log(
                    jnp.sum(jnp.exp(contrib - m_safe[:, None, :]), axis=1)
                ),
            )
            stay_pnb = _logaddexp(stay_pnb, fold_mass)
            # remove the folded entries from the ext pool
            folded_c = jnp.einsum(
                "bwu,buv->bwv", match.astype(jnp.float32),
                jax.nn.one_hot(c_p.astype(jnp.int32), V),
            )
            ext_pnb = jnp.where(folded_c > 0, NEG, ext_pnb)

        # ---- per-beam prune to the top-P symbols: [B, W, P]
        if P < V:
            ext_pnb, ext_sym = jax.lax.top_k(ext_pnb, P)
        else:
            ext_sym = jnp.broadcast_to(sym[None, None, :], (B, W, V))

        # ---- flatten candidates: W stay + W*P extend = K
        K = W + W * P
        ext_u = ext_sym.astype(jnp.uint32)
        h1_ext = state.hash1[..., None] * _HASH_MULT + (ext_u + 1)
        h2_ext = state.hash2[..., None] * jnp.uint32(40503) + (ext_u + 7)

        cand_pb = jnp.concatenate([stay_pb, jnp.full((B, W * P), NEG)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(B, W * P)], axis=1)
        cand_h1 = jnp.concatenate([state.hash1, h1_ext.reshape(B, W * P)], axis=1)
        cand_h2 = jnp.concatenate([state.hash2, h2_ext.reshape(B, W * P)], axis=1)
        cand_parent = jnp.concatenate(
            [
                jnp.arange(W, dtype=jnp.int32)[None].repeat(B, 0),
                jnp.arange(W, dtype=jnp.int32)[None, :, None]
                .repeat(P, 2)
                .reshape(1, W * P)
                .repeat(B, 0),
            ],
            axis=1,
        )
        cand_char = jnp.concatenate(
            [jnp.full((B, W), -1, jnp.int32), ext_sym.reshape(B, W * P)],
            axis=1,
        )

        # ---- merge duplicates. "fold" (default): duplicates were
        # already folded above — just make dead candidates' hashes
        # unique sentinels so top-W can never resurrect a duplicate of
        # a live prefix through a shared stale hash (dead beams /
        # NEG'd ext slots keep hash bytes of real prefixes).
        # "pairwise": all-pairs hash equality + masked log-sum-exp.
        # "sort": multi-operand sort by hash + segmented log-sum-exp
        # scan over contiguous hash runs (round-2 design, kept as the
        # reference implementation for the equivalence tests).
        if merge_impl == "fold":
            dead = _logaddexp(cand_pb, cand_pnb) < (0.5 * NEG)
            k_idx = jnp.arange(K, dtype=jnp.uint32)[None, :]
            h1 = jnp.where(dead, jnp.uint32(0x80000000) + k_idx, cand_h1)
            h2 = jnp.where(dead, jnp.uint32(0xC0000000) + k_idx, cand_h2)
            pb, pnb = cand_pb, cand_pnb
            parent, char = cand_parent, cand_char
        elif merge_impl == "pairwise":
            m_pb, m_pnb, first = _pairwise_merge_first(
                cand_h1, cand_h2, cand_pb, cand_pnb
            )
            pb = jnp.where(first, m_pb, NEG)
            pnb = jnp.where(first, m_pnb, NEG)
            h1, h2 = cand_h1, cand_h2
            parent, char = cand_parent, cand_char
        else:
            h1, h2, pb, pnb, parent, char = jax.lax.sort(
                (cand_h1, cand_h2, cand_pb, cand_pnb, cand_parent, cand_char),
                dimension=1,
                num_keys=1,
            )
            prev_h1 = jnp.pad(h1, ((0, 0), (1, 0)))[:, :K]
            prev_h2 = jnp.pad(h2, ((0, 0), (1, 0)))[:, :K]
            first = (
                (h1 != prev_h1)
                | (h2 != prev_h2)
                | (jnp.arange(K)[None, :] == 0)
            )
            m_pb, m_pnb = _segmented_logaddexp_to_first((pb, pnb), first)
            # representative = first element of segment; others get NEG
            pb = jnp.where(first, m_pb, NEG)
            pnb = jnp.where(first, m_pnb, NEG)

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

        last_w = jnp.take_along_axis(state.last, new_parent, 1)
        last2_w = jnp.take_along_axis(state.last2, new_parent, 1)
        is_ext = new_char >= 0
        new_last = jnp.where(is_ext, new_char, last_w)
        new_last2 = jnp.where(is_ext, last_w, last2_w)

        new_state = _BeamState(
            last=new_last,
            last2=new_last2,
            hash1=new_h1,
            hash2=new_h2,
            p_b=new_pb,
            p_nb=new_pnb,
        )
        # freeze finished utterances
        active = ((t + t_offset) < lengths)[:, None]
        merged = jax.tree.map(
            lambda n, o: jnp.where(active, n, o), new_state, state
        )
        # backpointers for the final traceback; frozen steps emit the
        # identity so the traceback passes through them unchanged
        out_parent = jnp.where(
            active, new_parent, jnp.arange(W, dtype=jnp.int32)[None, :]
        )
        out_char = jnp.where(active & is_ext, new_char, -1)
        return merged, (out_parent, out_char)

    final, (parents, chars) = jax.lax.scan(
        step, state, (jnp.moveaxis(logp, 1, 0), jnp.arange(T)),
        unroll=min(_BEAM_UNROLL, T),
    )
    return final, parents, chars
