"""Decode checks: greedy vs a numpy reference; beam search vs brute-force
posterior enumeration on a toy vocab (SURVEY.md §4)."""

import itertools

import numpy as np

import jax.numpy as jnp

from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode


def _np_greedy(logits, length, blank=0):
    ids = logits[:length].argmax(-1)
    out, prev = [], -1
    for i in ids:
        if i != prev and i != blank:
            out.append(int(i))
        prev = i
    return out


def test_greedy_matches_numpy():
    rng = np.random.RandomState(0)
    B, T, V = 5, 30, 8
    logits = rng.randn(B, T, V).astype(np.float32)
    lengths = rng.randint(5, T + 1, size=B)
    ids, out_len = ctc_greedy_decode(
        jnp.asarray(logits), jnp.asarray(lengths), blank_id=0
    )
    for b in range(B):
        ref = _np_greedy(logits[b], lengths[b])
        got = list(np.asarray(ids[b, : int(out_len[b])]))
        assert got == ref, (b, got, ref)


def _brute_force_best(logp, blank=0):
    """Exact CTC posterior argmax over collapsed sequences by enumerating
    all alignment paths (tiny T, V only)."""
    T, V = logp.shape
    probs = {}
    for path in itertools.product(range(V), repeat=T):
        p = float(np.exp(sum(logp[t, c] for t, c in enumerate(path))))
        out, prev = [], -1
        for c in path:
            if c != prev and c != blank:
                out.append(c)
            prev = c
        key = tuple(out)
        probs[key] = probs.get(key, 0.0) + p
    best = max(probs.items(), key=lambda kv: kv[1])
    return list(best[0]), best[1]


def test_beam_matches_brute_force():
    rng = np.random.RandomState(1)
    T, V = 5, 4
    for seed in range(6):
        rng = np.random.RandomState(seed)
        logits = rng.randn(1, T, V).astype(np.float32) * 1.5
        logp = np.log(
            np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True)
        )
        ref_seq, ref_p = _brute_force_best(logp)
        ids, out_len, score = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.array([T]), beam_width=16, blank_id=0
        )
        got = list(np.asarray(ids[0, : int(out_len[0])]))
        assert got == ref_seq, (seed, got, ref_seq)
        # beam score is a lower bound on the exact posterior (mass routed
        # through pruned prefixes is lost) but must be tight here
        assert float(score[0]) <= np.log(ref_p) + 1e-5
        np.testing.assert_allclose(float(score[0]), np.log(ref_p), rtol=2e-2)


def test_beam_width_1_close_to_greedy():
    """W=1 beam follows the locally-best prefix; on peaked logits it
    equals greedy."""
    rng = np.random.RandomState(2)
    B, T, V = 3, 12, 6
    logits = rng.randn(B, T, V).astype(np.float32) * 8.0  # peaked
    lengths = np.full(B, T)
    g_ids, g_len = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray(lengths))
    b_ids, b_len, _ = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=1
    )
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(b_ids))


def test_beam_respects_lengths():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 10, 5).astype(np.float32)
    # second utterance only 4 frames: output must not exceed 4 tokens
    ids, out_len, _ = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.array([10, 4]), beam_width=4
    )
    assert int(out_len[1]) <= 4
    # and must equal decoding the truncated logits alone
    ids2, len2, _ = ctc_beam_search_decode(
        jnp.asarray(logits[1:2, :4]), jnp.array([4]), beam_width=4
    )
    got = list(np.asarray(ids[1, : int(out_len[1])]))
    ref = list(np.asarray(ids2[0, : int(len2[0])]))
    assert got == ref
