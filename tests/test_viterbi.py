"""HMM Viterbi decode + CTC forced alignment vs brute-force oracles."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from uasr.ops.lm import build_bigram_lm
from uasr.ops.viterbi import (
    ctc_forced_align,
    lm_hmm,
    states_to_tokens,
    viterbi_decode,
    viterbi_lm_decode,
)

NEG = -1e30


def _brute_viterbi(emit, length, log_init, log_trans):
    """Enumerate all state paths of one utterance."""
    T, S = emit.shape
    T = int(length)
    best, best_path = -np.inf, None
    for path in itertools.product(range(S), repeat=T):
        s = log_init[path[0]] + emit[0, path[0]]
        for t in range(1, T):
            s += log_trans[path[t - 1], path[t]] + emit[t, path[t]]
        if s > best:
            best, best_path = s, path
    return np.array(best_path), best


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(0)
    B, T, S = 3, 5, 4
    emit = rng.normal(size=(B, T, S)).astype(np.float32)
    log_trans = rng.normal(size=(S, S)).astype(np.float32)
    log_trans[0, 2] = NEG  # a forbidden transition
    log_init = rng.normal(size=(S,)).astype(np.float32)
    lengths = np.array([5, 3, 1])

    states, score = viterbi_decode(
        jnp.asarray(emit), jnp.asarray(lengths), jnp.asarray(log_init),
        jnp.asarray(log_trans),
    )
    states, score = np.asarray(states), np.asarray(score)
    for b in range(B):
        ref_path, ref_score = _brute_viterbi(
            emit[b], lengths[b], log_init, log_trans
        )
        L = lengths[b]
        assert np.allclose(score[b], ref_score, atol=1e-4), b
        np.testing.assert_array_equal(states[b, :L], ref_path)


def test_states_to_tokens_collapse():
    V = 4
    # path: phone 1, 1, blank-hold(1)=V+1, 1, 2, 2 -> tokens 1, 1, 2
    states = jnp.asarray([[1, 1, V + 1, 1, 2, 2]])
    ids, n = states_to_tokens(states, jnp.asarray([6]), V, blank_id=0)
    assert int(n[0]) == 3
    np.testing.assert_array_equal(np.asarray(ids)[0, :3], [1, 1, 2])
    # length mask cuts the tail
    ids, n = states_to_tokens(states, jnp.asarray([2]), V, blank_id=0)
    assert int(n[0]) == 1
    np.testing.assert_array_equal(np.asarray(ids)[0, :1], [1])


def _markov_corpus(rng, n_seqs, V, blank_id, peak=0.85):
    """Sequences from a strongly-structured Markov chain over live
    phones (favoured next phone = (i + 1) % V, skipping the blank)."""
    live = [v for v in range(V) if v != blank_id]
    seqs = []
    for _ in range(n_seqs):
        seq = [int(rng.choice(live))]
        for _ in range(rng.integers(4, 9)):
            nxt = live[(live.index(seq[-1]) + 1) % len(live)]
            if rng.random() < peak:
                seq.append(nxt)
            else:
                seq.append(int(rng.choice(live)))
        seqs.append(seq)
    return seqs


def test_lm_viterbi_beats_greedy_on_noisy_posteriors():
    """Corrupted frame posteriors from an LM-structured corpus: the
    LM-transition HMM must repair more frames than greedy collapse."""
    from uasr.ops.decode import ctc_greedy_decode
    from uasr.ops.edit_distance import batch_edit_distance

    rng = np.random.default_rng(1)
    V, blank_id = 7, 0
    corpus = _markov_corpus(rng, 200, V, blank_id)
    lm = build_bigram_lm(corpus, V, exclude=(blank_id,))
    hmm = lm_hmm(lm, blank_id, self_loop=0.6, blank_prob=0.15)

    # emissions: each true token occupies 3 frames + 1 blank frame;
    # 25% of frames have their top phone flipped to a random other
    B, Tmax = 16, 64
    logits = np.full((B, Tmax, V), -4.0, np.float32)
    lengths = np.zeros(B, np.int64)
    refs = np.zeros((B, 16), np.int32)
    ref_lens = np.zeros(B, np.int64)
    live = [v for v in range(V) if v != blank_id]
    for b, seq in enumerate(_markov_corpus(rng, B, V, blank_id)):
        t = 0
        for tok in seq:
            for _ in range(3):
                obs = tok
                if rng.random() < 0.25:
                    obs = int(rng.choice(live))
                logits[b, t, obs] = 0.0
                t += 1
            logits[b, t, blank_id] = 0.0
            t += 1
        lengths[b] = t
        refs[b, : len(seq)] = seq
        ref_lens[b] = len(seq)

    g_ids, g_len = ctc_greedy_decode(
        jnp.asarray(logits), jnp.asarray(lengths), blank_id
    )
    v_ids, v_len, _ = viterbi_lm_decode(
        jnp.asarray(logits), jnp.asarray(lengths), hmm, blank_id
    )
    refs_j, ref_lens_j = jnp.asarray(refs), jnp.asarray(ref_lens)
    g_err = int(jnp.sum(batch_edit_distance(refs_j, ref_lens_j, g_ids, g_len)))
    v_err = int(jnp.sum(batch_edit_distance(refs_j, ref_lens_j, v_ids, v_len)))
    total = int(ref_lens.sum())
    # greedy suffers every surviving flip; the LM-HMM must repair a
    # large share of them
    assert v_err < g_err * 0.75, (v_err / total, g_err / total)


def test_lm_viterbi_clean_posteriors_exact():
    """On near-one-hot posteriors the HMM must return the true tokens
    (the LM prior must not override strong acoustic evidence)."""
    rng = np.random.default_rng(2)
    V, blank_id = 6, 0
    corpus = _markov_corpus(rng, 100, V, blank_id)
    lm = build_bigram_lm(corpus, V, exclude=(blank_id,))
    hmm = lm_hmm(lm, blank_id)
    seq = corpus[0][:6]
    T = len(seq) * 4
    logits = np.full((1, T, V), -8.0, np.float32)
    for i, tok in enumerate(seq):
        logits[0, 4 * i : 4 * i + 3, tok] = 0.0
        logits[0, 4 * i + 3, blank_id] = 0.0
    ids, n, _ = viterbi_lm_decode(
        jnp.asarray(logits), jnp.asarray([T]), hmm, blank_id
    )
    assert int(n[0]) == len(seq)
    np.testing.assert_array_equal(np.asarray(ids)[0, : len(seq)], seq)


# ---------------------------------------------------------------------------
# forced alignment
# ---------------------------------------------------------------------------


def _brute_forced_align(logp, T, labels, blank_id):
    """Enumerate all monotonic CTC state paths for one utterance."""
    L = len(labels)
    S = 2 * L + 1

    def tok(s):
        return blank_id if s % 2 == 0 else labels[(s - 1) // 2]

    def nexts(s):
        out = [s, s + 1]
        if s + 2 < S and (s + 2) % 2 == 1 and tok(s + 2) != tok(s):
            out.append(s + 2)
        return [x for x in out if x < S]

    best, best_path = -np.inf, None
    frontier = {(s,): logp[0, tok(s)] for s in (0, 1) if s < S}
    for t in range(1, T):
        new = {}
        for path, sc in frontier.items():
            for s in nexts(path[-1]):
                cand = sc + logp[t, tok(s)]
                key = path + (s,)
                if cand > new.get(key, -np.inf):
                    new[key] = cand
        frontier = new
    for path, sc in frontier.items():
        if path[-1] in (S - 1, S - 2) and sc > best:
            best, best_path = sc, path
    return np.array([tok(s) for s in best_path]), best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forced_align_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    B, T, V, L = 3, 6, 4, 2
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2
    labels = np.stack([
        rng.choice([1, 2, 3], size=L, replace=True) for _ in range(B)
    ]).astype(np.int32)
    lengths = np.array([6, 5, 4])
    label_lens = np.array([2, 2, 1])

    frame_ids, score = ctc_forced_align(
        jnp.asarray(logits), jnp.asarray(lengths), jnp.asarray(labels),
        jnp.asarray(label_lens), blank_id=0,
    )
    frame_ids, score = np.asarray(frame_ids), np.asarray(score)
    logp = np.asarray(jnp.log(jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )))
    for b in range(B):
        ref_ids, ref_score = _brute_forced_align(
            logp[b], lengths[b], labels[b, : label_lens[b]].tolist(), 0
        )
        assert np.allclose(score[b], ref_score, atol=1e-4), b
        np.testing.assert_array_equal(frame_ids[b, : lengths[b]], ref_ids)
        # tail past the utterance is blank
        assert (frame_ids[b, lengths[b]:] == 0).all()


def test_forced_align_collapse_recovers_labels():
    from uasr.ops.decode import ctc_greedy_decode

    rng = np.random.default_rng(3)
    B, T, V, L = 4, 40, 8, 6
    labels = np.stack([
        rng.choice(range(1, V), size=L) for _ in range(B)
    ]).astype(np.int32)
    label_lens = np.array([6, 4, 5, 6])
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    lengths = np.array([40, 30, 25, 18])

    frame_ids, _ = ctc_forced_align(
        jnp.asarray(logits), jnp.asarray(lengths), jnp.asarray(labels),
        jnp.asarray(label_lens), blank_id=0,
    )
    # collapsing the frame track must reproduce the transcript exactly
    one_hot = np.full((B, T, V), -10.0, np.float32)
    fi = np.asarray(frame_ids)
    for b in range(B):
        for t in range(T):
            one_hot[b, t, fi[b, t]] = 0.0
    ids, n = ctc_greedy_decode(
        jnp.asarray(one_hot), jnp.asarray(lengths), blank_id=0
    )
    for b in range(B):
        assert int(n[b]) == label_lens[b], b
        np.testing.assert_array_equal(
            np.asarray(ids)[b, : label_lens[b]], labels[b, : label_lens[b]]
        )


def test_forced_align_zero_length_transcript():
    logits = np.zeros((2, 5, 4), np.float32)
    frame_ids, score = ctc_forced_align(
        jnp.asarray(logits), jnp.asarray([5, 3]),
        jnp.asarray(np.zeros((2, 3), np.int32)), jnp.asarray([0, 2]),
        blank_id=0,
    )
    assert (np.asarray(frame_ids)[0] == 0).all()
    assert np.isfinite(np.asarray(score)[0])
