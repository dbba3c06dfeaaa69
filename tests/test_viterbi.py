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


# ---------------------------------------------------------------- dwell
# calibration (round-4 self-training regression fix: NOTES_ROUND4.md)


def test_estimate_hmm_rates_segment_vs_frame_stream():
    from uasr.ops.viterbi import estimate_hmm_rates

    # segment-level stream (gan.merge_repeats): ~1 step per token, no
    # blanks -> the transition prior must stop fighting the emissions
    sl, bp = estimate_hmm_rates(valid_steps=100, blank_steps=0, tokens=96)
    assert sl < 0.1
    assert 0.01 <= bp <= 0.4
    # frame-level 33 Hz stream with ~4-frame phones and 20% blank
    # frames -> close to the historical defaults (0.75 / 0.1)
    sl, bp = estimate_hmm_rates(valid_steps=1000, blank_steps=200,
                                tokens=200)
    assert 0.6 < sl < 0.85
    assert 0.01 <= bp <= 0.4


def test_greedy_path_stats():
    from uasr.ops.viterbi import greedy_path_stats

    # argmax rows: [1 1 2 0 2], [3 3 3 pad pad]
    V = 4
    am = np.array([[1, 1, 2, 0, 2], [3, 3, 3, 0, 0]])
    logits = np.full((2, 5, V), -5.0, np.float32)
    for b in range(2):
        for t in range(5):
            logits[b, t, am[b, t]] = 5.0
    steps, blanks, toks = map(int, greedy_path_stats(
        jnp.asarray(logits), jnp.asarray([5, 3]), blank_id=0))
    assert steps == 8           # 5 + 3 valid frames
    assert blanks == 1          # the one argmax-blank inside length
    assert toks == 4            # runs: 1,2,2 | 3


def test_calibrated_viterbi_preserves_segment_tokens():
    """THE round-3 regression, pinned: on a segment-level stream (one
    sharp step per token) the frame-rate HMM defaults delete tokens;
    dwell-calibrated rates keep the sequence exact."""
    from uasr.ops.viterbi import estimate_hmm_rates, greedy_path_stats

    rng = np.random.default_rng(7)
    V, B, T = 6, 8, 12
    seqs = []
    for b in range(B):
        s = [int(rng.integers(1, V))]
        while len(s) < T:
            nxt = int(rng.integers(1, V))
            if nxt != s[-1]:
                s.append(nxt)
        seqs.append(s)
    # soft peaks (~0.6 posterior) — sharp emissions would out-vote any
    # transition prior and mask the regression; the q9 teacher's mean
    # confidence was 0.83
    logits = np.zeros((B, T, V), np.float32)
    for b, s in enumerate(seqs):
        for t, k in enumerate(s):
            logits[b, t, k] = 2.5
    logits = jnp.asarray(logits)
    lengths = jnp.full((B,), T, jnp.int32)
    # near-uniform bigram LM over a tiny corpus
    lm = build_bigram_lm([s for s in seqs], V, exclude=(0,))

    def decode(self_loop, blank_prob):
        hmm = lm_hmm(lm, 0, self_loop=self_loop, blank_prob=blank_prob)
        ids, out_len, _ = viterbi_lm_decode(logits, lengths, hmm, 0)
        return np.asarray(ids), np.asarray(out_len)

    # frame-rate defaults: dwell prior ~4 steps/token merges segments
    _, len_default = decode(0.75, 0.1)
    assert int(len_default.sum()) < B * T  # tokens were deleted

    sl, bp = estimate_hmm_rates(*map(int, greedy_path_stats(
        logits, lengths, 0)))
    ids, out_len = decode(sl, bp)
    assert int(out_len.sum()) == B * T
    for b, s in enumerate(seqs):
        np.testing.assert_array_equal(ids[b, : len(s)], s)


# ------------------------------------------------------------- trigram
# CTC-topology HMM (round-4: ctc.use_viterbi accepts trigram tables)


def _soft_logits(seqs, V, T, peak=4.0):
    B = len(seqs)
    logits = np.zeros((B, T, V), np.float32)
    for b, s in enumerate(seqs):
        for t, k in enumerate(s):
            logits[b, t, k] = peak
    return jnp.asarray(logits)


def test_trigram_reduces_to_bigram_on_factorized_table():
    """A trigram table with P(c|a,b) = P(c|b) for every a must decode
    exactly like the bigram HMM built from P(c|b) — same ids, same
    lengths — across self_loop/blank_prob settings."""
    from uasr.ops.viterbi import make_lm_decoder

    rng = np.random.default_rng(11)
    V = 5
    lm2 = np.log(rng.dirichlet(np.ones(V - 1), size=V + 1))
    # expand to V columns with blank column ~ -inf at blank_id=0
    big = np.full((V + 1, V), -40.0, np.float32)
    big[:, 1:] = lm2
    tri = np.broadcast_to(big[None, :, :], (V + 1, V + 1, V)).copy()
    tri = np.moveaxis(tri, 0, 0)  # [a, b, c] with no a-dependence

    B, T = 4, 10
    logits = np.asarray(rng.normal(0, 2.0, size=(B, T, V)), np.float32)
    lengths = jnp.asarray([10, 7, 10, 3])
    for sl, bp in ((0.75, 0.1), (0.05, 0.02)):
        d2 = make_lm_decoder(big, 0, sl, bp)
        d3 = make_lm_decoder(tri, 0, sl, bp)
        ids2, n2, _ = d2(jnp.asarray(logits), lengths)
        ids3, n3, _ = d3(jnp.asarray(logits), lengths)
        np.testing.assert_array_equal(np.asarray(n2), np.asarray(n3))
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(ids2)[b, : int(n2[b])],
                np.asarray(ids3)[b, : int(n3[b])],
            )


def test_trigram_exact_on_sharp_segment_stream():
    from uasr.ops.lm import build_trigram_lm
    from uasr.ops.viterbi import make_lm_decoder

    rng = np.random.default_rng(5)
    V, B, T = 6, 6, 10
    seqs = []
    for _ in range(B):
        s = [int(rng.integers(1, V))]
        while len(s) < T:
            n = int(rng.integers(1, V))
            if n != s[-1]:
                s.append(n)
        seqs.append(s)
    lm3 = build_trigram_lm(seqs, V, exclude=(0,))
    logits = _soft_logits(seqs, V, T, peak=6.0)
    lengths = jnp.full((B,), T, jnp.int32)
    dec = make_lm_decoder(lm3, 0, self_loop=0.02, blank_prob=0.02)
    ids, n, score = dec(logits, lengths)
    assert np.isfinite(np.asarray(score)).all()
    for b, s in enumerate(seqs):
        assert int(n[b]) == len(s)
        np.testing.assert_array_equal(np.asarray(ids)[b, : len(s)], s)


def test_trigram_uses_two_token_history():
    """The value of the trigram lattice: a language where the legal
    next token depends on TWO tokens back. Corpus: 1 2 3 and 4 2 5
    (after '2' the continuation is determined by what preceded the 2).
    With ambiguous emissions at the third position, the bigram HMM
    cannot tell 3 from 5; the trigram recovers both contexts."""
    from uasr.ops.lm import build_bigram_lm, build_trigram_lm
    from uasr.ops.viterbi import make_lm_decoder

    V = 6
    corpus = [[1, 2, 3], [4, 2, 5]] * 30
    lm2 = build_bigram_lm(corpus, V, exclude=(0,))
    lm3 = build_trigram_lm(corpus, V, exclude=(0,))
    # emissions: first two tokens sharp, third position equally split
    # between 3 and 5
    def make(first):
        x = np.full((1, 3, V), -4.0, np.float32)
        x[0, 0, first] = 4.0
        x[0, 1, 2] = 4.0
        x[0, 2, 3] = 1.0
        x[0, 2, 5] = 1.0001  # slight tilt TOWARD the wrong token for
        return x             # the [1, 2, ?] case

    lengths = jnp.asarray([3])
    d3 = make_lm_decoder(lm3, 0, self_loop=0.02, blank_prob=0.02)
    ids_a, n_a, _ = d3(jnp.asarray(make(1)), lengths)
    ids_b, n_b, _ = d3(jnp.asarray(make(4)), lengths)
    assert np.asarray(ids_a)[0, : int(n_a[0])].tolist() == [1, 2, 3]
    assert np.asarray(ids_b)[0, : int(n_b[0])].tolist() == [4, 2, 5]
    # the bigram HMM has one P(.|2) row for both contexts: it must get
    # at least one of the two wrong (both decode to the tilted token)
    d2 = make_lm_decoder(lm2, 0, self_loop=0.02, blank_prob=0.02)
    ids2a, n2a, _ = d2(jnp.asarray(make(1)), lengths)
    ids2b, n2b, _ = d2(jnp.asarray(make(4)), lengths)
    got = (np.asarray(ids2a)[0, : int(n2a[0])].tolist(),
           np.asarray(ids2b)[0, : int(n2b[0])].tolist())
    assert got[0] != [1, 2, 3] or got[1] != [4, 2, 5], got
