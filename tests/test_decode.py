"""Decode checks: greedy vs a numpy reference; beam search vs brute-force
posterior enumeration on a toy vocab (SURVEY.md §4)."""

import itertools

import numpy as np
import pytest

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


@pytest.mark.parametrize("merge_impl", ["fold", "pairwise", "sort"])
def test_beam_matches_brute_force(merge_impl):
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
            jnp.asarray(logits), jnp.array([T]), beam_width=16, blank_id=0,
            merge_impl=merge_impl,
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


@pytest.mark.parametrize("impl", ["fold", "pairwise"])
def test_merge_impls_agree(impl):
    """The sort-free merges are numerically equivalent to the sort +
    segmented-scan merge on realistic shapes (both LM orders). V <= 2W
    here so no per-beam pruning happens — with pruning, "fold" is
    deliberately MORE exact (it folds before pruning)."""
    rng = np.random.RandomState(7)
    B, T, V, W = 4, 24, 12, 8
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.asarray([T, T - 5, 9, 1])
    lm = np.log(
        rng.dirichlet(np.ones(V - 1) * 0.5, size=V + 1).astype(np.float32)
    )
    lm = np.pad(lm, ((0, 0), (1, 0)), constant_values=-30.0)  # blank col
    for kw in (
        {},
        {"lm_logp": jnp.asarray(lm), "lm_weight": 0.4, "lm_bonus": 0.3},
    ):
        a = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
            merge_impl=impl, **kw,
        )
        b = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
            merge_impl="sort", **kw,
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(
            np.asarray(a[2]), np.asarray(b[2]), rtol=1e-5, atol=1e-5
        )


def test_pruned_beam_agrees_with_exact_at_large_vocab():
    """Statistical check of the default per-beam prune P = 2W in the
    regime where it actually prunes (V=48 > P=16, W=8): sequence- and
    score-agreement with the unpruned (P=V, exact-merge) beam on random
    logits. Pins the 'pruning does not change sequence choice in
    practice' claim (round-2 VERDICT weak #3)."""
    B, T, V, W = 16, 30, 48, 8
    seq_match = 0
    total = 0
    for seed in range(4):
        rng = np.random.RandomState(100 + seed)
        logits = rng.randn(B, T, V).astype(np.float32) * 1.5
        lengths = np.full(B, T)
        pr_ids, pr_len, pr_sc = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.asarray(lengths), beam_width=W
        )
        ex_ids, ex_len, ex_sc = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
            prune=V,
        )
        for b in range(B):
            total += 1
            a = list(np.asarray(pr_ids[b, : int(pr_len[b])]))
            c = list(np.asarray(ex_ids[b, : int(ex_len[b])]))
            if a == c:
                seq_match += 1
        # pruned scores can only lose mass relative to the exact merge
        assert np.all(np.asarray(pr_sc) <= np.asarray(ex_sc) + 1e-5)
    # random (hard, flat-logit) regime: demand >= 90% exact sequence
    # agreement; real acoustic posteriors are far peakier than this
    assert seq_match / total >= 0.90, (seq_match, total)


# -------------------------------------------------- shallow LM fusion


def _brute_force_best_lm(logp, lm_logp, w, bonus, blank=0):
    """Exact argmax of log P_ctc(l|x) + w*log P_lm(l) + bonus*|l| by
    enumeration (tiny shapes)."""
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
    def fused(kv):
        seq, p = kv
        lm = 0.0
        prev = V  # start-of-sequence row
        for c in seq:
            lm += float(lm_logp[prev, c])
            prev = c
        return np.log(p) + w * lm + bonus * len(seq)
    best = max(probs.items(), key=fused)
    return list(best[0]), fused(best)


def test_beam_lm_fusion_matches_brute_force():
    from uasr.ops.lm import build_bigram_lm

    T, V = 5, 4
    # a biased LM: after 2 always 3, never 1
    lm = build_bigram_lm(
        [[2, 3, 2, 3], [3, 2, 3], [2, 3]], V, add_k=0.1, exclude=(0,)
    )
    for seed in range(6):
        rng = np.random.RandomState(seed)
        logits = rng.randn(1, T, V).astype(np.float32) * 1.5
        logp = np.log(
            np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True)
        )
        for w, bonus in ((0.7, 0.0), (1.0, 0.5)):
            ref_seq, ref_s = _brute_force_best_lm(logp, lm, w, bonus)
            ids, out_len, score = ctc_beam_search_decode(
                jnp.asarray(logits), jnp.array([T]), beam_width=16,
                blank_id=0, lm_logp=jnp.asarray(lm), lm_weight=w,
                lm_bonus=bonus,
            )
            got = list(np.asarray(ids[0, : int(out_len[0])]))
            assert got == ref_seq, (seed, w, bonus, got, ref_seq)
            # fused beam score <= exact fused posterior score, and tight
            assert float(score[0]) <= ref_s + 1e-4
            np.testing.assert_allclose(float(score[0]), ref_s, rtol=5e-2,
                                       atol=5e-2)


def test_beam_lm_weight_zero_is_plain_beam():
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(2, 6, 5).astype(np.float32))
    lens = jnp.asarray([6, 4])
    lm = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    a = ctc_beam_search_decode(logits, lens, beam_width=8)
    b = ctc_beam_search_decode(logits, lens, beam_width=8,
                               lm_logp=lm, lm_weight=0.0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_bigram_lm_builder_properties():
    from uasr.ops.lm import build_bigram_lm, sequence_logprob

    V = 6
    lm = build_bigram_lm([[1, 2, 3], [1, 2]], V, add_k=0.5, exclude=(0,))
    assert lm.shape == (V + 1, V)
    # rows are distributions
    np.testing.assert_allclose(np.exp(lm).sum(axis=1), 1.0, rtol=1e-5)
    # observed transition beats unseen one from the same history
    assert lm[1, 2] > lm[1, 4]
    # start row favors the observed first token
    assert lm[V, 1] > lm[V, 3]
    # blank column is (near) impossible everywhere
    assert np.all(lm[:, 0] < -40)
    # host-side scorer agrees with manual chain
    s = sequence_logprob(lm, [1, 2, 3])
    np.testing.assert_allclose(s, lm[V, 1] + lm[1, 2] + lm[2, 3], rtol=1e-6)


def test_beam_trigram_lm_matches_brute_force():
    from uasr.ops.lm import build_trigram_lm, sequence_logprob

    T, V = 5, 4
    lm3 = build_trigram_lm(
        [[2, 3, 2, 3, 1], [3, 2, 3, 1], [1, 2, 3]], V, add_k=0.1,
        exclude=(0,),
    )

    def fused_best(logp, w, bonus):
        probs = {}
        for path in itertools.product(range(V), repeat=T):
            p = float(np.exp(sum(logp[t, c] for t, c in enumerate(path))))
            out, prev = [], -1
            for c in path:
                if c != prev and c != 0:
                    out.append(c)
                prev = c
            probs[tuple(out)] = probs.get(tuple(out), 0.0) + p
        def fused(kv):
            seq, p = kv
            return (np.log(p) + w * sequence_logprob(lm3, seq)
                    + bonus * len(seq))
        best = max(probs.items(), key=fused)
        return list(best[0]), fused(best)

    for seed in range(6):
        rng = np.random.RandomState(seed + 20)
        logits = rng.randn(1, T, V).astype(np.float32) * 1.5
        logp = np.log(
            np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True)
        )
        ref_seq, ref_s = fused_best(logp, 0.8, 0.3)
        ids, out_len, score = ctc_beam_search_decode(
            jnp.asarray(logits), jnp.array([T]), beam_width=16,
            blank_id=0, lm_logp=jnp.asarray(lm3), lm_weight=0.8,
            lm_bonus=0.3,
        )
        got = list(np.asarray(ids[0, : int(out_len[0])]))
        assert got == ref_seq, (seed, got, ref_seq)
        np.testing.assert_allclose(float(score[0]), ref_s, rtol=5e-2,
                                   atol=5e-2)


def test_trigram_lm_builder_properties():
    from uasr.ops.lm import build_trigram_lm, sequence_logprob

    V = 5
    lm = build_trigram_lm([[1, 2, 3], [1, 2, 4]], V, add_k=0.5,
                          exclude=(0,))
    assert lm.shape == (V + 1, V + 1, V)
    np.testing.assert_allclose(np.exp(lm).sum(axis=2), 1.0, rtol=1e-5)
    # observed trigram (1,2)->3 beats unseen (1,2)->1
    assert lm[1, 2, 3] > lm[1, 2, 1]
    # start-start row favors the observed first token
    assert lm[V, V, 1] > lm[V, V, 3]
    assert np.all(lm[:, :, 0] < -40)  # blank column impossible
    s = sequence_logprob(lm, [1, 2, 3])
    np.testing.assert_allclose(
        s, lm[V, V, 1] + lm[V, 1, 2] + lm[1, 2, 3], rtol=1e-6
    )
