"""Pallas beam-search kernel vs the XLA implementation (which is itself
brute-force-verified in tests/test_decode.py). Interpreter mode; the
compiled path is exercised on real TPU by `bench.py --decode beam
--merge-impl pallas` and uasr.tools.tpu_selftest."""

import numpy as np
import pytest

import jax.numpy as jnp

from uasr.ops.decode import ctc_beam_search_decode
from uasr.ops.pallas_beam import ctc_beam_search_decode_pallas


def _ref(logits, lengths, W):
    # prune=V -> the XLA fold path is exact, same semantics as the kernel
    V = logits.shape[-1]
    return ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        prune=V, merge_impl="fold",
    )


@pytest.mark.parametrize("seed", range(4))
def test_matches_xla_beam(seed):
    rng = np.random.RandomState(seed)
    B, T, V, W = 4, 18, 10, 8
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.asarray([T, T - 4, 7, 1])
    r_ids, r_len, r_sc = _ref(logits, lengths, W)
    p_ids, p_len, p_sc = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p_ids), np.asarray(r_ids))
    np.testing.assert_array_equal(np.asarray(p_len), np.asarray(r_len))
    np.testing.assert_allclose(
        np.asarray(p_sc), np.asarray(r_sc), rtol=1e-5, atol=1e-5
    )


def test_matches_xla_beam_peaked():
    """Peaked logits (the realistic acoustic regime) + W=4."""
    rng = np.random.RandomState(42)
    B, T, V, W = 3, 25, 12, 4
    logits = rng.randn(B, T, V).astype(np.float32) * 6.0
    lengths = np.full(B, T)
    r_ids, r_len, r_sc = _ref(logits, lengths, W)
    p_ids, p_len, p_sc = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p_ids), np.asarray(r_ids))
    np.testing.assert_allclose(
        np.asarray(p_sc), np.asarray(r_sc), rtol=1e-5, atol=1e-5
    )


def test_batch_tiling():
    """B not equal to the tile cap exercises the (b, t) grid."""
    rng = np.random.RandomState(7)
    B, T, V, W = 6, 12, 8, 8
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = rng.randint(1, T + 1, size=B)
    r_ids, r_len, _ = _ref(logits, lengths, W)
    p_ids, p_len, _ = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p_ids), np.asarray(r_ids))
    np.testing.assert_array_equal(np.asarray(p_len), np.asarray(r_len))


@pytest.mark.parametrize("order", [2, 3])
def test_matches_xla_beam_with_lm(order):
    """In-kernel shallow LM fusion (one-hot GEMM against the
    VMEM-resident table) == the XLA LM beam, bigram and trigram."""
    from uasr.ops.lm import build_bigram_lm, build_trigram_lm

    rng = np.random.RandomState(3 + order)
    B, T, V, W = 4, 16, 9, 6
    build = build_bigram_lm if order == 2 else build_trigram_lm
    lm = build(
        [rng.randint(1, V, size=rng.randint(2, 9)).tolist()
         for _ in range(30)],
        V, add_k=0.5, exclude=(0,),
    )
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.asarray([T, T - 3, 5, 1])
    kw = dict(lm_logp=jnp.asarray(lm), lm_weight=0.6, lm_bonus=0.4)
    r_ids, r_len, r_sc = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        prune=V, merge_impl="fold", **kw,
    )
    p_ids, p_len, p_sc = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        interpret=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(p_ids), np.asarray(r_ids))
    np.testing.assert_array_equal(np.asarray(p_len), np.asarray(r_len))
    np.testing.assert_allclose(
        np.asarray(p_sc), np.asarray(r_sc), rtol=1e-5, atol=1e-5
    )


def test_lm_zero_weight_matches_no_lm():
    from uasr.ops.lm import build_bigram_lm

    rng = np.random.RandomState(9)
    B, T, V, W = 3, 14, 8, 4
    lm = build_bigram_lm([[1, 2, 3]], V, add_k=0.5, exclude=(0,))
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    lengths = np.full(B, T)
    a = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        lm_logp=jnp.asarray(lm), lm_weight=0.0, interpret=True,
    )
    b = ctc_beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lengths), beam_width=W,
        interpret=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)
