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
