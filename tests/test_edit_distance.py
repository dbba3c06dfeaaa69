"""Edit distance: min-plus scan DP vs a plain O(NM) python reference."""

import numpy as np

import jax.numpy as jnp

from uasr.ops.edit_distance import batch_edit_distance, error_rate


def _py_levenshtein(a, b):
    dp = list(range(len(a) + 1))
    for i, y in enumerate(b, 1):
        new = [i]
        for j, x in enumerate(a, 1):
            new.append(min(dp[j] + 1, new[j - 1] + 1, dp[j - 1] + (x != y)))
        dp = new
    return dp[len(a)]


def test_matches_python_reference():
    rng = np.random.RandomState(0)
    B, N, M = 8, 12, 15
    refs = rng.randint(1, 6, size=(B, N))
    hyps = rng.randint(1, 6, size=(B, M))
    ref_len = rng.randint(0, N + 1, size=B)
    hyp_len = rng.randint(0, M + 1, size=B)
    got = np.asarray(
        batch_edit_distance(
            jnp.asarray(refs), jnp.asarray(ref_len),
            jnp.asarray(hyps), jnp.asarray(hyp_len),
        )
    )
    for b in range(B):
        ref = _py_levenshtein(
            list(refs[b, : ref_len[b]]), list(hyps[b, : hyp_len[b]])
        )
        assert got[b] == ref, (b, got[b], ref)


def test_known_cases():
    refs = jnp.asarray([[1, 2, 3, 0], [1, 2, 3, 4]])
    hyps = jnp.asarray([[1, 2, 3, 0], [4, 3, 2, 1]])
    d = batch_edit_distance(
        refs, jnp.array([3, 4]), hyps, jnp.array([3, 4])
    )
    assert list(np.asarray(d)) == [0, 4]


def test_error_rate():
    refs = jnp.asarray([[1, 2, 3, 4]])
    hyps = jnp.asarray([[1, 2, 9, 4]])
    per = error_rate(refs, jnp.array([4]), hyps, jnp.array([4]))
    np.testing.assert_allclose(float(per), 0.25)
