"""CTC loss checks: vs optax.ctc_loss, vs a hand-computed tiny lattice,
and gradient sanity (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from uasr.ops.ctc import ctc_loss


def _rand_problem(B=4, T=20, U=6, V=10, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    logit_lengths = rng.randint(U * 2 + 2, T + 1, size=B)
    label_lengths = rng.randint(1, U + 1, size=B)
    labels = rng.randint(1, V, size=(B, U))  # blank = 0 excluded
    for b in range(B):
        labels[b, label_lengths[b]:] = 0
    return (
        jnp.asarray(logits),
        jnp.asarray(logit_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
    )


def test_matches_optax():
    logits, llen, labels, ulen = _rand_problem()
    ours = ctc_loss(logits, llen, labels, ulen, blank_id=0)
    T, U = logits.shape[1], labels.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= llen[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None, :] >= ulen[:, None]).astype(jnp.float32)
    ref = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_matches_optax_grad():
    logits, llen, labels, ulen = _rand_problem(seed=1)
    T, U = logits.shape[1], labels.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= llen[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None, :] >= ulen[:, None]).astype(jnp.float32)
    g_ours = jax.grad(lambda lg: ctc_loss(lg, llen, labels, ulen).sum())(logits)
    g_ref = jax.grad(
        lambda lg: optax.ctc_loss(lg, logit_pad, labels, label_pad).sum()
    )(logits)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=1e-4, rtol=1e-3
    )


def test_tiny_lattice_by_hand():
    """T=2, label 'a' (id 1), V=2: P(a) = p1(a)p2(blank) + p1(blank)p2(a)
    + p1(a)p2(a)."""
    logits = jnp.asarray(
        np.log(np.array([[[0.4, 0.6], [0.3, 0.7]]], np.float32))
    )
    loss = ctc_loss(
        logits, jnp.array([2]), jnp.array([[1]]), jnp.array([1])
    )
    p = 0.6 * 0.3 + 0.4 * 0.7 + 0.6 * 0.7
    np.testing.assert_allclose(float(loss[0]), -np.log(p), rtol=1e-5)


def test_empty_label():
    """Empty label: P = prod_t p_t(blank)."""
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1, 5, 4).astype(np.float32))
    loss = ctc_loss(
        logits, jnp.array([5]), jnp.zeros((1, 3), jnp.int32), jnp.array([0])
    )
    lp = jax.nn.log_softmax(logits, -1)
    ref = -float(lp[0, :, 0].sum())
    np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-5)


def test_impossible_sequence():
    """Label longer than frames -> ~infinite loss (prob ~ 0)."""
    logits = jnp.zeros((1, 2, 4))
    loss = ctc_loss(
        logits, jnp.array([2]), jnp.array([[1, 2, 3]]), jnp.array([3])
    )
    assert float(loss[0]) > 1e4


@pytest.mark.parametrize("blank_id", [0, 3])
def test_blank_id_equivalence(blank_id):
    """Permuting the blank channel must give the same loss."""
    rng = np.random.RandomState(3)
    B, T, U, V = 2, 10, 3, 4
    logits0 = rng.randn(B, T, V).astype(np.float32)
    labels0 = rng.randint(1, V, size=(B, U))
    if blank_id == 0:
        logits, labels = logits0, labels0
    else:
        # swap channels 0 <-> blank_id and remap labels
        perm = list(range(V))
        perm[0], perm[blank_id] = perm[blank_id], perm[0]
        logits = logits0[:, :, perm]
        remap = np.argsort(perm)
        labels = remap[labels0]
    loss = ctc_loss(
        jnp.asarray(logits),
        jnp.array([T, T]),
        jnp.asarray(labels),
        jnp.array([U, U]),
        blank_id=blank_id,
    )
    ref = ctc_loss(
        jnp.asarray(logits0),
        jnp.array([T, T]),
        jnp.asarray(labels0),
        jnp.array([U, U]),
        blank_id=0,
    )
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), rtol=1e-5)
