"""Pallas CTC forward-backward kernels vs optax and the scan
implementation: losses and gradients (interpreter mode)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from uasr.ops.ctc import ctc_loss
from uasr.ops.pallas_ctc import ctc_loss_pallas


def _problem(B=4, T=20, U=6, V=10, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, T, V) * 2.0, jnp.float32)
    llen = jnp.asarray(rng.randint(U * 2 + 2, T + 1, size=B))
    ulen = jnp.asarray(rng.randint(1, U + 1, size=B))
    labels = rng.randint(1, V, size=(B, U))
    for b in range(B):
        labels[b, int(ulen[b]):] = 0
    return logits, llen, jnp.asarray(labels), ulen


def test_loss_matches_scan_and_optax():
    logits, llen, labels, ulen = _problem()
    ours = ctc_loss_pallas(logits, llen, labels, ulen, interpret=True)
    scan = ctc_loss(logits, llen, labels, ulen)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(scan), rtol=1e-4)
    T, U = logits.shape[1], labels.shape[1]
    lp = (jnp.arange(T)[None, :] >= llen[:, None]).astype(jnp.float32)
    up = (jnp.arange(U)[None, :] >= ulen[:, None]).astype(jnp.float32)
    ref = optax.ctc_loss(logits, lp, labels, up, blank_id=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_grad_matches_optax():
    logits, llen, labels, ulen = _problem(seed=1)
    T, U = logits.shape[1], labels.shape[1]
    lp = (jnp.arange(T)[None, :] >= llen[:, None]).astype(jnp.float32)
    up = (jnp.arange(U)[None, :] >= ulen[:, None]).astype(jnp.float32)
    # weighted sum exercises per-utterance cotangents
    w = jnp.asarray([1.0, 0.5, 2.0, -0.3])
    g_ours = jax.grad(
        lambda lg: jnp.sum(w * ctc_loss_pallas(lg, llen, labels, ulen,
                                               interpret=True))
    )(logits)
    g_ref = jax.grad(
        lambda lg: jnp.sum(w * optax.ctc_loss(lg, lp, labels, up))
    )(logits)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), atol=2e-4, rtol=1e-3
    )


def test_empty_label_and_edge():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 6, 5), jnp.float32)
    labels = jnp.zeros((2, 2), jnp.int32).at[1, 0].set(3)
    ulen = jnp.asarray([0, 1])
    llen = jnp.asarray([6, 4])
    ours = ctc_loss_pallas(logits, llen, labels, ulen, interpret=True)
    scan = ctc_loss(logits, llen, labels, ulen)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(scan), rtol=1e-4)
    g = jax.grad(lambda lg: ctc_loss_pallas(
        lg, llen, labels, ulen, interpret=True).sum())(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_nonzero_blank_id():
    logits, llen, labels, ulen = _problem(seed=3)
    V = logits.shape[2]
    # remap labels away from blank_id=3
    labels = jnp.where(labels == 3, 7, labels)
    ours = ctc_loss_pallas(logits, llen, labels, ulen, blank_id=3,
                           interpret=True)
    ref = ctc_loss(logits, llen, labels, ulen, blank_id=3)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4)


def test_uniform_logits_degenerate():
    """All-equal logits: loss finite, grads finite and sum ~ 0 per frame
    (softmax VJP property)."""
    logits = jnp.zeros((2, 8, 5))
    labels = jnp.asarray([[1, 2], [3, 0]])
    ulen = jnp.asarray([2, 1])
    llen = jnp.asarray([8, 5])
    loss = ctc_loss_pallas(logits, llen, labels, ulen, interpret=True)
    assert np.isfinite(np.asarray(loss)).all()
    g = jax.grad(lambda lg: ctc_loss_pallas(
        lg, llen, labels, ulen, interpret=True).sum())(logits)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g.sum(-1), 0.0, atol=1e-5)
