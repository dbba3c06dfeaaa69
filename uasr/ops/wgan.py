"""WGAN-GP objective for adversarial phone-sequence training.

The reference trained a phone classifier G adversarially against a
sequence discriminator D with the WGAN gradient penalty (SURVEY.md §3.2:
d_loss = D(fake) - D(real) + lambda * GP; the penalty differentiates
through D's gradient — double backward, which JAX handles natively via
`jax.grad` through `jax.grad`).

D consumes *distributions* over phones (softmax posteriors from G, one-
hot vectors for real text) so G stays end-to-end differentiable — the
key semantic from the reference to preserve.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_penalty(
    disc_apply: Callable,
    disc_params,
    real: jax.Array,
    fake: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
) -> jax.Array:
    """E[(||grad_x D(x_interp)|| - 1)^2] over per-sample interpolates.

    real/fake: [B, T, V] phone distributions (same static shapes).
    The norm is taken over each sample's full (T, V) slab; padding
    frames contribute zero gradient because D masks them.
    """
    B = real.shape[0]
    eps = jax.random.uniform(rng, (B, 1, 1), dtype=real.dtype)
    interp = eps * real + (1.0 - eps) * fake

    def disc_sum(x):
        return jnp.sum(disc_apply(disc_params, x, lengths))

    grads = jax.grad(disc_sum)(interp)  # [B, T, V]
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=(1, 2)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def d_loss_fn(
    disc_apply: Callable,
    disc_params,
    real: jax.Array,
    real_lengths: jax.Array,
    fake: jax.Array,
    fake_lengths: jax.Array,
    lambda_gp: float,
    rng: jax.Array,
):
    """Critic loss: E[D(fake)] - E[D(real)] + lambda * GP.

    Returns (loss, metrics dict). real/fake may have different T; the
    gradient penalty interpolates on a common time length (the shorter
    is right-padded with zeros — both are masked by length in D).
    """
    score_real = disc_apply(disc_params, real, real_lengths)
    score_fake = disc_apply(disc_params, fake, fake_lengths)
    T = max(real.shape[1], fake.shape[1])
    pad_r = jnp.pad(real, ((0, 0), (0, T - real.shape[1]), (0, 0)))
    pad_f = jnp.pad(fake, ((0, 0), (0, T - fake.shape[1]), (0, 0)))
    gp_len = jnp.minimum(real_lengths, fake_lengths)
    gp = gradient_penalty(disc_apply, disc_params, pad_r, pad_f, gp_len, rng)
    wdist = jnp.mean(score_real) - jnp.mean(score_fake)
    loss = -wdist + lambda_gp * gp
    return loss, {"d_loss": loss, "wasserstein": wdist, "gp": gp}


def g_loss_fn(score_fake: jax.Array) -> jax.Array:
    """Generator loss: -E[D(G(x))]."""
    return -jnp.mean(score_fake)


def bce_d_loss_fn(
    disc_apply: Callable,
    disc_params,
    real: jax.Array,
    real_lengths: jax.Array,
    fake: jax.Array,
    fake_lengths: jax.Array,
    lambda_gp: float,
    rng: jax.Array,
):
    """Non-saturating GAN critic loss (wav2vec-U's objective):
    softplus(-D(real)) + softplus(D(fake)) + lambda * GP. Bounded, so the
    critic cannot run away the way an under-penalized Wasserstein
    estimate does; the same interpolate gradient penalty regularizes it.
    """
    score_real = disc_apply(disc_params, real, real_lengths)
    score_fake = disc_apply(disc_params, fake, fake_lengths)
    T = max(real.shape[1], fake.shape[1])
    pad_r = jnp.pad(real, ((0, 0), (0, T - real.shape[1]), (0, 0)))
    pad_f = jnp.pad(fake, ((0, 0), (0, T - fake.shape[1]), (0, 0)))
    gp_len = jnp.minimum(real_lengths, fake_lengths)
    gp = gradient_penalty(disc_apply, disc_params, pad_r, pad_f, gp_len, rng)
    loss = (
        jnp.mean(jax.nn.softplus(-score_real))
        + jnp.mean(jax.nn.softplus(score_fake))
        + lambda_gp * gp
    )
    # report the same separation diagnostic as the WGAN path
    wdist = jnp.mean(score_real) - jnp.mean(score_fake)
    return loss, {"d_loss": loss, "wasserstein": wdist, "gp": gp}


def bce_g_loss_fn(score_fake: jax.Array) -> jax.Array:
    """Non-saturating generator loss: softplus(-D(G(x)))."""
    return jnp.mean(jax.nn.softplus(-score_fake))
