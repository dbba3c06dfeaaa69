"""Fused Pallas MHSA (uasr/ops/pallas_attention.py), interpret mode.

Contract: fused_dot_product_attention == flax.linen.dot_product_attention
(values AND grads, incl. the conformer's shared rel-pos bias gradient)
for key-only padding masks at any T/dh, with the padded region of the
output ignored (the encoders multiply it away via _length_mask)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from uasr.ops.pallas_attention import fused_dot_product_attention


def _data(B=4, T=37, H=3, dh=16, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, T, H, dh), dtype)  # noqa: E731
    q, k, v = mk(), mk(), mk()
    lengths = rng.randint(1, T + 1, size=B)
    lengths[0] = T  # keep one full row
    mask = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    )
    valid = jnp.asarray(
        np.arange(T)[None, :, None, None] < lengths[:, None, None, None]
    )
    bias = jnp.asarray(rng.randn(1, H, T, T) * 0.3, dtype)
    return q, k, v, mask, valid, bias


@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("T", [16, 37, 128])
def test_fused_attention_matches_flax_values_and_grads(with_bias, T):
    q, k, v, mask, valid, bias = _data(T=T)
    b = bias if with_bias else None

    def loss(fn, args):
        kw = {"mask": mask}
        if with_bias:
            kw["bias"] = args[3]
        o = fn(args[0], args[1], args[2], **kw)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2), o

    args = (q, k, v, b) if with_bias else (q, k, v)
    fused = lambda *a, **kw: fused_dot_product_attention(  # noqa: E731
        *a, interpret=True, **kw
    )
    (lr, o_ref), gr = jax.value_and_grad(
        lambda a: loss(nn.dot_product_attention, a), has_aux=True
    )(args)
    (lf, o_f), gf = jax.value_and_grad(
        lambda a: loss(fused, a), has_aux=True
    )(args)
    np.testing.assert_allclose(
        np.where(valid, np.asarray(o_ref - o_f), 0.0), 0.0, atol=5e-6
    )
    for name, a, bb in zip("qkvb", gr, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_attention_bf16_close_to_f32_reference():
    """bf16 inputs: the kernel's f32 softmax should stay within bf16
    resolution of the all-f32 reference."""
    q, k, v, mask, valid, bias = _data(T=48)
    o_ref = nn.dot_product_attention(q, k, v, bias=bias, mask=mask)
    o_f = fused_dot_product_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), bias=bias.astype(jnp.bfloat16),
        mask=mask, interpret=True,
    )
    assert o_f.dtype == jnp.bfloat16
    diff = np.abs(np.where(valid, np.asarray(o_ref - o_f.astype(jnp.float32)), 0.0))
    assert diff.max() < 0.05


def test_fused_attention_dropout_falls_back():
    """Active attention dropout routes to flax (stochastic path the
    kernel doesn't implement) and still runs."""
    q, k, v, mask, _, _ = _data()
    out = fused_dot_product_attention(
        q, k, v, mask=mask, dropout_rng=jax.random.PRNGKey(0),
        dropout_rate=0.5, deterministic=False, interpret=True,
    )
    assert out.shape == q.shape


@pytest.mark.parametrize("encoder", ["transformer", "conformer"])
def test_encoder_with_fused_attention_matches_flax_path(encoder, monkeypatch):
    """Model-level: attn_pallas=True (kernel in interpret mode) ==
    attn_pallas=False for logits and parameter grads."""
    from uasr.config import ModelConfig
    from uasr.models.models import build_model

    monkeypatch.setenv("UASR_PALLAS_ATTN", "interpret")
    rng = np.random.RandomState(1)
    B, T, D, V = 4, 50, 40, 7
    feats = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.asarray([50, 33, 20, 44], jnp.int32)

    def run(attn_pallas):
        cfg = ModelConfig(
            encoder=encoder, hidden_size=48, num_heads=4,
            transformer_layers=2, ffn_dim=64,
            attn_pallas=attn_pallas,
        )
        model = build_model(cfg, V)
        params = model.init(jax.random.PRNGKey(0), feats, lengths)

        def loss(p):
            logits, out_len = model.apply(p, feats, lengths)
            return jnp.sum(logits ** 2) / B, logits

        (l, logits), g = jax.value_and_grad(loss, has_aux=True)(params)
        return logits, g

    logits_ref, g_ref = run(False)
    logits_f, g_f = run(True)
    np.testing.assert_allclose(
        np.asarray(logits_ref), np.asarray(logits_f), atol=2e-4
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(ka)}",
        )


def test_cpu_without_env_uses_flax_fallback(monkeypatch):
    """On CPU with no UASR_PALLAS_ATTN, the wrapper must not build a
    Pallas call (dryrun_multichip safety): results equal flax exactly."""
    monkeypatch.delenv("UASR_PALLAS_ATTN", raising=False)
    q, k, v, mask, _, _ = _data()
    o_ref = nn.dot_product_attention(q, k, v, mask=mask)
    o_f = fused_dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_f))
