"""Model family tests: shapes, length handling, padding invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.config import ModelConfig
from uasr.models import (
    CNNEncoder,
    ConvBiGRUEncoder,
    PhoneClassifier,
    PhoneDiscriminator,
    build_model,
)

CFG = ModelConfig(hidden_size=32, num_gru_layers=1, conv_channels=8,
                  classifier_hidden=32, disc_channels=16, disc_layers=2)
V = 12


@pytest.mark.parametrize(
    "name",
    ["conv_bigru", "lc_bigru", "cnn", "classifier", "transformer",
     "conformer", "uni_gru"],
)
def test_encoder_shapes_and_lengths(name):
    model = build_model(ModelConfig(**{**CFG.__dict__, "encoder": name}), V)
    B, T, D = 2, 37, 40
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, D), jnp.float32)
    lengths = jnp.array([37, 20])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    logits, out_len = model.apply(params, feats, lengths)
    assert logits.shape[0] == B and logits.shape[2] == V
    assert int(out_len[0]) <= logits.shape[1]
    assert int(out_len[1]) <= int(out_len[0])


def test_bigru_padding_invariance():
    """Extending batch padding must not change valid-frame outputs
    (length-aware backward GRU)."""
    model = ConvBiGRUEncoder(CFG, V)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 24, 40), jnp.float32)
    lengths = jnp.array([24])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    logits_a, len_a = model.apply(params, feats, lengths)
    padded = jnp.pad(feats, ((0, 0), (0, 16), (0, 0)))
    logits_b, len_b = model.apply(params, padded, lengths)
    assert int(len_a[0]) == int(len_b[0])
    np.testing.assert_allclose(
        np.asarray(logits_a[0, : int(len_a[0])]),
        np.asarray(logits_b[0, : int(len_a[0])]),
        atol=2e-5,
    )


def test_cnn_padding_invariance():
    model = CNNEncoder(CFG, V)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(1, 24, 40), jnp.float32)
    lengths = jnp.array([24])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, la = model.apply(params, feats, lengths)
    b, lb = model.apply(params, jnp.pad(feats, ((0, 0), (0, 16), (0, 0))), lengths)
    assert int(la[0]) == int(lb[0])
    np.testing.assert_allclose(
        np.asarray(a[0, : int(la[0])]), np.asarray(b[0, : int(la[0])]), atol=2e-5
    )


def test_classifier_padding_invariance():
    model = PhoneClassifier(CFG, V)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 20, 40), jnp.float32)
    lengths = jnp.array([20])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, _ = model.apply(params, feats, lengths)
    b, _ = model.apply(
        params, jnp.pad(feats, ((0, 0), (0, 13), (0, 0))), lengths
    )
    np.testing.assert_allclose(
        np.asarray(a[0]), np.asarray(b[0, :20]), atol=2e-5
    )


def test_discriminator_scalar_and_padding_invariance():
    model = PhoneDiscriminator(CFG)
    rng = np.random.RandomState(3)
    probs = jax.nn.softmax(jnp.asarray(rng.randn(2, 16, V), jnp.float32))
    lengths = jnp.array([16, 16])
    params = model.init(jax.random.PRNGKey(0), probs, lengths)
    score = model.apply(params, probs, lengths)
    assert score.shape == (2,)
    padded = jnp.pad(probs, ((0, 0), (0, 16), (0, 0)))
    score_b = model.apply(params, padded, lengths)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_b), atol=2e-5)


def test_gradients_flow():
    model = ConvBiGRUEncoder(CFG, V)
    feats = jnp.ones((1, 16, 40))
    lengths = jnp.array([16])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)

    def loss(p):
        logits, _ = model.apply(p, feats, lengths)
        return jnp.sum(logits**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_bigru_remat_grad_parity():
    """jax.checkpoint on the scan body must not change values or grads."""
    from uasr.models.layers import BiGRU

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 10, 8), jnp.float32)
    lengths = jnp.array([10, 6])
    m_plain = BiGRU(12, remat=False)
    m_remat = BiGRU(12, remat=True)
    params = m_plain.init(jax.random.PRNGKey(0), x, lengths)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x, lengths) ** 2)

    v1, g1 = jax.value_and_grad(loss(m_plain))(params)
    v2, g2 = jax.value_and_grad(loss(m_remat))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_padding_invariance():
    from uasr.models.models import TransformerEncoder

    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "transformer",
                         "transformer_layers": 2, "num_heads": 4})
    model = TransformerEncoder(cfg, V)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 24, 40), jnp.float32)
    lengths = jnp.array([24, 13])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, la = model.apply(params, feats, lengths)
    b, lb = model.apply(
        params, jnp.pad(feats, ((0, 0), (0, 16), (0, 0))), lengths
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for i in range(2):
        n = int(la[i])
        np.testing.assert_allclose(
            np.asarray(a[i, :n]), np.asarray(b[i, :n]), atol=3e-5
        )


@pytest.mark.parametrize("name", ["conv_bigru", "transformer"])
def test_patch_front_shapes_and_padding_invariance(name):
    """The MXU-aligned patch front (conv_front: patch) subsamples to the
    same grid as the conv2d path and is batch-padding invariant (inputs
    are zero-masked before patching; patch embeds re-masked after)."""
    cfg = ModelConfig(**{**CFG.__dict__, "encoder": name,
                         "conv_front": "patch",
                         "transformer_layers": 2, "num_heads": 4})
    model = build_model(cfg, V)
    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(2, 37, 40), jnp.float32)
    lengths = jnp.array([37, 21])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, la = model.apply(params, feats, lengths)
    assert a.shape[0] == 2 and a.shape[2] == V
    # same subsampled grid as the conv2d front: ceil(T / stride**layers)
    assert int(la[0]) == -(-37 // 4) and int(la[1]) == -(-21 // 4)
    b, lb = model.apply(
        params, jnp.pad(feats, ((0, 0), (0, 19), (0, 0))), lengths
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for i in range(2):
        n = int(la[i])
        np.testing.assert_allclose(
            np.asarray(a[i, :n]), np.asarray(b[i, :n]), atol=3e-5
        )


def test_conformer_padding_invariance():
    """Conformer blocks (MHSA with rel-pos bias, masked depthwise conv,
    macaron FFNs) are batch-padding invariant. Padding is a multiple of
    the front's total stride: SAME-conv padding asymmetry shifts the
    subsampling grid otherwise (a property of strided SAME convs, shared
    with the conv2d front everywhere)."""
    from uasr.models.models import ConformerEncoder

    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "conformer",
                         "transformer_layers": 2, "num_heads": 4,
                         "conformer_kernel": 7, "conformer_rel_clip": 8})
    model = ConformerEncoder(cfg, V)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 36, 40), jnp.float32)
    lengths = jnp.array([36, 13])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, la = model.apply(params, feats, lengths)
    b, lb = model.apply(
        params, jnp.pad(feats, ((0, 0), (0, 16), (0, 0))), lengths
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for i in range(2):
        n = int(la[i])
        np.testing.assert_allclose(
            np.asarray(a[i, :n]), np.asarray(b[i, :n]), atol=3e-5
        )


def test_conformer_rel_bias_shifts_attention():
    """The learned relative-position bias is live: writing a large value
    into one relative offset changes the output (guards against the
    bias being built but dropped by the attention_fn plumbing)."""
    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "conformer",
                         "transformer_layers": 1, "num_heads": 2,
                         "conformer_kernel": 3, "conformer_rel_clip": 4})
    model = build_model(cfg, V)
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(1, 24, 40), jnp.float32)
    lengths = jnp.array([24])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, _ = model.apply(params, feats, lengths)
    # bump ONE relative offset only — a constant over the whole table
    # is invisible to softmax (shift invariance)
    bumped = jax.tree_util.tree_map_with_path(
        lambda path, x: x.at[:, 0].add(8.0) if "rel_bias" in str(path)
        else x, params
    )
    b, _ = model.apply(bumped, feats, lengths)
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_uni_gru_padding_invariance():
    """Causal encoder: extending batch padding must not change
    valid-frame outputs (inputs zero-masked, causal ops, GRU freezes)."""
    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "uni_gru",
                         "num_gru_layers": 2})
    model = build_model(cfg, V)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(2, 36, 40), jnp.float32)
    lengths = jnp.array([36, 17])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    a, la = model.apply(params, feats, lengths)
    b, lb = model.apply(
        params, jnp.pad(feats, ((0, 0), (0, 16), (0, 0))), lengths
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for i in range(2):
        n = int(la[i])
        np.testing.assert_allclose(
            np.asarray(a[i, :n]), np.asarray(b[i, :n]), atol=3e-5
        )


def test_uni_gru_chunked_step_matches_offline_call():
    """The streaming seam itself: feeding chunks through
    UniGRUEncoder.step with the carried state reproduces the offline
    __call__ logits exactly (zero carry IS the causal left pad; the
    GRU scan carries its own state) — including a stream whose
    utterance ends mid-chunk."""
    from uasr.models.models import uni_gru_initial_carry

    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "uni_gru",
                         "num_gru_layers": 2})
    model = build_model(cfg, V)
    P = cfg.conv_time_stride ** cfg.num_conv_layers
    B, T, D = 3, 48, 40
    C = 16  # chunk frames (multiple of P=4)
    rng = np.random.RandomState(9)
    feats = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    lengths = jnp.array([48, 23, 7])  # ends mid-chunk and chunk-aligned
    params = model.init(jax.random.PRNGKey(1), feats, lengths)
    off, off_len = jax.jit(model.apply)(params, feats, lengths)

    step = jax.jit(
        lambda f, fv, c: model.apply(params, f, fv, c, method="step")
    )
    carry = uni_gru_initial_carry(cfg, B)
    got = []
    for s in range(0, T, C):
        fv = jnp.clip(lengths - s, 0, C)
        logits, carry = step(feats[:, s : s + C], fv, carry)
        got.append(np.asarray(logits))
    got = np.concatenate(got, axis=1)
    for b in range(B):
        n = int(off_len[b])
        np.testing.assert_allclose(
            got[b, :n], np.asarray(off[b, :n]), atol=1e-5,
            err_msg=f"stream {b}",
        )


def test_lc_bigru_padding_invariance_and_bounded_context():
    """lc_bigru (round 5): padding-invariant like the BiGRU, and its
    RIGHT context is truly bounded — perturbing the input beyond
    lc_chunk + lc_lookahead logits frames ahead must not change a
    position's output (the property that makes streaming exact)."""
    cfg = ModelConfig(**{**CFG.__dict__, "encoder": "lc_bigru",
                         "num_gru_layers": 2, "lc_chunk": 4,
                         "lc_lookahead": 2})
    model = build_model(cfg, V)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 96, 40), jnp.float32)
    lengths = jnp.array([96])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)
    logits_a, len_a = model.apply(params, feats, lengths)
    padded = jnp.pad(feats, ((0, 0), (0, 32), (0, 0)))
    logits_b, len_b = model.apply(params, padded, lengths)
    assert int(len_a[0]) == int(len_b[0])
    np.testing.assert_allclose(
        np.asarray(logits_a[0, : int(len_a[0])]),
        np.asarray(logits_b[0, : int(len_a[0])]),
        atol=2e-5,
    )
    # bounded lookahead: each layer's backward window reaches one
    # chunk + lookahead ahead at its own input, so with L layers the
    # total right context is L*Nc + Nr patches. Perturb the LAST
    # patch; chunks whose compounded window cannot reach it are
    # bit-unchanged.
    stride = cfg.conv_time_stride ** cfg.num_conv_layers  # 4 frames/patch
    pert = np.asarray(feats).copy()
    pert[:, -stride:] += 10.0  # last patch
    logits_c, _ = model.apply(params, jnp.asarray(pert), lengths)
    n_patches = 96 // stride  # 24
    L_layers = cfg.num_gru_layers
    # chunk c safe iff (c + L)*Nc + Nr - 1 < n_patches - 1
    last_safe_chunk = (n_patches - 1 - cfg.lc_lookahead) \
        // cfg.lc_chunk - L_layers
    safe_upto = (last_safe_chunk + 1) * cfg.lc_chunk
    assert safe_upto >= 8
    np.testing.assert_allclose(
        np.asarray(logits_a[0, :safe_upto]),
        np.asarray(logits_c[0, :safe_upto]),
        atol=2e-5,
    )
    # and the perturbation DOES reach the final region (sanity)
    assert np.abs(
        np.asarray(logits_a[0, -1]) - np.asarray(logits_c[0, -1])
    ).max() > 1e-3
