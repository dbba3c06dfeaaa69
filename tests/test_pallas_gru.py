"""Pallas GRU scan kernel vs the lax.scan reference: values AND custom-VJP
gradients (interpreter mode; the compiled kernel is exercised on TPU by
bench.py with model.use_pallas_gru)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.models.pallas_gru import pallas_gru_scan


def _reference_scan(xproj, wh, bh, tmask):
    """Same math as uasr.models.layers.BiGRU's scan body."""
    def step(h, inp):
        xp, m = inp
        hproj = jnp.einsum("gbh,gho->gbo", h, wh) + bh[:, None, :]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hproj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(m[:, :, None], h_new, h)
        return h_new, h_new

    G, B = xproj.shape[1], xproj.shape[2]
    H = wh.shape[1]
    h0 = jnp.zeros((G, B, H), xproj.dtype)
    _, ys = jax.lax.scan(step, h0, (xproj, tmask))
    return ys


def _problem(T=12, G=2, B=4, H=8, seed=0):
    rng = np.random.RandomState(seed)
    xproj = jnp.asarray(rng.randn(T, G, B, 3 * H) * 0.5, jnp.float32)
    wh = jnp.asarray(rng.randn(G, H, 3 * H) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.randn(G, 3 * H) * 0.1, jnp.float32)
    # per-group validity windows (the BiGRU's reversed stream masks a
    # padding PREFIX, the forward stream a suffix — exercise both)
    lengths = np.array([T, T - 3, 5, 1][:B])
    fwd = np.arange(T)[:, None] < lengths[None, :]
    bwd = np.arange(T)[:, None] >= (T - lengths)[None, :]
    tmask = jnp.asarray(
        np.stack([fwd, bwd], axis=1)[:, :G], jnp.bool_
    )
    return xproj, wh, bh, tmask


def test_forward_matches_reference():
    xproj, wh, bh, tmask = _problem()
    ref = _reference_scan(xproj, wh, bh, tmask)
    got = pallas_gru_scan(xproj, wh, bh, tmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["linear", "fused"])
def test_gradients_match_reference(impl, monkeypatch):
    import uasr.models.pallas_gru as mod

    monkeypatch.setattr(mod, "BWD_IMPL", impl)
    xproj, wh, bh, tmask = _problem(seed=1)
    rng = np.random.RandomState(2)
    w_out = jnp.asarray(rng.randn(*_reference_scan(xproj, wh, bh, tmask).shape),
                        jnp.float32)

    def loss_ref(xp, w, b):
        return jnp.sum(_reference_scan(xp, w, b, tmask) * w_out)

    def loss_pal(xp, w, b):
        return jnp.sum(pallas_gru_scan(xp, w, b, tmask, True) * w_out)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(xproj, wh, bh)
    v_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1, 2))(xproj, wh, bh)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for a, b, name in zip(g_pal, g_ref, ["dxproj", "dwh", "dbh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


@pytest.mark.parametrize("kt", [2, 4])
def test_fwd_time_tiling_matches_reference(kt, monkeypatch):
    """Forward KT>1 tiling (in-tile loop + padded tail steps) at a T not
    divisible by the tile."""
    import uasr.models.pallas_gru as mod

    monkeypatch.setattr(mod, "FWD_TIME_TILE", kt)
    xproj, wh, bh, tmask = _problem(T=13, seed=5)
    ref = _reference_scan(xproj, wh, bh, tmask)
    got = pallas_gru_scan(xproj, wh, bh, tmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["linear", "fused"])
@pytest.mark.parametrize("kt", [2, 4])
def test_bwd_time_tiling_matches_reference(kt, impl, monkeypatch):
    """The KT>1 backward tiling (padding, reversed in-tile loop, shifted
    hprev blocks) stays correct even while the shipped default is KT=1 —
    T=13 is deliberately non-divisible by both tile sizes (ADVICE r2).
    Parametrized over both backward implementations."""
    import uasr.models.pallas_gru as mod

    monkeypatch.setattr(mod, "BWD_TIME_TILE", kt)
    monkeypatch.setattr(mod, "BWD_IMPL", impl)
    xproj, wh, bh, tmask = _problem(T=13, seed=3)
    rng = np.random.RandomState(4)
    w_out = jnp.asarray(
        rng.randn(*_reference_scan(xproj, wh, bh, tmask).shape), jnp.float32
    )

    def loss_ref(xp, w, b):
        return jnp.sum(_reference_scan(xp, w, b, tmask) * w_out)

    def loss_pal(xp, w, b):
        return jnp.sum(pallas_gru_scan(xp, w, b, tmask, True) * w_out)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xproj, wh, bh)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(xproj, wh, bh)
    for a, b, name in zip(g_pal, g_ref, ["dxproj", "dwh", "dbh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_single_group_matches_reference():
    """G=1 (the SSL context network's unidirectional GRULayer path)."""
    xproj, wh, bh, tmask = _problem(G=1, seed=7)
    ref = _reference_scan(xproj, wh, bh, tmask)
    got = pallas_gru_scan(xproj, wh, bh, tmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g_ref = jax.grad(lambda xp: jnp.sum(_reference_scan(xp, wh, bh, tmask)))(xproj)
    g_pal = jax.grad(lambda xp: jnp.sum(pallas_gru_scan(xp, wh, bh, tmask, True)))(xproj)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-3)


def test_t_equals_one():
    xproj, wh, bh, tmask = _problem(T=1, B=2)
    ref = _reference_scan(xproj, wh, bh, tmask)
    got = pallas_gru_scan(xproj, wh, bh, tmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g = jax.grad(lambda xp: jnp.sum(pallas_gru_scan(xp, wh, bh, tmask, True)))(
        xproj
    )
    assert np.all(np.isfinite(np.asarray(g)))


def _two_stream_problem(T=12, B=4, H=8, seed=11):
    rng = np.random.RandomState(seed)
    p0 = jnp.asarray(rng.randn(T, B, 3 * H) * 0.5, jnp.float32)
    p1 = jnp.asarray(rng.randn(T, B, 3 * H) * 0.5, jnp.float32)
    wh = jnp.asarray(rng.randn(2, H, 3 * H) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.randn(2, 3 * H) * 0.1, jnp.float32)
    lengths = np.array([T, T - 3, 5, 1][:B])
    fwd = np.arange(T)[:, None] < lengths[None, :]
    bwd = np.arange(T)[:, None] >= (T - lengths)[None, :]
    tmask = jnp.asarray(np.stack([fwd, bwd], axis=1), jnp.bool_)
    return p0, p1, wh, bh, tmask


def _two_stream_reference(p0, p1, wh, bh, tmask):
    """Equivalent grouped-scan computation: the reversed stream's step u
    consumes p1 frame T-1-u, and its output is returned frame-ordered."""
    xproj = jnp.stack([p0, jnp.flip(p1, axis=0)], axis=1)  # [T, 2, B, 3H]
    ys = _reference_scan(xproj, wh, bh, tmask)
    return jnp.concatenate([ys[:, 0], jnp.flip(ys[:, 1], axis=0)], axis=-1)


@pytest.mark.parametrize("T,fkt,bkt", [(12, 1, 1), (13, 2, 4), (13, 4, 2)])
def test_two_stream_bigru_matches_reference(T, fkt, bkt, monkeypatch):
    """pallas_bigru_scan (flipped-index-map two-stream kernel): values
    and custom-VJP grads vs the grouped scan reference, incl. time
    tiling at a non-divisible T (front/end padding asymmetry)."""
    import uasr.models.pallas_gru as mod

    from uasr.models.pallas_gru import pallas_bigru_scan

    monkeypatch.setattr(mod, "FWD_TIME_TILE", fkt)
    monkeypatch.setattr(mod, "BWD_TIME_TILE", bkt)
    p0, p1, wh, bh, tmask = _two_stream_problem(T=T)
    ref = _two_stream_reference(p0, p1, wh, bh, tmask)
    got = pallas_bigru_scan(p0, p1, wh, bh, tmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    rng = np.random.RandomState(12)
    w_out = jnp.asarray(rng.randn(*ref.shape), jnp.float32)

    def loss(fn):
        return lambda a, b, w, bb: jnp.sum(fn(a, b, w, bb) * w_out)

    g_ref = jax.grad(
        loss(lambda a, b, w, bb: _two_stream_reference(a, b, w, bb, tmask)),
        argnums=(0, 1, 2, 3))(p0, p1, wh, bh)
    g_pal = jax.grad(
        loss(lambda a, b, w, bb: pallas_bigru_scan(a, b, w, bb, tmask, True)),
        argnums=(0, 1, 2, 3))(p0, p1, wh, bh)
    for a, b, name in zip(g_pal, g_ref, ["dp0", "dp1", "dwh", "dbh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )
