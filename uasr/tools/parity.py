"""Parity harness (SURVEY.md §4): an independent numpy re-implementation
of the model forward pass, diffed against the Flax/XLA forward on the
same weights.

Since the reference tree cannot be executed for comparison (SURVEY.md
provenance banner), this numpy path is the executable spec: it
re-derives conv / LayerNorm / GRU / dense from the published formulas
(cuDNN reset-after GRU, SAME-padded convolution) with no JAX, so any
agreement bug in the TPU path shows up as a diff here rather than
silently as quality loss.

Usage:
    from uasr.tools.parity import diff_classifier, diff_bigru
    report = diff_classifier(cfg.model, vocab_size, seed=0)
    assert report["max_abs_err"] < 1e-4
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------- numpy layers


def np_dense(x, kernel, bias):
    return x @ kernel + bias


def np_layernorm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_conv1d_same(x, kernel, bias, stride=1, dilation=1):
    """x [T, Cin], kernel [K, Cin, Cout] — SAME padding, matches
    flax.linen.Conv."""
    T, Cin = x.shape
    K, _, Cout = kernel.shape
    eff = (K - 1) * dilation + 1
    out_t = -(-T // stride)
    pad_total = max((out_t - 1) * stride + eff - T, 0)
    lo = pad_total // 2
    xp = np.pad(x, ((lo, pad_total - lo), (0, 0)))
    out = np.zeros((out_t, Cout))
    for t in range(out_t):
        acc = bias.copy()
        for k in range(K):
            acc = acc + xp[t * stride + k * dilation] @ kernel[k]
        out[t] = acc
    return out


def np_gru(x, wx, wh, bx, bh, h0=None, reverse=False):
    """cuDNN reset-after GRU, matching uasr.models.layers.GRULayer.
    x [T, D]; wx [D, 3H]; wh [H, 3H]."""
    T, D = x.shape
    H = wh.shape[0]
    h = np.zeros(H) if h0 is None else h0
    order = range(T - 1, -1, -1) if reverse else range(T)
    out = np.zeros((T, H))
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for t in order:
        xp = x[t] @ wx + bx
        hp = h @ wh + bh
        xr, xz, xn = np.split(xp, 3)
        hr, hz, hn = np.split(hp, 3)
        r = sig(xr + hr)
        z = sig(xz + hz)
        n = np.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        out[t] = h
    return out


# ------------------------------------------------------ forward diffs


def np_classifier_forward(params, x):
    """PhoneClassifier forward in numpy. x [T, D] (single utterance,
    full length). params: the Flax param dict."""
    p = params["params"]
    h = np_conv1d_same(
        x,
        np.asarray(p["context_conv"]["kernel"]),
        np.asarray(p["context_conv"]["bias"]),
    )
    h = np_layernorm(
        h, np.asarray(p["LayerNorm_0"]["scale"]), np.asarray(p["LayerNorm_0"]["bias"])
    )
    h = np.maximum(h, 0.0)
    i = 0
    while f"fc{i}" in p:
        h = np_dense(h, np.asarray(p[f"fc{i}"]["kernel"]), np.asarray(p[f"fc{i}"]["bias"]))
        h = np_layernorm(
            h,
            np.asarray(p[f"LayerNorm_{i + 1}"]["scale"]),
            np.asarray(p[f"LayerNorm_{i + 1}"]["bias"]),
        )
        h = np.maximum(h, 0.0)
        i += 1
    return np_dense(h, np.asarray(p["logits"]["kernel"]), np.asarray(p["logits"]["bias"]))


def diff_classifier(model_cfg, vocab_size: int, T: int = 24, seed: int = 0) -> dict:
    """Init a PhoneClassifier with a fixed seed; diff Flax vs numpy."""
    import jax
    import jax.numpy as jnp

    from uasr.models import PhoneClassifier

    rng = np.random.RandomState(seed)
    x = rng.randn(1, T, 40).astype(np.float32)
    lengths = jnp.array([T])
    model = PhoneClassifier(model_cfg, vocab_size)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(x), lengths)
    got, _ = model.apply(params, jnp.asarray(x), lengths)
    want = np_classifier_forward(params, x[0].astype(np.float64))
    err = float(np.abs(np.asarray(got[0]) - want).max())
    return {"max_abs_err": err, "shape": tuple(want.shape)}


def diff_bigru(hidden: int = 16, T: int = 12, D: int = 8, seed: int = 0) -> dict:
    """Diff the scan BiGRU against the numpy recurrence."""
    import jax
    import jax.numpy as jnp

    from uasr.models.layers import BiGRU

    rng = np.random.RandomState(seed)
    x = rng.randn(1, T, D).astype(np.float32)
    lengths = jnp.array([T])
    m = BiGRU(hidden)
    params = m.init(jax.random.PRNGKey(seed), jnp.asarray(x), lengths)
    got = np.asarray(m.apply(params, jnp.asarray(x), lengths))[0]
    p = params["params"]  # fused layout: wx/wh/bx/bh are [2, ...] (fwd, bwd)
    outs = []
    for g, rev in [(0, False), (1, True)]:
        outs.append(
            np_gru(
                x[0].astype(np.float64),
                np.asarray(p["wx"][g]), np.asarray(p["wh"][g]),
                np.asarray(p["bx"][g]), np.asarray(p["bh"][g]),
                reverse=rev,
            )
        )
    want = np.concatenate(outs, axis=-1)
    return {"max_abs_err": float(np.abs(got - want).max()), "shape": want.shape}


def main(argv=None):
    import argparse

    from uasr.config import ModelConfig

    p = argparse.ArgumentParser("uasr.tools.parity", description=__doc__)
    p.add_argument("--tol", type=float, default=1e-4)
    args = p.parse_args(argv)
    ok = True
    for name, fn in [
        ("classifier", lambda: diff_classifier(
            ModelConfig(classifier_hidden=64, classifier_layers=2), 16)),
        ("bigru", lambda: diff_bigru()),
    ]:
        rep = fn()
        status = "OK" if rep["max_abs_err"] < args.tol else "FAIL"
        ok &= status == "OK"
        print(f"{name}: max_abs_err={rep['max_abs_err']:.2e} [{status}]")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
