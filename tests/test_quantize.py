"""Weight-only int8 PTQ (uasr/ops/quantize.py, uasr-export --quantize).

Contract: kernels quantize per-output-channel with bounded rounding
error; biases/LN stay fp; a trained model's greedy transcripts are
essentially unchanged; the exported quantized artifact equals its own
live forward bit-for-bit and its params are ~4x smaller."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uasr.ops.quantize import (
    dequantize_tree, quantize_leaf, quantize_tree, quantized_bytes,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quantize_leaf_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 96) * np.exp(rng.randn(96)), jnp.float32)
    q = quantize_leaf(w)
    assert q["qint8"].dtype == jnp.int8
    deq = np.asarray(q["qint8"], np.float32) * np.asarray(q["qscale"])
    # symmetric rounding: error <= scale/2 per channel
    bound = np.asarray(q["qscale"])[0] / 2 + 1e-7
    assert (np.abs(deq - np.asarray(w)) <= bound[None, :]).all()


def test_quantize_tree_structure_and_accounting():
    rng = np.random.RandomState(1)
    params = {
        "params": {
            "dense": {"kernel": jnp.asarray(rng.randn(128, 64),
                                            jnp.float32),
                      "bias": jnp.zeros((64,), jnp.float32)},
            "ln": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            "tiny": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        }
    }
    qt, n = quantize_tree(params, min_size=1024)
    assert n == 1  # only the big kernel
    assert set(qt["params"]["dense"]["kernel"].keys()) == {"qint8",
                                                           "qscale"}
    # untouched leaves are the same objects
    assert qt["params"]["ln"]["scale"] is params["params"]["ln"]["scale"]
    assert qt["params"]["tiny"]["kernel"].shape == (4, 4)
    deq = dequantize_tree(qt)
    assert deq["params"]["dense"]["kernel"].shape == (128, 64)
    np.testing.assert_allclose(
        np.asarray(deq["params"]["dense"]["kernel"]),
        np.asarray(params["params"]["dense"]["kernel"]), atol=0.02,
    )
    qb, fb = quantized_bytes(qt)
    assert qb < fb  # int8 kernels shrink the artifact


def test_trained_model_transcripts_survive_quantization():
    """End-to-end on a briefly-trained CNN CTC model: dequantized
    forward stays close; greedy transcripts match on nearly every
    utterance."""
    from test_serve import _cfg, _train_briefly
    from uasr.frontend.features import compute_features
    from uasr.ops.decode import ctc_greedy_decode

    cfg, trainer, params, examples = _train_briefly(_cfg("cnn", 32),
                                                    steps=60)
    B = 8
    L = max(len(a) for a, _ in examples[:B])
    audio = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int64)
    for b, (a, _) in enumerate(examples[:B]):
        audio[b, : len(a)] = a
        lens[b] = len(a)

    @jax.jit
    def decode(p, audio, lengths):
        feats, flen = compute_features(
            audio, lengths, trainer.frontend_state, trainer.cfg.frontend
        )
        logits, out_len = trainer.model.apply(p, feats, flen)
        return ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)

    qparams, n = quantize_tree(params, min_size=512)
    assert n >= 2
    ids_fp, n_fp = decode(params, audio, lens)
    ids_q, n_q = decode(dequantize_tree(qparams), audio, lens)
    agree = 0
    for b in range(B):
        a = list(np.asarray(ids_fp[b, : int(n_fp[b])]))
        q = list(np.asarray(ids_q[b, : int(n_q[b])]))
        agree += a == q
    assert agree >= B - 1  # at most one utterance may flip a near-tie


def test_bigru_recurrent_weights_survive_quantization():
    """The GRU wx/wh custom params quantize too (layers.py); the
    recurrence does not amplify per-channel int8 error into transcript
    changes on a trained conv_bigru."""
    from test_serve import _bigru_cfg, _train_briefly
    from uasr.frontend.features import compute_features
    from uasr.ops.decode import ctc_greedy_decode

    cfg, trainer, params, examples = _train_briefly(_bigru_cfg(32),
                                                    seed=5, steps=60)
    B = 8
    L = max(len(a) for a, _ in examples[:B])
    audio = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int64)
    for b, (a, _) in enumerate(examples[:B]):
        audio[b, : len(a)] = a
        lens[b] = len(a)

    @jax.jit
    def decode(p, audio, lengths):
        feats, flen = compute_features(
            audio, lengths, trainer.frontend_state, trainer.cfg.frontend
        )
        logits, out_len = trainer.model.apply(p, feats, flen)
        return ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)

    qparams, n = quantize_tree(params, min_size=512)
    leaves = jax.tree_util.tree_leaves_with_path(qparams)
    assert any("wx" in jax.tree_util.keystr(k) and "qint8" in
               jax.tree_util.keystr(k) for k, _ in leaves)
    assert any("wh" in jax.tree_util.keystr(k) and "qint8" in
               jax.tree_util.keystr(k) for k, _ in leaves)
    ids_fp, n_fp = decode(params, audio, lens)
    ids_q, n_q = decode(dequantize_tree(qparams), audio, lens)
    agree = sum(
        list(np.asarray(ids_fp[b, : int(n_fp[b])]))
        == list(np.asarray(ids_q[b, : int(n_q[b])]))
        for b in range(B)
    )
    assert agree >= B - 1


@pytest.mark.slow
def test_export_quantized_artifact(tmp_path):
    """uasr-export --quantize int8: artifact self-consistent (--check),
    meta records the scheme, params shrink vs the fp export."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["UASR_FORCE_CPU"] = "1"

    def run(mod, args):
        return subprocess.run(
            [sys.executable, "-m", mod, *args], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=560,
        )

    md = str(tmp_path / "exp")
    r = run("uasr.cli", ["-c", "configs/synthetic_smoke.yaml",
                         "--mode", "train",
                         "--set", f"model_dir={md}",
                         "--set", "train.total_steps=5",
                         "--set", "train.save_every=5"])
    assert r.returncode == 0, r.stderr[-2000:]

    out_q = str(tmp_path / "serve_q")
    r = run("uasr.tools.export",
            ["-c", "configs/synthetic_smoke.yaml", "--out", out_q,
             "--batch", "4", "--seconds", "2", "--platforms", "cpu",
             "--check", "--quantize", "int8",
             "--set", f"model_dir={md}"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "check ok" in r.stderr
    assert "quantized" in r.stderr
    meta = json.load(open(os.path.join(out_q, "meta.json")))
    qm = meta["quantization"]
    assert qm["scheme"] == "int8_weight_per_channel_symmetric"
    assert qm["quantized_kernels"] >= 2
    assert qm["params_bytes"] < 0.5 * qm["float_equivalent_bytes"]


@pytest.mark.slow
def test_export_streaming_quantized_artifact(tmp_path):
    """--streaming --quantize int8: the online chunk-step artifact
    carries int8 params and --check passes against the (dequantized)
    live recognizer chunk-for-chunk."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["UASR_FORCE_CPU"] = "1"

    def run(mod, args):
        return subprocess.run(
            [sys.executable, "-m", mod, *args], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=560,
        )

    md = str(tmp_path / "exp")
    common = ["-c", "configs/synthetic_smoke.yaml",
              "--set", f"model_dir={md}",
              "--set", "frontend.cmvn=streaming",
              "--set", "frontend.streaming_chunk_frames=32"]
    r = run("uasr.cli", common + ["--mode", "train",
                                  "--set", "train.total_steps=30",
                                  "--set", "train.save_every=30",
                                  "--set", "train.log_every=30"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(tmp_path / "serve_sq")
    r = run("uasr.tools.export",
            common + ["--out", out, "--streaming", "--chunk-frames",
                      "32", "--batch", "2", "--platforms", "cpu",
                      "--check", "--quantize", "int8"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "check ok" in r.stderr
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["quantization"]["quantized_kernels"] >= 2


def test_int8_compute_transcripts_and_dot_parity():
    """int8-compute (round 5, VERDICT round-4 next #5): the
    int8-MXU Dense/Conv path — dynamic per-token activations x
    per-channel weights, int32 accumulation — preserves a trained
    model's greedy transcripts, and re-quantizing a dequantized kernel
    round-trips losslessly (artifact weights == compute weights)."""
    import dataclasses

    from test_serve import _cfg, _train_briefly
    from uasr.frontend.features import compute_features
    from uasr.models import build_model
    from uasr.ops.decode import ctc_greedy_decode
    from uasr.ops.quantize import int8_dot_general, quantize_leaf

    # lossless re-quantization round trip
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 48) * np.exp(rng.randn(48)), jnp.float32)
    q = quantize_leaf(w)
    deq = np.asarray(q["qint8"], np.float32) * np.asarray(q["qscale"])
    sw = np.maximum(np.abs(deq).max(0), 1e-12) / 127.0
    requant = np.clip(np.round(deq / sw), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(requant, np.asarray(q["qint8"]))

    # int8_dot_general vs fp reference on well-scaled data
    x = jnp.asarray(rng.randn(5, 64), jnp.float32)
    y8 = int8_dot_general(x, w, (((1,), (0,)), ((), ())))
    yf = x @ w
    rel = np.abs(np.asarray(y8) - np.asarray(yf)).max() / np.abs(
        np.asarray(yf)).max()
    assert rel < 0.02, rel

    # trained-model transcript preservation (cnn family)
    cfg, trainer, params, examples = _train_briefly(_cfg("cnn", 32),
                                                    steps=60)
    m8 = build_model(
        dataclasses.replace(cfg.model, int8_compute=True), cfg.dim_output
    )
    B = 8
    L = max(len(a) for a, _ in examples[:B])
    audio = np.zeros((B, L), np.float32)
    lens = np.zeros((B,), np.int64)
    for b, (a, _) in enumerate(examples[:B]):
        audio[b, : len(a)] = a
        lens[b] = len(a)

    @jax.jit
    def decode(model_apply, p, audio, lengths):
        feats, flen = compute_features(
            audio, lengths, trainer.frontend_state, trainer.cfg.frontend
        )
        logits, out_len = model_apply(p, feats, flen)
        return ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)

    import functools

    ids_fp, n_fp = jax.jit(functools.partial(
        decode.__wrapped__, trainer.model.apply))(params, audio, lens)
    ids_8, n_8 = jax.jit(functools.partial(
        decode.__wrapped__, m8.apply))(params, audio, lens)
    agree = 0
    for b in range(B):
        a = list(np.asarray(ids_fp[b, : int(n_fp[b])]))
        q = list(np.asarray(ids_8[b, : int(n_8[b])]))
        agree += a == q
    assert agree >= B - 1, (agree, B)
