"""Benchmark: end-to-end training throughput in audio-seconds per second
per chip (frontend + encoder + CTC loss + optimizer), the BASELINE.json
headline metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec/sec/chip", "vs_baseline": N}

`vs_baseline` compares against the reference-equivalent pipeline measured
in this container (the reference itself is a TF2 research repo whose tree
was unavailable — SURVEY.md provenance banner; BASELINE.md directs the
build to produce an executable baseline). The baseline path reproduces the
reference's architecture faithfully: host-side numpy feature extraction
(the numpy oracle, exactly the reference's data-prep math) feeding the
same conv+BiGRU CTC train step, run with `python bench.py --baseline`
(on CPU, like-for-like software stack; recorded in BASELINE.md).

Modes:
  python bench.py             # TPU benchmark, prints the JSON line
  python bench.py --baseline  # measure the reference-style path on CPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Reference-equivalent pipeline throughput measured in this container via
# `python bench.py --baseline` (see BASELINE.md "To be filled"): host
# oracle frontend + CPU train step, batch 16 x 8s.
BASELINE_AUDIO_SEC_PER_SEC = None  # set after first --baseline run
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_MEASURED.json")


def _bench_cfg():
    from uasr.config import (
        Config, CTCConfig, FrontendConfig, ModelConfig, TrainConfig,
    )

    return Config(
        name="bench",
        # precision "high" = bf16x3 frontend GEMMs: p99 feature error
        # 5e-4 vs the oracle-parity "highest" path, ~1.5 ms/step faster
        frontend=FrontendConfig(num_mel_bins=80, cmvn="utterance",
                                precision="high"),
        model=ModelConfig(
            encoder="conv_bigru", hidden_size=512, num_gru_layers=2,
            conv_channels=32, num_conv_layers=2, conv_time_stride=2,
            dtype="bfloat16", gru_pallas=True,
        ),
        ctc=CTCConfig(use_pallas=True),
        train=TrainConfig(total_steps=1, lr=1e-3),
        vocab_size=64,
    )


def _make_batch(B, seconds, sr=16000, seed=0):
    from uasr.data.dataset import Batch

    rng = np.random.RandomState(seed)
    L = int(seconds * sr)
    return Batch(
        audio=(rng.randn(B, L) * 0.1).astype(np.float32),
        audio_lengths=np.full((B,), L, np.int32),
        labels=rng.randint(1, 64, size=(B, 64)).astype(np.int32),
        label_lengths=np.full((B,), 48, np.int32),
    )


def _enable_compile_cache():
    """Persistent XLA compile cache: the conv+BiGRU train step takes
    minutes to compile cold on the remote-compile helper; cache it so
    repeated bench runs measure steps, not the compiler."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def run_tpu(B=128, seconds=8.0, warmup=10, iters=40, gru_unroll=None):
    # warmup/iters sized for steady state through the remote tunnel:
    # the first ~10 post-compile steps run ~20% slow while the async
    # dispatch pipeline fills (measured 48.3k at warmup=2/iters=8 vs a
    # stable 58k at these settings, thrice-reproduced)
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    if gru_unroll:
        cfg.model.gru_unroll = gru_unroll
    batch = _make_batch(B, seconds)
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, aux = step_fn(state, db, rng)
    jax.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(iters):
        state, aux = step_fn(state, db, rng)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    n_chips = jax.device_count()
    audio_sec = B * seconds * iters
    return audio_sec / dt / n_chips, float(aux["ctc_loss"])


_BF16_PEAK = {
    # dense bf16 peak FLOP/s per chip (MXU). v5e is 197 TF/s — the
    # oft-quoted 394 is its int8 number.
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def run_mfu(B=128, seconds=8.0):
    """Model-FLOP utilization of the flagship train step: XLA's compiled
    cost analysis (the Pallas kernels contribute their CostEstimates)
    divided by measured step time and the chip's dense bf16 peak."""
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp

    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    batch = _make_batch(B, seconds)
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)
    compiled = (
        jax.jit(trainer.train_step, donate_argnums=(0,))
        .lower(state, db, rng)
        .compile()
    )
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    thr, _ = run_tpu(B=B, seconds=seconds)
    step_s = B * seconds / thr
    kind = jax.devices()[0].device_kind
    peak = _BF16_PEAK.get(kind)
    mfu = flops / step_s / peak if peak else None
    return {
        "flops_per_step": flops,
        "step_ms": step_s * 1000.0,
        "achieved_tflops": flops / step_s / 1e12,
        "device_kind": kind,
        "peak_bf16_tflops": (peak or 0) / 1e12,
        "mfu": mfu,
    }


def run_tpu_chained(B=128, seconds=8.0, iters=40):
    """Train throughput with ALL iters chained inside ONE jitted
    lax.scan launch — no per-step dispatch on the measurement path at
    all. On a directly-attached TPU this should match run_tpu's
    pipelined-dispatch number; through the axon tunnel it isolates the
    chip from any residual per-launch cost."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    batch = _make_batch(B, seconds)
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def steps(s):
        def body(s, _):
            s2, aux = trainer.train_step(s, db, rng)
            return s2, aux["ctc_loss"]

        s, losses = jax.lax.scan(body, s, None, length=iters)
        return s, losses

    state, losses = steps(state)  # compile + warm
    jax.block_until_ready(losses)
    t0 = time.time()
    state, losses = steps(state)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    return B * seconds * iters / dt / jax.device_count(), float(losses[-1])


def run_decode(B=128, seconds=8.0, iters=20, mode="greedy", beam_width=8,
               merge_impl="pairwise"):
    """On-device decode throughput (frontend + encoder + greedy/beam),
    the BASELINE.md '×realtime' rows — chained iterations inside one
    jitted lax.scan so the axon tunnel cannot serve cached dispatches."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.frontend.features import compute_features
    from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    batch = _make_batch(B, seconds)
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    params = state.params
    audio = jnp.asarray(batch.audio)
    lens = jnp.asarray(batch.audio_lengths)

    def body(a, _):
        feats, flen = compute_features(
            a, lens, trainer.frontend_state, cfg.frontend
        )
        logits, out_len = trainer.model.apply(params, feats, flen)
        if mode == "greedy":
            ids, n = ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)
        elif merge_impl == "pallas":
            from uasr.ops.pallas_beam import ctc_beam_search_decode_pallas

            ids, n, _sc = ctc_beam_search_decode_pallas(
                logits, out_len, beam_width, cfg.ctc.blank_id
            )
        else:
            ids, n, _sc = ctc_beam_search_decode(
                logits, out_len, beam_width, cfg.ctc.blank_id,
                merge_impl=merge_impl,
            )
        # data dependency so scan iterations cannot be elided
        return a + 0.0 * n.sum().astype(a.dtype), n.sum()

    @jax.jit
    def loop(a):
        _, ns = jax.lax.scan(body, a, None, length=iters)
        return ns

    ns = loop(audio)
    jax.block_until_ready(ns)  # compile + warm
    t0 = time.time()
    ns = loop(audio)
    jax.block_until_ready(ns)
    dt = (time.time() - t0) / iters
    return {
        "mode": mode if mode == "greedy" else f"beam{beam_width}:{merge_impl}",
        "ms_per_batch": round(dt * 1e3, 2),
        "x_realtime": round(B * seconds / dt, 0),
        "rtf": round(dt / (B * seconds), 8),
    }


def run_stages(B=128, seconds=8.0, iters=20):
    """Per-stage ms breakdown of the train step (frontend / encoder fwd /
    CTC / backward / optimizer) — prints one line per stage to stderr and
    returns the dict."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.frontend.features import compute_features
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    batch = _make_batch(B, seconds)
    db = Batch(*map(jnp.asarray, batch))
    tr = CTCTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), db)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters * 1e3

    fe = jax.jit(lambda a, l: compute_features(
        a, l, tr.frontend_state, cfg.frontend))
    t_fe = timeit(fe, db.audio, db.audio_lengths)

    def enc(params, a, l):
        f, fl = compute_features(a, l, tr.frontend_state, cfg.frontend)
        return tr.model.apply(params, f, fl)

    t_enc = timeit(jax.jit(enc), state.params, db.audio, db.audio_lengths)
    t_loss = timeit(jax.jit(lambda p, b, r: tr._loss(p, b, r)[0]),
                    state.params, db, jax.random.PRNGKey(1))
    t_grad = timeit(
        jax.jit(lambda p, b, r: jax.value_and_grad(
            lambda q: tr._loss(q, b, r)[0])(p)[1]),
        state.params, db, jax.random.PRNGKey(1))
    step_fn = jax.jit(tr.train_step, donate_argnums=(0,))
    s, _ = step_fn(state, db, jax.random.PRNGKey(1))
    jax.block_until_ready(s.params)
    t0 = time.time()
    for _ in range(iters):
        s, _ = step_fn(s, db, jax.random.PRNGKey(1))
    jax.block_until_ready(s.params)
    t_step = (time.time() - t0) / iters * 1e3

    stages = {
        "frontend_ms": round(t_fe, 2),
        "encoder_fwd_ms": round(t_enc - t_fe, 2),
        "ctc_fwd_ms": round(t_loss - t_enc, 2),
        "backward_ms": round(t_grad - t_loss, 2),
        "optimizer_ms": round(t_step - t_grad, 2),
        "step_ms": round(t_step, 2),
        "audio_sec_per_sec": round(B * seconds / (t_step / 1e3), 1),
    }
    for k, v in stages.items():
        print(f"{k}: {v}", file=sys.stderr)
    return stages


def run_baseline(B=16, seconds=8.0, iters=3):
    """Reference-equivalent: host numpy feature chain (the oracle — the
    reference's data-prep math) + the same train step on CPU."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from uasr.config import FrontendConfig
    from uasr.data.dataset import Batch
    from uasr.frontend import oracle
    from uasr.train import CTCTrainer

    cfg = _bench_cfg()
    cfg.model.dtype = "float32"  # reference ran f32
    batch = _make_batch(B, seconds)
    trainer = CTCTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)
    state, aux = step_fn(state, db, rng)  # compile
    jax.block_until_ready(state.params)

    t0 = time.time()
    for it in range(iters):
        # host-side features per utterance, like the reference's prep pass
        for b in range(B):
            _ = oracle.oracle_fbank(
                batch.audio[b].astype(np.float64), cfg.frontend
            )
        state, aux = step_fn(state, db, rng)
        jax.block_until_ready(state.params)
    dt = time.time() - t0
    return B * seconds * iters / dt, float(aux["ctc_loss"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", action="store_true")
    p.add_argument("--stages", action="store_true",
                   help="per-stage ms breakdown instead of the JSON line")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--chained", action="store_true",
                   help="all bench iters inside one jitted scan launch")
    p.add_argument("--mfu", action="store_true",
                   help="model-FLOP utilization of the train step "
                        "(XLA cost analysis / measured time / bf16 peak)")
    p.add_argument("--decode", choices=["greedy", "beam"], default=None,
                   help="decode throughput instead of the train JSON line")
    p.add_argument("--beam-width", type=int, default=8)
    p.add_argument("--merge-impl", default="fold",
                   choices=["fold", "pairwise", "sort", "pallas"])
    args = p.parse_args()

    if args.decode:
        print(json.dumps(run_decode(
            B=args.batch, seconds=args.seconds, mode=args.decode,
            beam_width=args.beam_width, merge_impl=args.merge_impl,
        )))
        return

    if args.stages:
        print(json.dumps(run_stages(B=args.batch, seconds=args.seconds)))
        return

    if args.mfu:
        print(json.dumps(run_mfu(B=args.batch, seconds=args.seconds)))
        return

    if args.baseline:
        thr, loss = run_baseline()
        with open(_BASELINE_FILE, "w") as f:
            json.dump(
                {"audio_sec_per_sec": thr, "pipeline":
                 "host numpy oracle frontend + CPU f32 conv+BiGRU CTC step",
                 "batch": 16, "seconds": 8.0}, f)
        print(f"baseline audio_sec/sec = {thr:.2f} (loss {loss:.3f})",
              file=sys.stderr)
        return

    if args.chained:
        thr, loss = run_tpu_chained(B=args.batch, seconds=args.seconds)
    else:
        thr, loss = run_tpu(B=args.batch, seconds=args.seconds)
    base = BASELINE_AUDIO_SEC_PER_SEC
    if base is None and os.path.exists(_BASELINE_FILE):
        with open(_BASELINE_FILE) as f:
            base = json.load(f)["audio_sec_per_sec"]
    vs = thr / base if base else None
    print(json.dumps({
        "metric": "train_throughput_frontend_encoder_ctc",
        "value": round(thr, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
