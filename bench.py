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


def run_tpu(B=128, seconds=8.0, warmup=2, iters=8, gru_unroll=None):
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
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=8.0)
    args = p.parse_args()

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
