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


def _bench_cfg(encoder="conv_bigru", conv_front=None):
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
            encoder=encoder, hidden_size=512, num_gru_layers=2,
            conv_channels=32, num_conv_layers=2, conv_time_stride=2,
            dtype="bfloat16", gru_pallas=True,
            attn_pallas=os.environ.get("UASR_BENCH_ATTN", "pallas")
            == "pallas",
            # flagship default: the MXU-aligned patch front (same
            # receptive-field class as the reference's conv2d blocks;
            # measured vs conv2d in BASELINE.md round 3 — the 32-wide
            # conv channel dim pads to the 128-lane tile and its
            # fwd+bwd was 3.9 ms of the 18.4 ms step)
            conv_front=conv_front
            or os.environ.get("UASR_BENCH_CONV_FRONT", "patch"),
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


def run_tpu(B=128, seconds=8.0, warmup=10, iters=40, gru_unroll=None,
            encoder="conv_bigru"):
    # Measurement discipline through the axon tunnel (round-3 finding,
    # NOTES_ROUND3): (a) jax.block_until_ready can RETURN EARLY, and
    # (b) content-identical dispatches can be served from a cache at
    # impossible speed (a fenced 1-TFLOP matmul chain "ran" at 37,000
    # TF/s). The ONLY airtight fence is a host read of a value that
    # data-depends on the last step — float(aux[...]) INSIDE the timed
    # region. The step chain itself is unique-content (params update
    # every step), so the loop cannot be cache-served.
    # warmup/iters sized for steady state: the first ~10 post-compile
    # steps run ~20% slow while the dispatch pipeline fills.
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.train import CTCTrainer

    cfg = _bench_cfg(encoder)
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
    _ = float(aux["ctc_loss"])  # drain the dispatch queue for real
    t0 = time.time()
    for _ in range(iters):
        state, aux = step_fn(state, db, rng)
    loss = float(aux["ctc_loss"])  # airtight fence (host read)
    dt = time.time() - t0
    n_chips = jax.device_count()
    audio_sec = B * seconds * iters
    return audio_sec / dt / n_chips, loss


_BF16_PEAK = {
    # dense bf16 peak FLOP/s per chip (MXU). v5e is 197 TF/s — the
    # oft-quoted 394 is its int8 number.
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def run_mfu(B=128, seconds=8.0, encoder="conv_bigru", ssl=False,
            ssl_front="patch"):
    """Model-FLOP utilization of a train step: XLA's compiled cost
    analysis (the Pallas kernels contribute their CostEstimates)
    divided by measured step time and the chip's dense bf16 peak.
    `--encoder {cnn,transformer,conformer,...}` covers every CTC
    family; `--ssl --mfu` reports the SSL contrastive step (round-4
    VERDICT weak #9: per-encoder MFU was unreported)."""
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp

    from uasr.data.dataset import Batch

    batch = _make_batch(B, seconds)
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)
    if ssl:
        from uasr.pretrain import SSLTrainer

        cfg = _ssl_cfg(ssl_front)
        trainer = SSLTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        compiled = (
            trainer.jitted_train_step().lower(state, db, rng).compile()
        )
        thr = run_ssl(B=B, seconds=seconds, front=ssl_front)["value"]
    else:
        from uasr.train import CTCTrainer

        cfg = _bench_cfg(encoder)
        trainer = CTCTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        compiled = (
            jax.jit(trainer.train_step, donate_argnums=(0,))
            .lower(state, db, rng)
            .compile()
        )
        thr, _ = run_tpu(B=B, seconds=seconds, encoder=encoder)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    step_s = B * seconds / thr
    kind = jax.devices()[0].device_kind
    peak = _BF16_PEAK.get(kind)
    mfu = flops / step_s / peak if peak else None
    return {
        "family": "ssl" if ssl else encoder,
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
    _ = float(losses[-1])  # real queue drain (host read)
    t0 = time.time()
    state, losses = steps(state)  # state differs -> not cache-servable
    last = float(losses[-1])  # airtight fence
    dt = time.time() - t0
    return B * seconds * iters / dt / jax.device_count(), last


def run_decode(B=128, seconds=8.0, iters=20, mode="greedy", beam_width=8,
               merge_impl="pairwise", lm_order=0):
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

    lm = None
    if lm_order or mode == "viterbi":
        from uasr.ops.lm import build_bigram_lm, build_trigram_lm

        V = cfg.vocab_size
        rng = np.random.RandomState(5)
        seqs = [rng.randint(1, V, size=rng.randint(4, 20)).tolist()
                for _ in range(200)]
        build = (build_bigram_lm if lm_order == 2 or mode == "viterbi"
                 else build_trigram_lm)
        lm = jnp.asarray(build(seqs, V, add_k=0.5, exclude=(0,)))

    hmm = None
    if mode == "viterbi":
        from uasr.ops.viterbi import lm_hmm

        hmm = tuple(jnp.asarray(x) for x in
                    lm_hmm(np.asarray(lm), cfg.ctc.blank_id))

    def body(a, _):
        feats, flen = compute_features(
            a, lens, trainer.frontend_state, cfg.frontend
        )
        logits, out_len = trainer.model.apply(params, feats, flen)
        if mode == "greedy":
            ids, n = ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)
        elif mode == "viterbi":
            from uasr.ops.viterbi import viterbi_lm_decode

            ids, n, _sc = viterbi_lm_decode(
                logits, out_len, hmm, cfg.ctc.blank_id
            )
        elif merge_impl == "pallas":
            from uasr.ops.pallas_beam import ctc_beam_search_decode_pallas

            ids, n, _sc = ctc_beam_search_decode_pallas(
                logits, out_len, beam_width, cfg.ctc.blank_id,
                lm_logp=lm, lm_weight=0.5, lm_bonus=0.5,
            )
        else:
            ids, n, _sc = ctc_beam_search_decode(
                logits, out_len, beam_width, cfg.ctc.blank_id,
                merge_impl=merge_impl,
                lm_logp=lm, lm_weight=0.5, lm_bonus=0.5,
            )
        # data dependency so scan iterations cannot be elided
        return a + 0.0 * n.sum().astype(a.dtype), n.sum()

    @jax.jit
    def loop(a):
        _, ns = jax.lax.scan(body, a, None, length=iters)
        return ns

    ns = loop(audio)
    _ = int(ns[-1])  # compile + warm; host read drains the queue
    # the timed dispatch must NOT be content-identical to the warm one
    # (the tunnel serves repeated identical dispatches from a cache —
    # NOTES_ROUND3); perturb the audio so the content is unique, and
    # fence with a host read inside the timed region
    audio_t = audio + 1e-7
    t0 = time.time()
    ns = loop(audio_t)
    _ = int(ns[-1])  # airtight fence
    dt = (time.time() - t0) / iters
    tag = (mode if mode in ("greedy", "viterbi")
           else f"beam{beam_width}:{merge_impl}")
    if lm_order:
        tag += f"+lm{lm_order}"
    return {
        "mode": tag,
        "ms_per_batch": round(dt * 1e3, 2),
        "x_realtime": round(B * seconds / dt, 0),
        "rtf": round(dt / (B * seconds), 8),
    }


def run_stages(B=128, seconds=8.0, iters=20, encoder="conv_bigru"):
    """Per-stage ms breakdown of the train step (frontend / encoder fwd /
    CTC / backward / optimizer) — prints one line per stage to stderr and
    returns the dict."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.frontend.features import compute_features
    from uasr.train import CTCTrainer

    cfg = _bench_cfg(encoder)
    batch = _make_batch(B, seconds)
    db = Batch(*map(jnp.asarray, batch))
    tr = CTCTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), db)

    def timeit(fn):
        """fn(eps) -> pytree. Iterations are made DEPENDENT and
        content-UNIQUE by threading a tiny scalar derived from each
        output into the next input (the tunnel serves repeated
        content-identical dispatches from a cache, and
        block_until_ready can return early — NOTES_ROUND3); the fence
        is a host read inside the timed region. The eps-add costs one
        fused elementwise pass over the perturbed input (~0.1-0.2 ms at
        these shapes), identical across stages, so stage DIFFERENCES
        are unaffected."""
        @jax.jit
        def jfn(eps):
            # carry extraction INSIDE the jit: eager ops through the
            # tunnel cost ~1-2 ms dispatch each and inflated every
            # stage when the carry math ran outside. The carry reduces
            # over EVERY output element: returning just one element let
            # XLA dead-code-eliminate most of the grad stage (backward
            # "measured" 4.2 ms vs a true ~10.5)
            out = fn(eps)
            tot = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
            )
            return tot * jnp.float32(1e-24)

        # warm TWICE: the second pass uses the loop's exact carry aval,
        # so any weak-type recompile happens before the timed region
        # (a disk-cache reload inside it skewed fe to 27 ms once)
        carry = jfn(jnp.zeros((), jnp.float32))
        carry = jfn(carry)
        _ = float(carry)  # queue drain
        t0 = time.time()
        for _ in range(iters):
            carry = jfn(carry)
        _ = float(carry)  # airtight fence
        return (time.time() - t0) / iters * 1e3

    fe = lambda eps: compute_features(  # noqa: E731
        db.audio + eps, db.audio_lengths, tr.frontend_state, cfg.frontend)
    t_fe = timeit(fe)

    t_enc = timeit(lambda eps: tr.model.apply(
        state.params, *compute_features(
            db.audio + eps, db.audio_lengths, tr.frontend_state,
            cfg.frontend)))
    rng1 = jax.random.PRNGKey(1)
    t_loss = timeit(lambda eps: tr._loss(
        state.params, db._replace(audio=db.audio + eps), rng1)[0])
    t_grad = timeit(lambda eps: jax.value_and_grad(
        lambda q: tr._loss(
            q, db._replace(audio=db.audio + eps), rng1)[0])(
                state.params)[1])
    step_fn = jax.jit(tr.train_step, donate_argnums=(0,))
    s, aux = step_fn(state, db, rng1)
    _ = float(aux["ctc_loss"])  # warm + queue drain
    t0 = time.time()
    for _ in range(iters):  # state updates -> unique content each step
        s, aux = step_fn(s, db, rng1)
    _ = float(aux["ctc_loss"])  # airtight fence
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


def _ssl_cfg(front="conv", fused=False):
    cfg = _bench_cfg()
    cfg.train.mode = "ssl"
    cfg.ssl.context_pallas = True
    cfg.ssl.fused_loss = fused
    if front == "patch":
        # patch-rate stack with the same 160x total downsample and
        # comparable capacity: 20-sample GEMM embed -> k3 context conv
        # -> three strided convs (see SSLConfig.front)
        cfg.ssl.front = "patch"
        cfg.ssl.patch_size = 20
        cfg.ssl.conv_channels = (256, 256, 256, 512)
        cfg.ssl.conv_kernels = (3, 4, 4, 2)
        cfg.ssl.conv_strides = (1, 2, 2, 2)
    return cfg


def run_ssl_stages(B=64, seconds=8.0, iters=30, front="conv"):
    """Stage attribution for the SSL pretraining step (VERDICT round-3
    item 3: the ~21% MFU was never attributed). Progressive-prefix
    timings with the airtight tunnel-proof harness (carry chain +
    full-output reduction + host-read fence, as in run_stages):
    per-conv-layer prefixes, + causal GRU context, + heads, + InfoNCE,
    backward, optimizer."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.models.layers import GRULayer
    from uasr.models.ssl import ConvFeatureEncoder
    from uasr.pretrain import SSLTrainer

    cfg = _ssl_cfg(front)
    batch = _make_batch(B, seconds)
    db = Batch(*map(jnp.asarray, batch))
    trainer = SSLTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), db)
    dt = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    p = state.params["params"]
    audio, lengths = db.audio, db.audio_lengths

    def timeit(fn):
        # identical harness to run_stages (see its docstring)
        @jax.jit
        def jfn(eps):
            out = fn(eps)
            tot = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
            )
            return tot * jnp.float32(1e-24)

        carry = jfn(jnp.zeros((), jnp.float32))
        carry = jfn(carry)
        _ = float(carry)
        t0 = time.time()
        for _ in range(iters):
            carry = jfn(carry)
        _ = float(carry)
        return (time.time() - t0) / iters * 1e3

    stages = {}
    n = len(cfg.ssl.conv_channels)
    prev = 0.0
    for i in range(1, n + 1):
        sub_cfg = dataclasses.replace(
            cfg.ssl,
            conv_channels=tuple(cfg.ssl.conv_channels[:i]),
            conv_kernels=tuple(cfg.ssl.conv_kernels[:i]),
            conv_strides=tuple(cfg.ssl.conv_strides[:i]),
        )
        sub = ConvFeatureEncoder(sub_cfg, dtype=dt)
        keep = {
            k: v for k, v in p["encoder"].items()
            if k in ("patch_embed", "patch_norm")
            or (k.startswith("conv") and int(k[4:]) < i)
            or (k.startswith("LayerNorm")
                and int(k.split("_")[1]) < i)
        }
        t = timeit(lambda eps, m=sub, kp=keep: m.apply(
            {"params": kp}, audio + eps, lengths))
        stages[f"conv{i - 1}_fwd_ms"] = round(t - prev, 2)
        prev = t
    t_z = prev

    enc = ConvFeatureEncoder(cfg.ssl, dtype=dt)
    gru = GRULayer(cfg.ssl.context_hidden, dtype=dt,
                   use_pallas=cfg.ssl.context_pallas)

    def with_gru(eps):
        z, fl = enc.apply({"params": p["encoder"]}, audio + eps, lengths)
        return gru.apply({"params": p["context"]}, z, fl)

    t_zc = timeit(with_gru)
    t_fwd = timeit(lambda eps: trainer.model.apply(
        state.params, audio + eps, lengths))
    rng1 = jax.random.PRNGKey(1)
    t_loss = timeit(lambda eps: trainer._loss(
        state.params, db._replace(audio=audio + eps), rng1)[0])
    t_grad = timeit(lambda eps: jax.value_and_grad(
        lambda q: trainer._loss(
            q, db._replace(audio=audio + eps), rng1)[0])(
                state.params)[1])

    # backward decomposition: grad of progressively longer prefixes
    # (sum-of-outputs scalarization; the DELTAS attribute the backward)
    def g_conv(eps):
        def f(q):
            z, fl = enc.apply({"params": q}, audio + eps, lengths)
            return jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.value_and_grad(f)(p["encoder"])[1]

    t_gc = timeit(g_conv)

    def g_convgru(eps):
        def f(q):
            z, fl = enc.apply({"params": q["encoder"]}, audio + eps,
                              lengths)
            c = gru.apply({"params": q["context"]}, z, fl)
            return jnp.sum(c.astype(jnp.float32)) * 1e-12
        return jax.value_and_grad(f)(
            {"encoder": p["encoder"], "context": p["context"]})[1]

    t_gcg = timeit(g_convgru)
    step_fn = trainer.jitted_train_step()
    s, aux = step_fn(state, db, rng1)
    _ = float(aux["nce_loss"])
    t0 = time.time()
    for _ in range(iters):
        s, aux = step_fn(s, db, rng1)
    _ = float(aux["nce_loss"])
    t_step = (time.time() - t0) / iters * 1e3

    stages.update({
        "conv_stack_fwd_ms": round(t_z, 2),
        "gru_context_fwd_ms": round(t_zc - t_z, 2),
        "heads_fwd_ms": round(t_fwd - t_zc, 2),
        "infonce_ms": round(t_loss - t_fwd, 2),
        "backward_ms": round(t_grad - t_loss, 2),
        # fwd+bwd prefix times; conv bwd ~= t_gc - t_z, GRU bwd ~=
        # (t_gcg - t_gc) - (t_zc - t_z), loss/heads bwd = the rest
        "conv_fwdbwd_ms": round(t_gc, 2),
        "convgru_fwdbwd_ms": round(t_gcg, 2),
        "optimizer_ms": round(t_step - t_grad, 2),
        "step_ms": round(t_step, 2),
        "audio_sec_per_sec": round(B * seconds / (t_step / 1e3), 1),
    })
    for k, v in stages.items():
        print(f"{k}: {v}", file=sys.stderr)
    return stages


def run_ssl(B=64, seconds=8.0, warmup=10, iters=40, front="conv",
            remat=False, fused=False):
    """SSL pretraining throughput: the jitted contrastive step (conv
    encoder + Pallas causal GRU context + InfoNCE over 100 sampled
    negatives) at production shapes."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.data.dataset import Batch
    from uasr.pretrain import SSLTrainer

    cfg = _ssl_cfg(front, fused=fused)
    cfg.ssl.remat_encoder = remat
    batch = _make_batch(B, seconds)
    trainer = SSLTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = trainer.jitted_train_step()
    db = Batch(*map(jnp.asarray, batch))
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, aux = step_fn(state, db, rng)
    _ = float(aux["nce_loss"])  # real queue drain (host read)
    t0 = time.time()
    for _ in range(iters):
        state, aux = step_fn(state, db, rng)
    _ = float(aux["nce_loss"])  # airtight fence (NOTES_ROUND3:
    # block_until_ready through the tunnel can return early — this loop
    # measured a physically-impossible 339k audio-s/s without the read)
    dt = time.time() - t0
    thr = B * seconds * iters / dt / jax.device_count()
    return {
        "metric": "ssl_pretrain_throughput",
        "value": round(thr, 1),
        "unit": "audio_sec/sec/chip",
        "nce_loss": round(float(aux["nce_loss"]), 4),
        "nce_acc": round(float(aux["nce_acc"]), 4),
        "step_ms": round(B * seconds / thr * 1000.0, 2),
    }


def run_gan(B=128, seconds=8.0, warmup=5, cycles=20):
    """GAN adversarial-cycle throughput (BASELINE.md accounting: one
    cycle = gan.disc_steps D-updates + 1 G-update, each a full pass over
    the same batch; throughput = batch audio-seconds / cycle time).
    Airtight fencing (host read inside the timed region)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from uasr.data.dataset import Batch, TextBatch
    from uasr.train import GANTrainer

    cfg = _bench_cfg()
    cfg.train.mode = "gan"
    cfg.model.encoder = "classifier"
    batch = _make_batch(B, seconds)
    rng_np = np.random.RandomState(0)
    text = TextBatch(
        rng_np.randint(1, 64, size=(B, 64)).astype(np.int32),
        np.full((B,), 48, np.int32),
    )
    gan = GANTrainer(cfg)
    state = gan.init_state(jax.random.PRNGKey(0), batch, text)
    d_step = jax.jit(gan.d_step, donate_argnums=(0,))
    g_step = jax.jit(gan.g_step, donate_argnums=(0,))
    db = Batch(*map(jnp.asarray, batch))
    tb = TextBatch(*map(jnp.asarray, text))
    rng = jax.random.PRNGKey(1)

    def cycle(state, rng):
        for _ in range(cfg.gan.disc_steps):
            rng, sub = jax.random.split(rng)
            state, d_aux = d_step(state, db, tb, sub)
        rng, sub = jax.random.split(rng)
        state, g_aux = g_step(state, db, sub)
        return state, rng, d_aux, g_aux

    for _ in range(warmup):
        state, rng, d_aux, g_aux = cycle(state, rng)
    _ = float(g_aux["g_loss"])  # queue drain
    t0 = time.time()
    for _ in range(cycles):
        state, rng, d_aux, g_aux = cycle(state, rng)
    g_l = float(g_aux["g_loss"])  # airtight fence
    dt = (time.time() - t0) / cycles
    thr = B * seconds / dt / jax.device_count()
    return {
        "metric": "gan_cycle_throughput",
        "value": round(thr, 1),
        "unit": "audio_sec/sec/chip_per_cycle",
        "cycle_ms": round(dt * 1e3, 2),
        "disc_steps": cfg.gan.disc_steps,
        "d_loss": round(float(d_aux["d_loss"]), 4),
        "g_loss": round(g_l, 4),
    }


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


def run_streaming(B=8, chunk_frames=64, n_chunks=60, warmup=10,
                  beam=False, beam_width=8, encoder="cnn"):
    """Online serving latency: per-chunk wall time of the jitted
    StreamingRecognizer step (frontend chunk + window encoder + greedy
    emit), host read of the emitted-token counts every chunk — exactly
    the online serving loop, so the per-dispatch cost is PART of the
    metric, not hidden in a scan. Content is unique per chunk (real
    random audio), so the tunnel cache cannot serve repeats."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.config import (
        Config, CTCConfig, FrontendConfig, ModelConfig, TrainConfig,
    )
    from uasr.frontend.features import compute_features
    from uasr.serve import StreamingRecognizer
    from uasr.train import CTCTrainer

    cfg = Config(
        name="bench_stream",
        frontend=FrontendConfig(num_mel_bins=80, cmvn="streaming",
                                streaming_chunk_frames=chunk_frames,
                                precision="high"),
        # cnn = the AISHELL streaming recipe's encoder shape (finite
        # RF, window replay); uni_gru = the causal recurrent class
        # (carried conv tail + GRU state, zero-latency emission);
        # lc_bigru = the latency-controlled BiGRU (round 5 — exact
        # bidirectional streaming, num_gru_layers-chunk emission lag)
        model=ModelConfig(encoder=encoder, hidden_size=384,
                          num_conv_layers=2, conv_time_stride=2,
                          conv_kernel=5, num_gru_layers=2,
                          dtype="bfloat16",
                          lc_chunk=max(chunk_frames // 4, 1),
                          lc_lookahead=max(chunk_frames // 8, 1)),
        ctc=CTCConfig(use_beam=beam, beam_width=beam_width),
        train=TrainConfig(),
        vocab_size=64,
    )
    cs = chunk_frames * cfg.frontend.frame_shift
    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        rng.randn(B, cs * (warmup + n_chunks)).astype(np.float32) * 0.1
    )
    trainer = CTCTrainer(cfg)
    f0, l0 = compute_features(
        audio[:, :cs], jnp.full((B,), cs), trainer.frontend_state,
        cfg.frontend,
    )
    params = trainer.model.init(jax.random.PRNGKey(0), f0, l0)
    rec = StreamingRecognizer(cfg, params, chunk_frames=chunk_frames)
    st = rec.init(B)
    for k in range(warmup):
        st, ids, counts = rec.step(st, audio[:, k * cs : (k + 1) * cs])
        _ = int(counts.sum())
    lat = []
    for k in range(warmup, warmup + n_chunks):
        t0 = time.time()
        st, ids, counts = rec.step(st, audio[:, k * cs : (k + 1) * cs])
        _ = int(counts.sum())  # host read = the serving fence
        lat.append(time.time() - t0)
    lat_ms = sorted(x * 1e3 for x in lat)
    chunk_sec = chunk_frames * cfg.frontend.frame_shift_ms / 1000.0
    p50 = lat_ms[len(lat_ms) // 2]
    return {
        "mode": f"streaming-{encoder}"
                f"{'-beam%d' % beam_width if beam else ''}"
                f":B{B}xC{chunk_frames}",
        "chunk_ms": round(chunk_sec * 1e3, 1),
        "latency_ms_p50": round(p50, 2),
        "latency_ms_p95": round(lat_ms[int(len(lat_ms) * 0.95)], 2),
        "x_realtime": round(B * chunk_sec / (p50 / 1e3), 0),
    }


def run_serve(B=8, chunk_frames=64, utt_chunks=25, n_utts=None,
              warmup_utts=None):
    """Dynamic-batching daemon throughput: B closed-loop clients stream
    utterances through the ServingEngine back-to-back (open -> feed ->
    end -> final -> next utterance), so every tick runs the real serving
    path — masked step, length stamping, finish, slot reset — with slots
    joining and leaving continuously. Every final transcript is a host
    read (the fence); every utterance is fresh random audio (the tunnel
    cache cannot serve repeats). Metric: sustained audio-sec/sec through
    the daemon."""
    import queue
    import threading

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from uasr.config import Config, FrontendConfig, ModelConfig, TrainConfig
    from uasr.frontend.features import compute_features
    from uasr.serve import StreamingRecognizer
    from uasr.tools.serve_daemon import ServingEngine
    from uasr.train import CTCTrainer

    cfg = Config(
        name="bench_serve",
        frontend=FrontendConfig(num_mel_bins=80, cmvn="streaming",
                                streaming_chunk_frames=chunk_frames,
                                precision="high"),
        model=ModelConfig(encoder="cnn", hidden_size=384,
                          num_conv_layers=2, conv_time_stride=2,
                          conv_kernel=5, dtype="bfloat16"),
        train=TrainConfig(),
        vocab_size=64,
    )
    # workload scales with the slot count so the timed region is
    # steady-state multiplexing, not ramp-up/drain
    n_utts = n_utts if n_utts is not None else 6 * B
    warmup_utts = warmup_utts if warmup_utts is not None else 2 * B
    cs = chunk_frames * cfg.frontend.frame_shift
    trainer = CTCTrainer(cfg)
    rng = np.random.RandomState(0)
    a0 = jnp.asarray(rng.randn(B, cs).astype(np.float32) * 0.1)
    f0, l0 = compute_features(
        a0, jnp.full((B,), cs), trainer.frontend_state, cfg.frontend
    )
    params = trainer.model.init(jax.random.PRNGKey(0), f0, l0)
    rec = StreamingRecognizer(cfg, params, chunk_frames=chunk_frames)
    engine = ServingEngine(rec, linger_s=0.002)
    engine.start(B)

    utts: "queue.Queue[np.ndarray]" = queue.Queue()
    done = []
    done_lock = threading.Lock()

    def client():
        while True:
            try:
                audio = utts.get_nowait()
            except queue.Empty:
                return
            sess = None
            while sess is None:
                sess = engine.open()
            engine.feed(sess, audio)
            engine.end(sess)
            while True:  # drain to the final (host read = the fence)
                kind, ids = sess.events.get()
                if kind == "final":
                    break
            with done_lock:
                done.append(len(audio))

    def run_wave(n):
        for i in range(n):
            # utterance lengths vary ±20% so slots go in and out of sync
            n_ch = max(2, utt_chunks + int((i % 5 - 2) * 0.1 * utt_chunks))
            utts.put((rng.randn(n_ch * cs) * 0.1).astype(np.float32))
        threads = [threading.Thread(target=client) for _ in range(B)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    run_wave(warmup_utts)  # jit compiles: masked step/stamp/finish/reset
    done.clear()
    t0 = time.time()
    run_wave(n_utts)
    dt = time.time() - t0
    engine.stop()
    sr = cfg.frontend.sample_rate
    audio_sec = sum(done) / sr
    return {
        "mode": f"serve-daemon:B{B}xC{chunk_frames}",
        "metric": "serving_throughput",
        "value": round(audio_sec / dt, 1),
        "unit": "audio_sec/sec/chip",
        "utts_per_sec": round(len(done) / dt, 2),
        "mean_utt_sec": round(audio_sec / max(len(done), 1), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--baseline", action="store_true")
    p.add_argument("--stages", action="store_true",
                   help="per-stage ms breakdown instead of the JSON line")
    p.add_argument("--batch", type=int, default=None,
                   help="batch/slot count (default: 128 for train/decode "
                        "modes, 64 for --ssl, 8 for --streaming/--serve)")
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--encoder", default="conv_bigru",
                   choices=["conv_bigru", "lc_bigru", "cnn",
                            "transformer", "conformer", "uni_gru"],
                   help="encoder family for the train-throughput line "
                        "(with --streaming: cnn | uni_gru | lc_bigru)")
    p.add_argument("--chained", action="store_true",
                   help="all bench iters inside one jitted scan launch")
    p.add_argument("--mfu", action="store_true",
                   help="model-FLOP utilization of the train step "
                        "(XLA cost analysis / measured time / bf16 peak)")
    p.add_argument("--ssl", action="store_true",
                   help="SSL contrastive-pretraining throughput "
                        "(add --stages for the stage attribution)")
    p.add_argument("--ssl-fused", action="store_true",
                   help="heads-folded time-chunked InfoNCE "
                        "(ssl.fused_loss — the [B,T,K,C] prediction "
                        "tensor never hits HBM)")
    p.add_argument("--ssl-front", choices=["conv", "patch"],
                   default="patch",
                   help="SSL waveform front (patch = the round-4 "
                        "flagship: 20-sample GEMM embed at patch rate)")
    p.add_argument("--gan", action="store_true",
                   help="GAN adversarial-cycle throughput")
    p.add_argument("--decode", choices=["greedy", "beam", "viterbi"],
                   default=None,
                   help="decode throughput instead of the train JSON line")
    p.add_argument("--beam-width", type=int, default=8)
    p.add_argument("--merge-impl", default="fold",
                   choices=["fold", "pairwise", "sort", "pallas"])
    p.add_argument("--lm-order", type=int, default=0, choices=[0, 2, 3],
                   help="fuse a shallow n-gram LM into --decode beam "
                        "(0 = no LM)")
    p.add_argument("--streaming", action="store_true",
                   help="online serving per-chunk latency "
                        "(StreamingRecognizer step)")
    p.add_argument("--serve", action="store_true",
                   help="dynamic-batching daemon throughput "
                        "(ServingEngine, closed-loop clients)")
    p.add_argument("--chunk-frames", type=int, default=64)
    args = p.parse_args()

    if args.serve:
        print(json.dumps(run_serve(
            B=args.batch or 8,
            chunk_frames=args.chunk_frames,
        )))
        return

    if args.streaming:
        print(json.dumps(run_streaming(
            B=args.batch or 8,
            chunk_frames=args.chunk_frames,
            beam=args.decode == "beam", beam_width=args.beam_width,
            encoder=(args.encoder
                     if args.encoder in ("uni_gru", "lc_bigru")
                     else "cnn"),
        )))
        return

    if args.decode:
        print(json.dumps(run_decode(
            B=args.batch or 128, seconds=args.seconds, mode=args.decode,
            beam_width=args.beam_width, merge_impl=args.merge_impl,
            lm_order=args.lm_order,
        )))
        return

    if args.ssl:
        if args.mfu:
            print(json.dumps(run_mfu(
                B=min(args.batch or 64, 64), seconds=args.seconds,
                ssl=True, ssl_front=args.ssl_front,
            )))
            return
        if args.stages:
            print(json.dumps(run_ssl_stages(
                B=min(args.batch or 64, 64), seconds=args.seconds,
                front=args.ssl_front,
            )))
            return
        print(json.dumps(run_ssl(
            B=min(args.batch or 64, 64), seconds=args.seconds,
            front=args.ssl_front,
            remat=bool(os.environ.get("UASR_SSL_REMAT")),
            fused=args.ssl_fused,
        )))
        return

    if args.gan:
        print(json.dumps(run_gan(B=args.batch or 128, seconds=args.seconds)))
        return

    if args.stages:
        print(json.dumps(run_stages(B=args.batch or 128, seconds=args.seconds,
                                    encoder=args.encoder)))
        return

    if args.mfu:
        print(json.dumps(run_mfu(B=args.batch or 128, seconds=args.seconds,
                                 encoder=args.encoder)))
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
        thr, loss = run_tpu_chained(B=args.batch or 128, seconds=args.seconds)
    else:
        thr, loss = run_tpu(B=args.batch or 128, seconds=args.seconds,
                            encoder=args.encoder)
    base = BASELINE_AUDIO_SEC_PER_SEC
    if base is None and os.path.exists(_BASELINE_FILE):
        with open(_BASELINE_FILE) as f:
            base = json.load(f)["audio_sec_per_sec"]
    vs = thr / base if base else None
    line = {
        "metric": "train_throughput_frontend_encoder_ctc",
        "value": round(thr, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    if args.encoder != "conv_bigru":
        line["encoder"] = args.encoder
    print(json.dumps(line))


if __name__ == "__main__":
    main()
