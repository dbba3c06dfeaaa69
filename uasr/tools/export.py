"""Serving export: the jitted inference function as a portable
StableHLO artifact.

  python -m uasr.tools.export -c recipe.yaml --out exp/serve \
      [--batch 8] [--seconds 8.0] [--platforms cpu,tpu] [--check]

Writes:
  <out>/model.stablehlo — `jax.export` serialization of
      fn(params, audio [B, L] f32, lengths [B] i32) -> (ids, out_len)
      (greedy, or beam + shallow-fusion LM per the recipe's ctc.*),
      lowered for every requested platform;
  <out>/params/        — Orbax checkpoint of the restored parameters;
  <out>/meta.json      — shapes, vocab size, decode settings.

A serving process needs only jax + orbax:

  from jax import export
  exp = export.deserialize(open("model.stablehlo", "rb").read())
  ids, n = exp.call(params, audio, lengths)

The reference had no serving story at all (SURVEY.md §3.4 decoded on
the host inside the eval loop); this freezes the full on-device
pipeline — frontend, encoder, decode — into one artifact with a stable
calling convention.

Cache-trained checkpoints (uasr-pipeline students/winners consume SSL
features, not audio) export as true audio->text artifacts via
`--compose-featurizer SSL_YAML` / `--compose-from-pipeline WORKDIR`:
the trained SSL featurizer plus the featurize-stage transform chain
(per-utterance CMVN, PCA, k-means adjacent pooling — all with exact
on-device counterparts) is frozen IN FRONT of the model, so inference
never leaves the chip (BASELINE.json north star). The artifact's
params pytree is then {"featurizer": ..., "model": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

import uasr  # noqa: F401  (import applies uasr._maybe_force_cpu)


def build_infer_fn(cfg):
    """(params, audio [B, L], lengths [B]) -> (ids [B, T'], out_len [B]).

    Mirrors uasr.infer.run_inference's decode_batch (reference `--mode
    infer`), minus the scoring. GAN/EODM recipes export the FULL trained
    pathway — frontend -> optional k-means segmentation -> classifier ->
    optional repeat merge (train.GeneratorInfer) — so the serving
    artifact decodes the same representation the checkpoint trained on.

    Returns (fn, init_params) where init_params(rng, audio, lengths)
    builds a parameter template through the same chain."""
    import jax.numpy as jnp

    from uasr.frontend.features import (
        compute_features, frontend_state_from_config,
    )
    from uasr.models import build_model
    from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode

    if cfg.train.mode == "ssl":
        # serve the FEATURIZER: fn(params, audio, lengths) ->
        # (features [B, T, D] f32, frame_lengths [B]) — the exact
        # transform uasr.tools.featurize applies (production feature
        # extraction without a Python uasr install)
        from uasr.pretrain import SSLTrainer

        trainer = SSLTrainer(cfg)

        def ssl_fn(params, audio, lengths):
            z, c, _preds, flen = trainer.encode(params, audio, lengths)
            feats = c if cfg.ssl.feature_layer == "context" else z
            return feats.astype(jnp.float32), flen

        def ssl_init(rng, audio, lengths):
            x, xl = trainer._inputs(audio, lengths)
            return trainer.model.init(rng, x, xl)

        return ssl_fn, ssl_init

    fe = frontend_state_from_config(cfg.frontend)
    model = build_model(cfg.model, cfg.dim_output)
    gen_infer = None
    if cfg.train.mode in ("gan", "eodm", "gan+eodm"):
        from uasr.train import GeneratorInfer

        gen_infer = GeneratorInfer(cfg)
    lm_logp = None
    if cfg.ctc.use_beam and cfg.ctc.lm_path:
        from uasr.ops.lm import load_lm

        lm_logp = load_lm(cfg.ctc.lm_path)
        V = cfg.dim_output
        if lm_logp.shape not in ((V + 1, V), (V + 1, V + 1, V)):
            # same loud check as infer.py — never bake a mismatched
            # table into a serving artifact
            raise ValueError(
                f"ctc.lm_path table shape {lm_logp.shape} does not match "
                f"the model vocabulary ([{V + 1}, {V}] bigram or "
                f"[{V + 1}, {V + 1}, {V}] trigram expected)"
            )
        lm_logp = jnp.asarray(lm_logp)

    def fn(params, audio, lengths):
        if gen_infer is not None:
            logits, out_len = gen_infer.logits_fn(params, audio, lengths)
        elif jnp.ndim(audio) == 3:
            # precomputed features (the composed-featurizer chain or an
            # SSL cache): frontend bypassed, same rule as infer.py
            logits, out_len = model.apply(params, audio, lengths)
        else:
            feats, flen = compute_features(audio, lengths, fe, cfg.frontend)
            logits, out_len = model.apply(params, feats, flen)
        if cfg.ctc.use_beam:
            ids, n, _ = ctc_beam_search_decode(
                logits, out_len, cfg.ctc.beam_width, cfg.ctc.blank_id,
                lm_logp=lm_logp, lm_weight=cfg.ctc.lm_weight,
                lm_bonus=cfg.ctc.lm_bonus,
            )
            return ids, n
        return ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)

    def init_params(rng, audio, lengths):
        if gen_infer is not None:
            return gen_infer.init_params(rng, audio, lengths)
        if jnp.ndim(audio) == 3:
            return model.init(
                rng, jnp.asarray(audio), jnp.asarray(lengths)
            )
        feats, flen = compute_features(
            jnp.asarray(audio), jnp.asarray(lengths), fe, cfg.frontend
        )
        return model.init(rng, feats, flen)

    return fn, init_params


def _composed_parts(args):
    """Resolve the --compose-* flags to (cfg_ssl, cmvn, pca, km), or
    None when no featurizer composition was requested.

    `--compose-from-pipeline WORKDIR` reads the uasr-pipeline manifest:
    featurizer recipe = the resolved ssl config the pipeline saved,
    cmvn/pca/pool-kmeans = what the featurize stage recorded, fitted
    transforms = the train cache directory."""
    if args.compose_from_pipeline:
        wd = args.compose_from_pipeline
        man_path = os.path.join(wd, "pipeline.json")
        if not os.path.exists(man_path):
            raise SystemExit(f"no pipeline.json under {wd}")
        with open(man_path) as f:
            stages = json.load(f).get("stages", {})
        if "ssl" not in stages or "featurize" not in stages:
            raise SystemExit(
                "--compose-from-pipeline: this workdir's pipeline ran "
                "without ssl/featurize stages (nothing to compose)"
            )
        feat = stages["featurize"]
        args.compose_featurizer = stages["ssl"].get(
            "config", os.path.join(wd, "ssl_resolved.yaml"))
        args.feat_cmvn = bool(feat.get("cmvn"))
        if feat.get("pca") or feat.get("pool_kmeans"):
            args.feat_transforms = feat["train"]
    if not args.compose_featurizer:
        return None
    from uasr.cli import apply_overrides
    from uasr.config import load_config

    cfg_ssl = load_config(args.compose_featurizer)
    apply_overrides(cfg_ssl, args.set_featurizer)
    if cfg_ssl.train.mode != "ssl":
        raise SystemExit(
            "--compose-featurizer recipe must be train.mode=ssl, got "
            f"{cfg_ssl.train.mode!r}"
        )
    pca = km = None
    if args.feat_transforms:
        from uasr.data import transforms as T

        pca, km = T.load_transforms(args.feat_transforms)
        if pca is None and km is None:
            raise SystemExit(
                f"--feat-transforms {args.feat_transforms}: no "
                f"{T.PCA_FILE} or {T.KMEANS_FILE} found"
            )
    return cfg_ssl, bool(args.feat_cmvn), pca, km


def build_composed_featurizer(cfg_ssl, cmvn, pca, km):
    """audio -> features, the exact transform chain
    `uasr.tools.featurize` applies when dumping a cache (SSL encode ->
    per-utterance CMVN -> PCA -> k-means adjacent pooling), as one
    jittable `feat_fn(fparams, audio, lengths) -> (feats, flen)`.

    This closes the round-3 "student-export seam" (VERDICT item 2):
    a cache-trained model composed behind this chain becomes a genuine
    audio->text artifact — inference never leaves the chip
    (BASELINE.json north star). The numpy prep transforms have exact
    on-device counterparts (`ops/segment.py::quantize/segment_pool`
    mirror `data/transforms.py::assign_clusters/pool_adjacent`).

    Returns (feat_fn, feat_init, restore) where restore() pulls the
    trained featurizer params from cfg_ssl.model_dir/ckpt."""
    import jax.numpy as jnp
    import numpy as np

    from uasr.ops.segment import quantize, segment_pool
    from uasr.pretrain import SSLTrainer

    trainer = SSLTrainer(cfg_ssl)
    layer = cfg_ssl.ssl.feature_layer
    pca_mean = jnp.asarray(pca.mean) if pca is not None else None
    pca_comp = jnp.asarray(pca.components) if pca is not None else None
    cents = jnp.asarray(km) if km is not None else None

    def feat_fn(fparams, audio, lengths):
        z, c, _preds, flen = trainer.encode(fparams, audio, lengths)
        f = (c if layer == "context" else z).astype(jnp.float32)
        T_ = f.shape[1]
        mask = (jnp.arange(T_)[None, :] < flen[:, None])[..., None]
        if cmvn:
            # featurize --cmvn: per-utterance standardization over the
            # VALID frames (biased std, eps on the std — match
            # featurize.raw_examples exactly)
            denom = jnp.maximum(flen, 1).astype(f.dtype)[:, None, None]
            mean = jnp.sum(f * mask, axis=1, keepdims=True) / denom
            var = jnp.sum(((f - mean) ** 2) * mask, 1, keepdims=True) \
                / denom
            f = (f - mean) / (jnp.sqrt(var) + 1e-5)
        if pca_mean is not None:
            f = (f - pca_mean) @ pca_comp.T
        if cents is not None:
            ids = quantize(f, cents)
            f, flen = segment_pool(f, flen, ids)
        return f, flen

    def feat_init(rng, audio, lengths):
        x, xl = trainer._inputs(jnp.asarray(audio), jnp.asarray(lengths))
        return trainer.model.init(rng, x, xl)

    def restore(rng, audio, lengths):
        from uasr.checkpoint import CheckpointManager

        template = feat_init(rng, audio, lengths)
        mgr = CheckpointManager(
            f"{cfg_ssl.model_dir}/ckpt",
            max_to_keep=max(cfg_ssl.train.keep_checkpoints, 1),
        )
        from uasr.train import TrainState

        state = TrainState(jnp.zeros((), jnp.int32), template,
                           trainer.optimizer.init(template))
        restored = mgr.restore_latest(state)
        mgr.close()
        if restored is None:
            raise SystemExit(
                f"no featurizer checkpoint under {cfg_ssl.model_dir}/ckpt"
            )
        st, step = restored
        return st.params, int(step)

    return feat_fn, feat_init, restore


def main(argv=None):
    p = argparse.ArgumentParser("uasr.tools.export", description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--check", action="store_true",
                   help="deserialize and run vs the live fn")
    p.add_argument("--streaming", action="store_true",
                   help="export the ONLINE chunk step (uasr.serve) "
                        "instead of the offline batch pipeline")
    p.add_argument("--chunk-frames", type=int, default=None)
    p.add_argument("--lookback-frames", type=int, default=None,
                   help="streaming window left context (frames)")
    p.add_argument("--approx-streaming", action="store_true",
                   help="allow window-bounded APPROXIMATE streaming "
                        "for unbounded-context encoders (conv_bigru / "
                        "attention): context limited to the rolling "
                        "window; not exact-parity")
    p.add_argument("--compose-featurizer", default=None, metavar="YAML",
                   help="ssl recipe whose trained model becomes the "
                        "audio->features stage composed IN FRONT of "
                        "this recipe's model — exports cache-trained "
                        "checkpoints (pipeline students/winners) as "
                        "true audio->text artifacts")
    p.add_argument("--set-featurizer", action="append", default=[],
                   metavar="K=V", help="override on the featurizer "
                                       "recipe")
    p.add_argument("--feat-cmvn", action="store_true",
                   help="per-utterance standardization after the "
                        "featurizer (matches `featurize --cmvn`)")
    p.add_argument("--feat-transforms", default=None, metavar="DIR",
                   help="apply the PCA/pool-kmeans transforms fitted "
                        "by a featurize dump (the cache directory)")
    p.add_argument("--compose-from-pipeline", default=None,
                   metavar="WORKDIR",
                   help="derive all --compose-*/--feat-* settings from "
                        "a uasr-pipeline workdir's manifest")
    p.add_argument("--quantize", choices=["int8", "int8-compute"],
                   default=None,
                   help="int8: weight-only per-channel PTQ — kernels "
                        "stored int8 + f32 scales, dequantized inside "
                        "the artifact (ops/quantize.py); ~4x smaller "
                        "params, greedy transcripts essentially "
                        "unchanged. int8-compute: additionally run the "
                        "Dense/Conv GEMMs on the int8 MXU (dynamic "
                        "per-token activation quantization, int32 "
                        "accumulation — cnn/classifier families)")
    p.add_argument("--set", action="append", default=[])
    args = p.parse_args(argv)

    import numpy as np
    from jax import export as jexport

    from uasr.checkpoint import CheckpointManager
    from uasr.cli import apply_overrides
    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    if cfg.vocab_size is None:
        if cfg.data.vocab_path:
            from uasr.vocab import load_vocab

            cfg = cfg.replace(vocab_size=len(load_vocab(cfg.data.vocab_path)))
        else:
            raise SystemExit(
                "recipe must pin vocab_size (or set data.vocab_path) "
                "for export"
            )
    if cfg.train.mode in ("gan", "eodm", "gan+eodm"):
        cfg.model.encoder = "classifier"  # serve the generator
    if args.quantize == "int8-compute":
        if cfg.model.encoder not in ("cnn", "classifier"):
            raise SystemExit(
                "--quantize int8-compute supports the cnn/classifier "
                f"serving families, got {cfg.model.encoder!r} (use "
                "--quantize int8 for weight-only PTQ)"
            )
        # the exported graph itself runs int8 GEMMs; the stored int8
        # weights round-trip losslessly through the in-graph
        # re-quantization (ops/quantize.py::int8_dot_general)
        cfg.model.int8_compute = True

    comp = _composed_parts(args)
    if comp is not None and args.streaming:
        raise SystemExit(
            "--streaming and --compose-featurizer are mutually "
            "exclusive (the online recognizer has no composed-"
            "featurizer state yet)"
        )
    fn, init_params = build_infer_fn(cfg)
    B = args.batch
    L = int(args.seconds * cfg.frontend.sample_rate)
    a_spec = jax.ShapeDtypeStruct((B, L), jax.numpy.float32)
    l_spec = jax.ShapeDtypeStruct((B,), jax.numpy.int32)

    # restore trained params (best_ckpt honored via train.restore_best)
    dummy_a = np.zeros((B, L), np.float32)
    dummy_l = np.full((B,), L, np.int32)
    feat_meta = None
    if comp is not None:
        cfg_ssl, f_cmvn, f_pca, f_km = comp
        feat_fn, _feat_init, feat_restore = build_composed_featurizer(
            cfg_ssl, f_cmvn, f_pca, f_km
        )
        fparams, fstep = feat_restore(
            jax.random.PRNGKey(1), dummy_a, dummy_l
        )
        # the model's parameter template must be built through the
        # featurizer chain (its input dim is the FEATURE dim, not the
        # audio-frontend's)
        dfeats, dflen = jax.jit(feat_fn)(fparams, dummy_a, dummy_l)
        params = init_params(jax.random.PRNGKey(0), dfeats, dflen)
        feat_meta = {
            "featurizer_config": args.compose_featurizer,
            "featurizer_step": fstep,
            "feature_layer": cfg_ssl.ssl.feature_layer,
            "cmvn": f_cmvn,
            "pca_dim": None if f_pca is None
            else int(f_pca.components.shape[0]),
            "pool_clusters": None if f_km is None else int(len(f_km)),
            "feature_dim": int(dfeats.shape[-1]),
        }
    else:
        params = init_params(jax.random.PRNGKey(0), dummy_a, dummy_l)
    sub = "best_ckpt" if cfg.train.restore_best else "ckpt"
    ckpt_dir = os.path.join(cfg.model_dir, sub)
    if cfg.train.restore_best and not os.path.isdir(ckpt_dir):
        # check BEFORE CheckpointManager's makedirs side effect, which
        # would defeat cli._infer's same guard on a later run
        raise SystemExit(
            f"train.restore_best: no {ckpt_dir} — was the run trained "
            "with gan.select_lm_path (unsupervised selection)?"
        )
    # match the training run's retention: this manager never saves, but
    # a max_to_keep below the run's would garbage-collect real
    # checkpoints if a save were ever added here (ADVICE r2)
    mgr = CheckpointManager(
        ckpt_dir, max_to_keep=max(cfg.train.keep_checkpoints, 1)
    )
    # checkpoints store a full TrainState / GANState; restore the
    # matching template and pull the model params out of it
    restored_params, step = _restore_params(
        cfg, mgr, params,
        feats_example=None if comp is None else (dfeats, dflen),
    )
    mgr.close()

    if args.streaming:
        return _export_streaming(cfg, args, restored_params, step)

    if comp is not None:
        inner_fn = fn

        def fn(params, audio, lengths):  # noqa: F811
            feats, flen = feat_fn(params["featurizer"], audio, lengths)
            return inner_fn(params["model"], feats, flen)

        params = {"featurizer": fparams, "model": params}
        restored_params = {"featurizer": fparams,
                           "model": restored_params}

    quant_meta = None
    if args.quantize in ("int8", "int8-compute"):
        from uasr.ops.quantize import (
            dequantize_tree, quantize_tree, quantized_bytes,
        )

        fp_fn = fn
        restored_params, n_q = quantize_tree(restored_params)
        if n_q == 0:
            raise SystemExit(
                "--quantize int8: no kernels large enough to quantize"
            )
        params, _ = quantize_tree(params)
        qb, fb = quantized_bytes(restored_params)

        def fn(qparams, audio, lengths):  # noqa: F811
            # dequantize to f32 — the dtype the checkpoint stores;
            # the model's own `dtype` handles bf16 compute casting
            return fp_fn(dequantize_tree(qparams), audio, lengths)

        quant_meta = {
            "scheme": (
                "int8_weight_per_channel_symmetric+int8_mxu_compute"
                if args.quantize == "int8-compute"
                else "int8_weight_per_channel_symmetric"
            ),
            "quantized_kernels": int(n_q),
            "params_bytes": int(qb),
            "float_equivalent_bytes": int(fb),
        }
        print(
            f"quantized {n_q} kernels: params {fb / 1e6:.1f} MB -> "
            f"{qb / 1e6:.1f} MB", file=sys.stderr,
        )

    exp = jexport.export(
        jax.jit(fn), platforms=args.platforms.split(","),
    )(params, a_spec, l_spec)
    os.makedirs(args.out, exist_ok=True)
    blob = exp.serialize()
    with open(os.path.join(args.out, "model.stablehlo"), "wb") as f:
        f.write(blob)

    pmgr = CheckpointManager(os.path.join(args.out, "params"), max_to_keep=1)
    pmgr.save(step, restored_params)
    pmgr.close()

    ids_shape = jax.eval_shape(fn, params, a_spec, l_spec)
    meta = {
        "audio_shape": [B, L],
        "sample_rate": cfg.frontend.sample_rate,
        "vocab_size": cfg.dim_output,
        "decode": (
            "features" if cfg.train.mode == "ssl"
            else "beam" if cfg.ctc.use_beam else "greedy"
        ),
        "beam_width": cfg.ctc.beam_width if cfg.ctc.use_beam else None,
        "lm_path": cfg.ctc.lm_path if cfg.ctc.use_beam else None,
        "platforms": args.platforms.split(","),
        "checkpoint_step": int(step),
        "output_shapes": [list(s.shape) for s in ids_shape],
        "composed_featurizer": feat_meta,
        "quantization": quant_meta,
        "params_pytree": (
            "dict with 'featurizer' and 'model' keys"
            if feat_meta is not None else "model params"
        ),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported step-{step} model ({len(blob)} bytes, "
          f"platforms {args.platforms}) -> {args.out}", file=sys.stderr)

    if args.check:
        reloaded = jexport.deserialize(blob)
        rng = np.random.RandomState(0)
        audio = (rng.randn(B, L) * 0.1).astype(np.float32)
        lens = np.full((B,), L, np.int32)
        got = reloaded.call(restored_params, audio, lens)
        want = jax.jit(fn)(restored_params, audio, lens)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        print("check ok: deserialized artifact matches the live forward",
              file=sys.stderr)
    return 0


def _export_streaming(cfg, args, restored_params, step):
    """Freeze the online chunk step (uasr.serve.StreamingRecognizer)
    as StableHLO. Writes:

      <out>/step.stablehlo    fn(params, state_tuple, chunk [B, S] f32)
                                -> (state_tuple, ids [B, K] i32,
                                    counts [B] i32)
      <out>/finish.stablehlo  fn(params, state_tuple)
                                -> (state_tuple, ids, counts)
      <out>/state0.npz        the initial state leaves (state_0..N —
                              a flat TUPLE of arrays, so a serving
                              process needs no uasr pytree types)
      <out>/params/           Orbax checkpoint of the parameters
      <out>/meta.json         chunk size, emit width, calling convention
    """
    import numpy as np
    from jax import export as jexport

    from uasr.checkpoint import CheckpointManager
    from uasr.serve import StreamingRecognizer

    if cfg.train.mode in ("ssl",):
        raise SystemExit("--streaming exports a decoding checkpoint, "
                         "not an ssl featurizer")
    if cfg.train.mode in ("gan", "eodm", "gan+eodm") and \
            cfg.gan.segmenter != "none":
        # segment pooling needs the whole utterance; merge_repeats
        # checkpoints DO stream exactly (the recognizer's merge
        # collapse reproduces the train-eval representation — round 4)
        raise SystemExit(
            "--streaming cannot serve gan.segmenter=kmeans recipes "
            "(segment pooling reads the whole utterance) — export the "
            "offline artifact instead"
        )
    quant_meta = None
    deq = lambda p: p  # noqa: E731
    live_params = restored_params
    if getattr(args, "quantize", None) in ("int8", "int8-compute"):
        from uasr.ops.quantize import (
            dequantize_tree, quantize_tree, quantized_bytes,
        )

        restored_params, n_q = quantize_tree(restored_params)
        if n_q == 0:
            raise SystemExit(
                "--quantize int8: no kernels large enough to quantize"
            )
        qb, fb = quantized_bytes(restored_params)
        deq = dequantize_tree
        # the live-side recognizer (--check reference) must BE the
        # quantized model, not the fp one
        live_params = jax.jit(dequantize_tree)(restored_params)
        quant_meta = {
            "scheme": "int8_weight_per_channel_symmetric",
            "quantized_kernels": int(n_q),
            "params_bytes": int(qb),
            "float_equivalent_bytes": int(fb),
        }
        print(f"quantized {n_q} kernels: params {fb / 1e6:.1f} MB -> "
              f"{qb / 1e6:.1f} MB", file=sys.stderr)

    rec = StreamingRecognizer(
        cfg, live_params, chunk_frames=args.chunk_frames,
        lookback_frames=args.lookback_frames,
        approx_context=args.approx_streaming,
    )
    B = args.batch
    cs = rec.chunk * cfg.frontend.frame_shift
    state0 = rec.init(B)
    flat0, treedef = jax.tree.flatten(state0)

    def step_flat(params, flat_state, chunk):
        st = jax.tree.unflatten(treedef, flat_state)
        st2, ids, counts = rec._step_impl(deq(params), st, chunk)
        return tuple(jax.tree.leaves(st2)), ids, counts

    def finish_flat(params, flat_state):
        st = jax.tree.unflatten(treedef, flat_state)
        st2, ids, counts = rec._finish_impl(deq(params), st)
        return tuple(jax.tree.leaves(st2)), ids, counts

    spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)  # noqa: E731
    p_spec = jax.tree.map(spec, restored_params)
    s_spec = tuple(spec(x) for x in flat0)
    c_spec = jax.ShapeDtypeStruct((B, cs), jax.numpy.float32)
    platforms = args.platforms.split(",")
    step_exp = jexport.export(jax.jit(step_flat), platforms=platforms)(
        p_spec, s_spec, c_spec
    )
    finish_exp = jexport.export(jax.jit(finish_flat), platforms=platforms)(
        p_spec, s_spec
    )

    os.makedirs(args.out, exist_ok=True)
    blobs = {}
    for name, exp in (("step", step_exp), ("finish", finish_exp)):
        blobs[name] = exp.serialize()
        with open(os.path.join(args.out, f"{name}.stablehlo"), "wb") as f:
            f.write(blobs[name])
    np.savez(os.path.join(args.out, "state0.npz"),
             **{f"state_{i}": np.asarray(x) for i, x in enumerate(flat0)})
    pmgr = CheckpointManager(os.path.join(args.out, "params"), max_to_keep=1)
    pmgr.save(step, restored_params)
    pmgr.close()
    meta = {
        "mode": "streaming",
        "decode": "beam" if rec.use_beam else "greedy",
        "collapse": rec.collapse,
        "approx_context": rec.approx,
        "beam_width": rec.beam_width if rec.use_beam else None,
        "streams": B,
        "chunk_samples": cs,
        "chunk_frames": rec.chunk,
        "lookback_frames": rec.lookback,
        "emit_width": rec.chunk // rec.subsample,
        "sample_rate": cfg.frontend.sample_rate,
        "vocab_size": cfg.dim_output,
        "state_leaves": len(flat0),
        "quantization": quant_meta,
        "platforms": platforms,
        "checkpoint_step": int(step),
        "calling_convention": (
            "state = tuple(npz[f'state_{i}'] ...); "
            "state, ids, counts = step.call(params, state, chunk); "
            "state, ids, counts = finish.call(params, state)"
        ),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported step-{step} STREAMING artifact "
          f"({len(blobs['step'])}+{len(blobs['finish'])} bytes, "
          f"platforms {args.platforms}) -> {args.out}", file=sys.stderr)

    if args.check:
        rng = np.random.RandomState(0)
        audio = (rng.randn(B, cs * 3) * 0.1).astype(np.float32)
        re_step = jexport.deserialize(blobs["step"])
        re_finish = jexport.deserialize(blobs["finish"])
        st_a = tuple(np.asarray(x) for x in flat0)
        st_b = rec.init(B)
        for k in range(3):
            chunk = audio[:, k * cs : (k + 1) * cs]
            st_a, ids_a, n_a = re_step.call(restored_params, st_a, chunk)
            st_b, ids_b, n_b = rec.step(st_b, chunk)
            np.testing.assert_array_equal(np.asarray(ids_a),
                                          np.asarray(ids_b))
            np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
        _, ids_a, n_a = re_finish.call(restored_params, st_a)
        _, ids_b, n_b = rec.finish(st_b)
        np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
        np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
        print("check ok: deserialized streaming artifact matches the live "
              "recognizer chunk-for-chunk", file=sys.stderr)
    return 0


def _restore_params(cfg, mgr, params_template, feats_example=None):
    """Restore model params out of whichever state type the run saved.
    train.average_checkpoints > 1 averages the newest N retained
    snapshots (checkpoint averaging) before export. `feats_example`
    ((feats [B, T, D], flen [B])): build the GAN template from
    precomputed features instead of frontend audio — cache-trained
    generators have feature-dim inputs."""
    import jax.numpy as jnp

    from uasr.train import TrainState

    def restore(template):
        if cfg.train.average_checkpoints > 1:
            from uasr.checkpoint import restore_averaged

            return restore_averaged(
                mgr, template, cfg.train.average_checkpoints
            )
        return mgr.restore_latest(template)

    mode = cfg.train.mode
    if mode in ("gan", "gan+eodm"):
        # generator params live in GANState.g_params; build a template
        # with matching structure (opt states restored then discarded)
        restored = restore(_gan_template(cfg, feats_example))
        if restored is None:
            raise SystemExit(f"no checkpoint to export under {mgr.directory}")
        gstate, step = restored
        return gstate.g_params, step
    from uasr.train import make_optimizer

    opt = make_optimizer(cfg)  # pytree structure must match the run's
    state = TrainState(jnp.zeros((), jnp.int32), params_template,
                       opt.init(params_template))
    restored = restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint to export under {mgr.directory}")
    st, step = restored
    return st.params, step


def _gan_template(cfg, feats_example=None):
    import numpy as np

    from uasr.data.dataset import Batch, TextBatch
    from uasr.train import GANTrainer

    gan = GANTrainer(cfg)
    if feats_example is not None:
        feats, flen = feats_example
        B = int(np.shape(feats)[0])
        batch = Batch(
            audio=np.asarray(feats, np.float32),
            audio_lengths=np.asarray(flen, np.int32),
            labels=np.ones((B, 4), np.int32),
            label_lengths=np.full((B,), 4, np.int32),
        )
    else:
        B = 2
        L = int(0.5 * cfg.frontend.sample_rate)
        rng = np.random.RandomState(0)
        batch = Batch(
            audio=(rng.randn(B, L) * 0.1).astype(np.float32),
            audio_lengths=np.full((B,), L, np.int32),
            labels=np.ones((B, 4), np.int32),
            label_lengths=np.full((B,), 4, np.int32),
        )
    text = TextBatch(np.ones((1, 2), np.int32), np.full((1,), 2, np.int32))
    import jax as _jax

    return gan.init_state(_jax.random.PRNGKey(0), batch, text)


if __name__ == "__main__":
    raise SystemExit(main())
