"""CLI entry point: `python -m uasr.cli --config recipe.yaml --mode train|infer`.

Preserves the reference's flag surface (SURVEY.md L0: one entry script
per paradigm, `--config x.yaml [--mode train/infer]`); the paradigm
(ctc / gan / eodm / gan+eodm) comes from the recipe's `train.mode`, so
the reference's separate main scripts collapse into one binary plus
recipes (BASELINE.json: "train/infer entry points preserved").
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import jax

import uasr  # noqa: F401  (import applies uasr._maybe_force_cpu)


def _load_source(cfg, split: str):
    """Data source for a split: ("examples", list) for synthetic /
    materialized corpora, ("stream", StreamingASRDataset) when
    data.streaming — disk-backed, flat RSS, native per-batch decode,
    ("features", FeatureCache) when the split has a precomputed-feature
    cache (external SSL features — the wav2vec-U input).
    Returns (source, vocab)."""
    from uasr.data.dataset import ASRDataset, make_synthetic_dataset
    from uasr.vocab import load_vocab

    cache_dir = {
        "train": cfg.data.feature_cache,
        "dev": cfg.data.dev_feature_cache,
        "test": cfg.data.test_feature_cache,
        "labeled": cfg.data.labeled_feature_cache,
    }.get(split)
    if cache_dir:
        if cfg.train.mode == "frame_ce" and split != "test":
            # the TRAIN/DEV pathway needs alignments; inference from
            # cached features is fine (decoding needs no alignment)
            raise SystemExit(
                "train.mode=frame_ce needs per-frame alignments; "
                "feature caches carry none"
            )
        from uasr.data.cache import FeatureCache

        if cfg.data.vocab_path is None:
            raise SystemExit(
                f"data.{'' if split == 'train' else split + '_'}"
                "feature_cache needs data.vocab_path (tokens for "
                "text/scoring)"
            )
        return ("features", FeatureCache(cache_dir)), load_vocab(
            cfg.data.vocab_path
        )
    # alignment tracks are only consumed by the frame-CE train step;
    # infer/test always decodes, so the test split loads plain examples
    aligned = cfg.train.mode == "frame_ce" and split != "test"
    if cfg.data.synthetic:
        # distinct seed per split so dev/test are held-out strings
        n_utts = cfg.data.synthetic_num_utts
        if split in ("dev", "test") and cfg.data.synthetic_dev_utts:
            n_utts = cfg.data.synthetic_dev_utts
        examples, vocab = make_synthetic_dataset(
            num_utts=n_utts,
            num_phones=(cfg.vocab_size - 2) if cfg.vocab_size else 16,
            seed={"train": 0, "dev": 1, "test": 2}.get(split, 0),
            syntax=cfg.data.synthetic_syntax,
            min_len=cfg.data.synthetic_min_len,
            max_len=cfg.data.synthetic_max_len,
            with_alignments=aligned,
            style=cfg.data.synthetic_style,
        )
        if split == "labeled":
            # semi-sup mix-in: the labeled split is a small paired
            # subset of the train corpus (seed 0 above)
            examples = examples[: cfg.data.synthetic_labeled_utts]
        return ("examples", examples), vocab
    vocab = load_vocab(cfg.data.vocab_path)
    path = getattr(cfg.data, f"{split}_list")
    if path is None:
        raise SystemExit(f"recipe has no data.{split}_list")
    if cfg.data.streaming and not aligned and split != "labeled":
        # the labeled mix-in split is tiny by definition — materialize it
        # frame_ce falls through to the materialized path: the streaming
        # loader has no alignment track, and alignment-supervised corpora
        # are TIMIT-scale (forced alignments don't exist at stream scale)
        from uasr.data.loader import StreamingASRDataset

        ds = StreamingASRDataset.from_file(
            path, vocab, cfg.frontend.sample_rate
        )
        return ("stream", ds), vocab
    if aligned:
        from uasr.data.dataset import ASRAlignDataset

        ads = ASRAlignDataset.from_file(path, vocab, cfg.frontend.sample_rate)
        return ("examples", [
            ads.example_with_alignment(i) for i in range(len(ads))
        ]), vocab
    ds = ASRDataset.from_file(path, vocab, cfg.frontend.sample_rate)
    examples = [ds.example(i) for i in range(len(ds))]
    return ("examples", examples), vocab


def _batches(cfg, source, num_epochs="cfg", seed=0, drop_remainder=True,
             limit=None):
    from uasr.data.dataset import batch_iterator, prefetch

    if num_epochs == "cfg":
        num_epochs = cfg.data.num_epochs  # None = cycle forever
    max_samples = int(cfg.data.max_audio_seconds * cfg.frontend.sample_rate)
    boundaries = [
        int(s * cfg.frontend.sample_rate) for s in cfg.data.bucket_boundaries
    ]
    kind, payload = source
    if kind == "features":
        import jax

        from uasr.data.cache import (
            device_feature_batches, feature_batch_iterator,
        )

        # device-resident corpus: one upload, per-step on-device
        # gathers (round 5 — the per-step feature upload through the
        # tunnel dominated the V=39 GAN stage). Single-accelerator
        # runs only: on a dp>1 mesh the gathered batch would still
        # need resharding, and on CPU there is nothing to upload.
        if (cfg.data.device_cache and jax.device_count() == 1
                and jax.default_backend() != "cpu"):
            it = device_feature_batches(
                payload,
                batch_size=cfg.data.batch_size,
                max_frames=cfg.data.max_frames,
                max_label_len=cfg.data.max_label_len,
                seed=seed,
                num_epochs=num_epochs,
                drop_remainder=drop_remainder,
            )
        else:
            it = feature_batch_iterator(
                payload,
                batch_size=cfg.data.batch_size,
                max_frames=cfg.data.max_frames,
                max_label_len=cfg.data.max_label_len,
                seed=seed,
                num_epochs=num_epochs,
                drop_remainder=drop_remainder,
            )
    elif kind == "stream":
        it = payload.batches(
            batch_size=cfg.data.batch_size,
            max_audio_samples=max_samples,
            max_label_len=cfg.data.max_label_len,
            seed=seed,
            shuffle_buffer=cfg.data.shuffle_buffer,
            drop_remainder=drop_remainder,
            num_epochs=num_epochs,
            bucket_boundaries=boundaries,
            decode_threads=cfg.data.loader_threads,
        )
    elif kind == "examples" and payload and len(payload[0]) == 3:
        # (audio, ids, frame_align) triples -> frame-CE batches with the
        # alignment track padded to the max frontend frame count
        from uasr.data.dataset import aligned_batch_iterator

        fl, fs = cfg.frontend.frame_length, cfg.frontend.frame_shift
        it = aligned_batch_iterator(
            payload,
            batch_size=cfg.data.batch_size,
            max_audio_samples=max_samples,
            max_label_len=cfg.data.max_label_len,
            max_frames=max(1 + (max_samples - fl) // fs, 1),
            seed=seed,
            num_epochs=num_epochs,
            drop_remainder=drop_remainder,
        )
    else:
        # materialized examples may hold [T, D] features (selftrain over
        # an SSL cache) — lengths are then frames, not samples
        is_feats = bool(payload) and getattr(payload[0][0], "ndim", 1) == 2
        it = batch_iterator(
            payload,
            batch_size=cfg.data.batch_size,
            max_audio_samples=cfg.data.max_frames if is_feats
            else max_samples,
            max_label_len=cfg.data.max_label_len,
            seed=seed,
            drop_remainder=drop_remainder,
            num_epochs=num_epochs,
            bucket_boundaries=() if is_feats else boundaries,
        )
    if limit is not None:
        # cap BEFORE prefetch so the worker terminates instead of being
        # abandoned mid-queue by an islice on the consumer side
        it = itertools.islice(it, limit)
    return prefetch(it)


def main(argv=None):
    p = argparse.ArgumentParser("uasr", description=__doc__)
    p.add_argument("-c", "--config", required=True, help="YAML recipe")
    p.add_argument(
        "--mode", default="train", choices=["train", "infer"],
        help="train or restore-latest + decode",
    )
    p.add_argument("--set", action="append", default=[],
                   help="override, e.g. --set train.total_steps=100")
    args = p.parse_args(argv)

    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)

    source, vocab = _load_source(
        cfg, "train" if args.mode == "train" else "test"
    )
    if cfg.vocab_size is None:
        cfg = cfg.replace(vocab_size=len(vocab))

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.mode == "infer":
        return _infer(cfg, source, vocab)
    mode = cfg.train.mode
    if mode in ("ctc", "frame_ce"):
        return _train_ctc(cfg, source, vocab)
    if mode in ("gan", "gan+eodm"):
        return _train_gan(cfg, source, vocab, with_eodm="+eodm" in mode)
    if mode == "eodm":
        return _train_eodm(cfg, source, vocab)
    if mode == "ssl":
        return _train_ssl(cfg, source, vocab)
    raise SystemExit(f"unknown train.mode {mode!r}")


def apply_overrides(cfg, overrides: list[str]) -> None:
    """Apply ``key.path=value`` overrides in place, casting to the field's
    current type (bool/int/float/str, and comma-split sequences for
    tuple/list fields, e.g. ``--set data.bucket_boundaries=2,4,8``)."""
    for ov in overrides:
        if "=" not in ov:
            raise SystemExit(f"--set expects key=value, got {ov!r}")
        key, val = ov.split("=", 1)
        parts = key.split(".")
        obj = cfg
        try:
            for part in parts[:-1]:
                obj = getattr(obj, part)
            cur = getattr(obj, parts[-1])
        except AttributeError:
            raise SystemExit(f"--set {key}: no such config field") from None
        cast = type(cur) if cur is not None else _hint_cast(obj, parts[-1])
        try:
            if val.lower() in ("none", "null") and (
                cur is None or type(None) in _hint_args(obj, parts[-1])
            ):
                # only Optional-annotated fields: 'none' is a legitimate
                # STRING value elsewhere (e.g. frontend.cmvn=none)
                val = None
            elif cast is bool:
                val = val.lower() in ("1", "true", "yes")
            elif cast in (int, float):
                val = cast(val)
            elif cast in (tuple, list):
                val = cast(_scalar(v) for v in val.split(",") if v.strip())
        except ValueError:
            raise SystemExit(
                f"--set {key}: cannot parse {val!r} as {cast.__name__}"
            ) from None
        object.__setattr__(obj, parts[-1], val)


def _hint_args(obj, field: str) -> tuple:
    """Resolved members of the field's type annotation (union-flattened)."""
    import typing

    try:
        ann = typing.get_type_hints(type(obj)).get(field)
    except Exception:
        return ()
    return typing.get_args(ann) or (ann,)


def _hint_cast(obj, field: str):
    """Cast for a field whose current value is None: the first non-None
    member of its dataclass type annotation (so ``int | None = None``
    fields get int, not str — a str '3' crashes later in e.g. the
    epoch-count comparison of the batch iterator)."""
    for t in _hint_args(obj, field):
        if t is not type(None) and t in (bool, int, float, str, tuple, list):
            return t
    return str


def _scalar(s: str):
    """Best-effort element cast for --set sequence values."""
    s = s.strip()
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _lift_caps_for_split(cfg, source):
    """Return cfg with the data caps sized to `source`'s real maxima
    (train.dev_full_length): batching allocates to the caps, so a
    sentinel like 1<<30 is not an option — compute the split's actual
    max frames / samples / label length instead. Cheap for every
    source kind: feature caches hold small dev shards, the streaming
    loader already scanned num_samples and encoded labels, example
    lists are in memory."""
    import dataclasses

    import numpy as np

    kind, payload = source
    max_frames = cfg.data.max_frames
    max_sec = cfg.data.max_audio_seconds
    max_lab = cfg.data.max_label_len
    if kind == "features":
        for _, f, ids in payload:
            max_frames = max(max_frames, len(f))
            max_lab = max(max_lab, len(ids))
    elif kind == "stream":
        if len(payload):
            max_sec = max(
                max_sec,
                float(np.max(payload.num_samples))
                / cfg.frontend.sample_rate,
            )
            max_lab = max(max_lab, max(len(l) for l in payload.labels))
    else:  # materialized examples (synthetic / lists)
        for ex in payload:
            a, ids = ex[0], ex[1]
            if np.ndim(a) == 2:
                max_frames = max(max_frames, len(a))
            else:
                max_sec = max(max_sec,
                              len(a) / cfg.frontend.sample_rate)
            max_lab = max(max_lab, len(ids))
    # keep the recipe's bucket boundaries below the lifted cap and add
    # the cap itself as the catch-all bucket: only the long bucket pays
    # max-length padding, instead of every dev batch padding to the
    # split maximum (ADVICE round 4). Boundaries are seconds (audio
    # sources only; feature caches drop them at the call site).
    bounds = ()
    if cfg.data.bucket_boundaries:
        bounds = tuple(sorted(
            b for b in cfg.data.bucket_boundaries if b < max_sec
        )) + (max_sec,)
    return cfg.replace(data=dataclasses.replace(
        cfg.data, max_frames=max_frames, max_audio_seconds=max_sec,
        max_label_len=max_lab, bucket_boundaries=bounds,
    ))


def _dev_batches_fn(cfg, vocab):
    if (cfg.data.dev_list is None and cfg.data.dev_feature_cache is None
            and not cfg.data.synthetic):
        return None
    dev_source, _ = _load_source(cfg, "dev")
    if cfg.train.dev_full_length:
        # dev eval (PER, keep_best, the label-free selector) sees whole
        # utterances even when the recipe trains on short windows —
        # the round-4 truncation lesson applied at the source
        cfg = _lift_caps_for_split(cfg, dev_source)

    def fn():
        return _batches(cfg, dev_source, num_epochs=1, drop_remainder=False,
                        limit=cfg.train.dev_eval_batches)

    return fn


def _train_ctc(cfg, source, vocab):
    from uasr.train import run_ctc_training

    run_ctc_training(
        cfg,
        _batches(cfg, source, seed=cfg.train.seed),
        dev_batches_fn=_dev_batches_fn(cfg, vocab),
    )
    return 0


def _train_gan(cfg, source, vocab, with_eodm=False):
    from uasr.train import run_gan_training

    text = _load_text(cfg, source, vocab)
    labeled = None
    if cfg.gan.supervised_weight > 0 and (
        cfg.data.labeled_list or cfg.data.labeled_feature_cache
        or cfg.data.synthetic
    ):
        # semi-supervised mix-in: a dedicated small paired stream
        # (cycled forever), so the main split stays unlabeled. Batches
        # must be FULL-SIZE every step (the jitted g_step and GSPMD
        # batch sharding both want one static shape), so a labeled set
        # smaller than one batch wraps around to fill it.
        lab_source, _ = _load_source(cfg, "labeled")
        if lab_source[0] == "examples":
            ex = list(lab_source[1])
            if not ex:
                raise SystemExit("data.labeled_list is empty")
            while len(ex) < cfg.data.batch_size:
                ex = ex + ex
            lab_source = ("examples", ex)
        labeled = _batches(cfg, lab_source, num_epochs=None,
                           seed=cfg.train.seed + 1, drop_remainder=True)
    run_gan_training(
        cfg,
        _batches(cfg, source, seed=cfg.train.seed),
        text,
        with_eodm=with_eodm,
        dev_batches_fn=_dev_batches_fn(cfg, vocab),
        labeled_batches=labeled,
    )
    return 0


def _train_eodm(cfg, source, vocab):
    from uasr.train import run_eodm_training

    text = _load_text(cfg, source, vocab)
    run_eodm_training(
        cfg, _batches(cfg, source, seed=cfg.train.seed), text,
        dev_batches_fn=_dev_batches_fn(cfg, vocab),
    )
    return 0


def _train_ssl(cfg, source, vocab):
    """Contrastive pretraining over raw audio (`train.mode: ssl`);
    features for the downstream unsupervised stage are then dumped with
    `python -m uasr.tools.featurize`."""
    from uasr.pretrain import run_ssl_pretraining

    if source[0] == "features":
        raise SystemExit(
            "train.mode=ssl pretrains on RAW AUDIO; the split already "
            "has a feature cache configured"
        )
    run_ssl_pretraining(
        cfg,
        _batches(cfg, source, seed=cfg.train.seed),
        dev_batches_fn=_dev_batches_fn(cfg, vocab),
    )
    return 0


def _load_text(cfg, source, vocab):
    from uasr.data.dataset import TextDataset

    if cfg.data.text_path:
        return TextDataset.from_file(cfg.data.text_path, vocab).sequences
    # fall back to transcripts as "unpaired" text (synthetic / smoke runs)
    kind, payload = source
    if kind == "stream":
        return [ids for ids in payload.labels if ids]
    if kind == "features":
        return [list(ids) for _, _, ids in payload if len(ids)]
    return [ids for _, ids in payload if ids]


def _restore_for_eval(cfg, mgr, template):
    """restore_latest, or the averaged last-N when
    train.average_checkpoints > 1 (checkpoint averaging)."""
    if cfg.train.average_checkpoints > 1:
        from uasr.checkpoint import restore_averaged

        return restore_averaged(mgr, template, cfg.train.average_checkpoints)
    return mgr.restore_latest(template)


def _infer(cfg, source, vocab):
    from uasr.checkpoint import CheckpointManager
    from uasr.infer import run_inference
    from uasr.train import (
        CTCTrainer, GANTrainer, GeneratorInfer, TrainState,
    )

    if cfg.train.mode == "ssl":
        raise SystemExit(
            "ssl checkpoints have no decode path; dump features with "
            "`python -m uasr.tools.featurize` and train/infer a "
            "downstream recipe on the cache"
        )
    ckpt_dir = f"{cfg.model_dir}/ckpt"
    if cfg.train.restore_best:
        best = f"{cfg.model_dir}/best_ckpt"
        if not os.path.isdir(best):
            raise SystemExit(
                f"train.restore_best: no {best} — was the run trained "
                "with train.keep_best (supervised best-dev-PER) or "
                "gan.select_lm_path (unsupervised selection)?"
            )
        ckpt_dir = best
    mgr = CheckpointManager(
        ckpt_dir, max_to_keep=cfg.train.keep_checkpoints
    )
    first = next(_batches(cfg, source, num_epochs=1, drop_remainder=False))
    mode = cfg.train.mode
    logits_fn = None
    if mode in ("gan", "gan+eodm", "eodm"):
        # decode through the SAME representation chain the checkpoint
        # trained and dev-eval'd on: frontend -> optional k-means
        # segmentation -> classifier -> optional repeat merge. A raw
        # frame-rate model.apply here would silently score a different
        # input than training saw (round-2 VERDICT item 1).
        cfg.model.encoder = "classifier"
        logits_fn = GeneratorInfer(cfg).logits_fn
    if mode in ("gan", "gan+eodm"):
        # GAN-trained runs checkpoint a GANState; restore it and decode
        # the generator's posteriors (reference: greedy collapse of G)
        import numpy as np

        from uasr.data.dataset import TextBatch

        gan = GANTrainer(cfg)
        text = TextBatch(np.ones((1, 2), np.int32), np.full((1,), 2, np.int32))
        gstate = gan.init_state(jax.random.PRNGKey(0), first, text)
        restored = _restore_for_eval(cfg, mgr, gstate)
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        gstate, step = restored
        trainer = CTCTrainer(cfg)  # build_model('classifier') == G
        state = TrainState(
            gstate.step, gstate.g_params,
            trainer.optimizer.init(gstate.g_params),
        )
    else:
        # ctc and eodm both checkpoint a TrainState over their model
        trainer = CTCTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        restored = _restore_for_eval(cfg, mgr, state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        state, step = restored
    res = run_inference(
        cfg, trainer, state,
        _batches(cfg, source, num_epochs=1, drop_remainder=False),
        vocab=vocab,
        fold_timit=cfg.ctc.fold_timit,
        hyp_path=f"{cfg.model_dir}/hyp.txt",
        logits_fn=logits_fn,
    )
    folded = (
        f" PER_folded={res['per_folded']:.4f}" if "per_folded" in res else ""
    )
    avg = (
        f" (avg of last {cfg.train.average_checkpoints})"
        if cfg.train.average_checkpoints > 1 else ""
    )
    print(
        f"step {step}{avg}: PER={res['per']:.4f}{folded} "
        f"RTF={res['rtf']:.4f} ({res['audio_seconds']:.1f}s audio)"
    )
    mgr.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
