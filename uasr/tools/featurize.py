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
                  batches=None, cmvn: bool = False,
                  pca_dim: int | None = None,
                  pool_clusters: int | None = None,
                  transforms_from: str | None = None,
                  sample_frames: int = 200_000) -> int:
    """Run the restored CPC model over a split and write the cache.
    Returns the number of utterances written.

    cmvn=True standardizes each utterance's features (zero mean / unit
    variance per dim) before writing — the downstream feature-cache
    path bypasses the audio frontend's CMVN entirely, and the
    unsupervised GAN is sensitive to input scale (measured on the
    synthetic corpus: held-out PER 0.62 raw vs 0.48 standardized,
    chance 0.83).

    pca_dim / pool_clusters implement the wav2vec-U prep between the
    SSL model and the GAN (Baevski et al. 2021; BASELINE config #5):
    PCA projection, then mean-pooling adjacent frames with equal
    k-means ids so the cache holds near-phone-rate features. Fitting
    is streaming (two passes over the split, O(D^2) memory); the
    fitted transforms are saved beside the cache (pca.npz /
    pool_kmeans.npz) and `transforms_from=<train dump dir>` reuses
    them for dev/test splits instead of refitting."""
    from uasr.checkpoint import CheckpointManager
    from uasr.data.cache import write_cache
    from uasr.data.dataset import Batch
    from uasr.pretrain import SSLTrainer

    layer = layer or cfg.ssl.feature_layer
    if layer not in ("context", "latents"):
        raise SystemExit(f"unknown feature layer {layer!r}")
    needs_fit = transforms_from is None and (pca_dim or pool_clusters)
    two_pass = bool(pca_dim or pool_clusters) and transforms_from is None

    def fresh_batches():
        from uasr.cli import _batches

        return _batches(cfg, source, num_epochs=1, drop_remainder=False)

    if batches is None:
        make_batches = fresh_batches
    elif two_pass:
        # caller-supplied iterator but fitting needs two passes:
        # materialize (test-scale path; recipes pass batches=None)
        batches = list(batches)
        make_batches = lambda: iter(batches)  # noqa: E731
    else:
        _once = [batches]
        make_batches = lambda: _once.pop()  # noqa: E731

    trainer = SSLTrainer(cfg)
    it = iter(make_batches())
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

    def raw_examples(batch_iter):
        n = 0
        for b in batch_iter:
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

    from uasr.data import transforms as T

    pca = km = None
    if transforms_from is not None:
        pca, km = T.load_transforms(transforms_from)
        if pca_dim and pca is None:
            raise SystemExit(
                f"--pca given but no {T.PCA_FILE} under {transforms_from}"
            )
        if pool_clusters and km is None:
            raise SystemExit(
                f"--pool-kmeans given but no {T.KMEANS_FILE} under "
                f"{transforms_from}"
            )
    elif needs_fit:
        # fit pass: streaming PCA moments + a uniform frame reservoir
        # for the pooling k-means (both O(1) in corpus length)
        import os

        from uasr.ops.segment import kmeans_fit

        acc = T.StreamingPCA() if pca_dim else None
        res = T.Reservoir(sample_frames, seed=0) if pool_clusters else None
        for _, f, _ in raw_examples(it):
            if acc is not None:
                acc.update(f)
            if res is not None:
                res.update(f)
        os.makedirs(out_dir, exist_ok=True)
        if acc is not None:
            pca = acc.finalize(pca_dim)
            pca.save(os.path.join(out_dir, T.PCA_FILE))
            print(
                "featurize: PCA fit on "
                f"{acc.n} frames -> {pca_dim} dims", file=sys.stderr,
            )
        if res is not None:
            sample = res.sample()
            if pca is not None:
                sample = pca(sample)
            km = kmeans_fit(sample, pool_clusters)
            T.save_kmeans(os.path.join(out_dir, T.KMEANS_FILE), km)
            print(
                f"featurize: pooling k-means fit on {len(sample)} frames "
                f"-> {pool_clusters} clusters", file=sys.stderr,
            )
        it = raw_examples(iter(make_batches()))  # write pass
    if not needs_fit:
        it = raw_examples(it)

    def transformed(ex_iter):
        for uid, f, ids in ex_iter:
            if pca is not None:
                f = pca(f)
            if km is not None:
                f = T.pool_adjacent(f, T.assign_clusters(f, km))
            yield (uid, f, ids)

    count = 0

    def counted():
        nonlocal count
        for ex in transformed(it):
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
    p.add_argument("--pca", type=int, default=None, metavar="DIM",
                   help="fit (streaming) and apply a PCA projection to "
                        "DIM dims — the wav2vec-U prep step")
    p.add_argument("--pool-kmeans", type=int, default=None, metavar="K",
                   help="fit k-means with K clusters (on a frame "
                        "reservoir, after any PCA) and mean-pool "
                        "adjacent frames with equal cluster id — the "
                        "wav2vec-U phone-rate pooling step")
    p.add_argument("--transforms-from", default=None, metavar="DIR",
                   help="reuse the PCA/k-means fitted by a previous "
                        "dump (point dev/test at the train dump dir) "
                        "instead of refitting")
    p.add_argument("--sample-frames", type=int, default=200_000,
                   help="reservoir size for the k-means fit")
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
    dump_features(cfg, source, args.out, layer=args.layer, cmvn=args.cmvn,
                  pca_dim=args.pca, pool_clusters=args.pool_kmeans,
                  transforms_from=args.transforms_from,
                  sample_frames=args.sample_frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
