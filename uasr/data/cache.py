"""Optional precomputed-feature cache.

The reference converted all features to TFRecords before training
(`TFData.save/read`, SURVEY.md §2.2). In the rebuild features are
computed on device per batch, so no cache is *required*; this module
keeps the capability for the two cases where a cache still earns its
place (SURVEY.md L2a "retained only as an optional cache"):

  - externally-produced features (e.g. SSL/wav2vec features for the
    wav2vec-U stretch config, which are not derivable from the fused
    frontend), and
  - very slow storage where decoding wavs every epoch dominates.

Format: sharded .npz files, each holding `feat_<i>` float32 [T_i, D]
and `ids_<i>` int32 label arrays, plus an index json.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

import numpy as np


def write_cache(
    out_dir: str,
    examples: Iterator[tuple[str, np.ndarray, Sequence[int]]],
    shard_size: int = 512,
) -> None:
    """examples: iterator of (utt_id, feats [T, D], label_ids)."""
    os.makedirs(out_dir, exist_ok=True)
    index = []
    shard: dict[str, np.ndarray] = {}
    shard_utts: list[str] = []
    shard_idx = 0

    def flush():
        nonlocal shard, shard_utts, shard_idx
        if not shard_utts:
            return
        path = os.path.join(out_dir, f"shard_{shard_idx:05d}.npz")
        np.savez_compressed(path, **shard)
        index.append({"path": os.path.basename(path), "utts": shard_utts})
        shard, shard_utts = {}, []
        shard_idx += 1

    for utt_id, feat, ids in examples:
        i = len(shard_utts)
        shard[f"feat_{i}"] = np.asarray(feat, np.float32)
        shard[f"ids_{i}"] = np.asarray(list(ids), np.int32)
        shard_utts.append(utt_id)
        if len(shard_utts) >= shard_size:
            flush()
    flush()
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f)


class FeatureCache:
    """Reader over a cache directory; iterates (utt_id, feat, ids)."""

    def __init__(self, directory: str):
        self.directory = directory
        with open(os.path.join(directory, "index.json")) as f:
            self.index = json.load(f)
        self.utts = [
            (s, i) for s, rec in enumerate(self.index)
            for i in range(len(rec["utts"]))
        ]
        self._shard_cache: dict[int, np.lib.npyio.NpzFile] = {}

    def __len__(self):
        return len(self.utts)

    def _shard(self, s: int):
        if s not in self._shard_cache:
            self._shard_cache[s] = np.load(
                os.path.join(self.directory, self.index[s]["path"])
            )
        return self._shard_cache[s]

    def example(self, i: int) -> tuple[str, np.ndarray, list[int]]:
        s, j = self.utts[i]
        z = self._shard(s)
        return (
            self.index[s]["utts"][j],
            z[f"feat_{j}"],
            z[f"ids_{j}"].tolist(),
        )

    def __iter__(self):
        for i in range(len(self)):
            yield self.example(i)


def feature_batch_iterator(
    cache: "FeatureCache",
    batch_size: int,
    max_frames: int,
    max_label_len: int,
    seed: int = 0,
    num_epochs: int | None = None,
    shuffle: bool = True,
    drop_remainder: bool = True,
):
    """Padded feature batches straight from a cache (the wav2vec-U
    stretch path: train the GAN on external SSL features). Yields
    `Batch`-compatible tuples with `audio` holding [B, T, D] features
    and `audio_lengths` holding frame counts — the trainers detect the
    3D layout and skip the frontend."""
    import numpy as np

    from uasr.data.dataset import Batch

    D = cache.example(0)[1].shape[1]
    rng = np.random.RandomState(seed)
    epoch = 0

    def _make(idxs):
        B = len(idxs)
        feats = np.zeros((B, max_frames, D), np.float32)
        flen = np.zeros((B,), np.int32)
        labels = np.zeros((B, max_label_len), np.int32)
        llen = np.zeros((B,), np.int32)
        for j, i in enumerate(idxs):
            _, f, ids = cache.example(int(i))
            n = min(len(f), max_frames)
            feats[j, :n] = f[:n]
            flen[j] = n
            u = min(len(ids), max_label_len)
            labels[j, :u] = ids[:u]
            llen[j] = u
        return Batch(feats, flen, labels, llen)

    while num_epochs is None or epoch < num_epochs:
        order = np.arange(len(cache))
        if shuffle:
            rng.shuffle(order)
        stop = len(order) if not drop_remainder else (
            len(order) - batch_size + 1
        )
        for s in range(0, max(stop, 0), batch_size):
            yield _make(order[s : s + batch_size])
        epoch += 1


def device_feature_batches(
    cache,
    batch_size: int,
    max_frames: int,
    max_label_len: int,
    seed: int = 0,
    num_epochs: int | None = None,
    shuffle: bool = True,
    drop_remainder: bool = True,
):
    """`feature_batch_iterator` with the corpus RESIDENT ON DEVICE
    (round 5): the padded [N, T, D] feature corpus is uploaded once and
    every batch is one jitted on-device row gather — per step the host
    ships only the [B] index vector.

    Motivation (measured, BASELINE.md round 5): through the
    remote-tunneled v5e the host->device path moves ~32 MB/s, so the
    V=39 pipeline's 67 MB feature batches cost ~2.1 s of upload PER
    STEP — 20x the GAN step's compute. The one-time corpus upload
    (~2.4 GB at V=39 scale) costs ~75 s and amortizes over every epoch.
    The pad target is the CORPUS max (clamped to `max_frames`), so the
    batches are a single static shape — one compile, no bucket retraces.
    """
    import jax
    import jax.numpy as jnp

    from uasr.data.dataset import Batch

    # `cache` is a FeatureCache OR a materialized list of
    # (feat [T, D], ids) pairs (the selftrain student corpus)
    if isinstance(cache, (list, tuple)):
        get = lambda i: cache[i]  # noqa: E731
    else:
        get = lambda i: cache.example(i)[1:]  # noqa: E731
    N = len(cache)
    D = get(0)[0].shape[1]
    tmax = 1
    for i in range(N):
        tmax = max(tmax, len(get(i)[0]))
    tmax = min(tmax, max_frames)
    feats = np.zeros((N, tmax, D), np.float32)
    flen = np.zeros((N,), np.int32)
    labels = np.zeros((N, max_label_len), np.int32)
    llen = np.zeros((N,), np.int32)
    for i in range(N):
        f, ids = get(i)
        n = min(len(f), tmax)
        feats[i, :n] = f[:n]
        flen[i] = n
        u = min(len(ids), max_label_len)
        labels[i, :u] = ids[:u]
        llen[i] = u
    corpus = tuple(jax.device_put(x) for x in (feats, flen, labels, llen))
    del feats, labels

    @jax.jit
    def gather(corpus, idx):
        return tuple(jnp.take(x, idx, axis=0) for x in corpus)

    rng = np.random.RandomState(seed)
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = np.arange(N)
        if shuffle:
            rng.shuffle(order)
        stop = N if not drop_remainder else N - batch_size + 1
        for s in range(0, max(stop, 0), batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size and not drop_remainder:
                # static shapes: pad the final partial batch by
                # repeating row 0 with zero valid lengths
                pad = np.zeros(batch_size - len(idx), np.int64)
                full = np.concatenate([idx, pad])
                f, fl, la, ll = gather(corpus, jnp.asarray(full))
                mask = (jnp.arange(batch_size) < len(idx))
                yield Batch(f, jnp.where(mask, fl, 0), la,
                            jnp.where(mask, ll, 0))
            else:
                yield Batch(*gather(corpus, jnp.asarray(idx)))
        epoch += 1
