"""Online streaming transcription from the command line.

Serving-side driver for `uasr.serve.StreamingRecognizer`: restores a
trained CTC checkpoint and transcribes a list of utterances the way an
online service would — audio fed in fixed chunks, tokens emitted
incrementally (one-chunk latency), final transcript identical to the
offline `--mode infer` greedy decode (the parity contract tested in
tests/test_serve.py):

  python -m uasr.tools.stream -c recipe.yaml [--list data/test.tsv] \
      [--chunk-frames 64] [--batch 8] [--verbose]

Requires `frontend.cmvn: streaming` (the AISHELL streaming recipe) and
a streamable encoder: finite receptive field (cnn / classifier, window
replay, one-chunk latency) or causal recurrent (uni_gru, carried conv
tail + GRU state, zero right-context latency). Mixed-length
batches are safe: per-utterance lengths are passed to the recognizer,
so decoding freezes at each utterance's own end and batch zero-padding
is never transcribed. With --verbose the partial transcript is printed
after every chunk; the final lines are `utt_id\\ttokens` (real ids from
the list file), plus a PER summary when the list carries references.
With `ctc.use_beam` the partials are provisional greedy and the final
lines carry the complete beam transcript.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

import uasr  # noqa: F401  (applies uasr._maybe_force_cpu)


def _edit_distance(hyp: list, ref: list) -> int:
    """One hyp/ref pair through the shared host edit distance (the
    threaded C++ path infer.py's folded scoring uses, with its pure-
    Python fallback) — no third Levenshtein implementation."""
    from uasr.native import batch_edit_distance_native

    h = np.asarray([hyp or [0]], np.int32)
    r = np.asarray([ref or [0]], np.int32)
    return int(batch_edit_distance_native(
        r, np.array([len(ref)], np.int32),
        h, np.array([len(hyp)], np.int32),
    )[0])


def stream_list(cfg, utts, vocab, chunk_frames=None, batch=8,
                verbose=False, out=sys.stdout):
    """utts: list of (utt_id, audio[np float32], ref_ids or None).
    Streams in batches; returns (hyps dict, per or None)."""
    from uasr.checkpoint import CheckpointManager
    from uasr.data.dataset import Batch
    from uasr.serve import StreamingRecognizer
    from uasr.train import CTCTrainer

    trainer = CTCTrainer(cfg)
    C = chunk_frames or cfg.frontend.streaming_chunk_frames or 64
    cs = C * cfg.frontend.frame_shift
    # restore latest checkpoint (same contract as --mode infer)
    first_audio = np.zeros((1, cs), np.float32)
    state = trainer.init_state(
        jax.random.PRNGKey(0),
        Batch(first_audio, np.array([cs]), np.zeros((1, 1), np.int32),
              np.array([1])),
    )
    mgr = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    restored = mgr.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {cfg.model_dir}/ckpt")
    state, step = restored
    mgr.close()
    print(f"stream: restored step {step}", file=sys.stderr)
    params = jax.device_get(state.params)
    rec = StreamingRecognizer(cfg, params, chunk_frames=C)

    hyps: dict[str, list[int]] = {}
    errs = total = 0
    for s in range(0, len(utts), batch):
        group = utts[s : s + batch]
        B = len(group)
        L = max(len(a) for _, a, _ in group)
        L = -(-L // cs) * cs
        audio = np.zeros((B, L), np.float32)
        lens = np.zeros((B,), np.int64)
        for b, (_, a, _) in enumerate(group):
            audio[b, : len(a)] = a
            lens[b] = len(a)
        audio = jnp.asarray(audio)
        # per-utterance lengths: decoding freezes at each stream's own
        # audio end, so batch zero-padding is never decoded as speech
        # (matches offline --mode infer's length masking)
        st = rec.init(B, audio_lengths=lens)
        got: list[list[int]] = [[] for _ in range(B)]

        def collect(ids, counts):
            for b in range(B):
                got[b].extend(
                    int(x) for x in np.asarray(ids[b, : int(counts[b])])
                )

        for off in range(0, L, cs):
            st, ids, counts = rec.step(st, audio[:, off : off + cs])
            collect(ids, counts)
            if verbose:
                for b, (uid, _, _) in enumerate(group):
                    toks = " ".join(vocab.tokens[t] for t in got[b])
                    print(f"  [{uid} @ {off + cs} samples] {toks}",
                          file=sys.stderr)
        _, ids, counts = rec.finish(st)
        if rec.use_beam:
            # beam mode: the step() partials above were provisional
            # greedy; finish() carries the COMPLETE beam transcript
            got = [
                [int(x) for x in np.asarray(ids[b, : int(counts[b])])]
                for b in range(B)
            ]
            for b, (uid, _, _) in enumerate(group):
                if int(counts[b]) >= rec.max_tokens:
                    print(f"WARNING: {uid}: transcript hit the "
                          f"{rec.max_tokens}-token beam-prefix cap "
                          "(data.max_label_len) and was truncated",
                          file=sys.stderr)
        else:
            collect(ids, counts)
        for b, (uid, _, ref) in enumerate(group):
            hyps[uid] = got[b]
            print(f"{uid}\t{' '.join(vocab.tokens[t] for t in got[b])}",
                  file=out)
            if ref is not None:
                errs += _edit_distance(got[b], list(ref))
                total += len(ref)
    per = errs / total if total else None
    return hyps, per


def main(argv=None):
    from uasr.cli import _load_source, apply_overrides
    from uasr.config import load_config

    p = argparse.ArgumentParser("uasr.tools.stream", description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--list", help="TSV list to stream (default: the "
                                  "recipe's data.test_list / synthetic)")
    p.add_argument("--chunk-frames", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-utts", type=int, default=None)
    p.add_argument("--verbose", action="store_true",
                   help="print the partial transcript after every chunk")
    p.add_argument("--set", action="append", default=[], dest="overrides")
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    apply_overrides(cfg, args.overrides)
    if args.list:
        object.__setattr__(cfg.data, "test_list", args.list)
    # the tool materializes utterances (small serving demo sets), so
    # bypass the disk-streaming loader
    object.__setattr__(cfg.data, "streaming", False)
    source, vocab = _load_source(cfg, "test")
    kind, payload = source
    if cfg.vocab_size is None:
        cfg = cfg.replace(vocab_size=len(vocab))
    if kind == "features":
        raise SystemExit("streaming serving consumes raw audio, not a "
                         "feature cache")
    names = None
    lst = args.list or cfg.data.test_list
    if not cfg.data.synthetic and lst:
        from uasr.data.io import read_utterance_list

        names = [u.utt_id for u in read_utterance_list(lst)]
    utts = [
        ((names[i] if names else f"utt{i:05d}"), a, ids if ids else None)
        for i, (a, ids) in enumerate(payload)
    ]
    if args.max_utts:
        utts = utts[: args.max_utts]
    _, per = stream_list(cfg, utts, vocab, chunk_frames=args.chunk_frames,
                         batch=args.batch, verbose=args.verbose)
    if per is not None:
        print(f"PER={per:.4f} over {len(utts)} utterances", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
