"""CTC forced alignment: transcripts -> per-frame phone labels.

The reference's alignment-supervised pathway (`ASR_align_DataSet`,
SURVEY.md §2.2) consumed externally-produced Kaldi alignments
(`prepare import-ali`). This tool generates them inside the framework:
a trained CTC checkpoint Viterbi-aligns each utterance's transcript to
its frames (`uasr.ops.viterbi.ctc_forced_align`, fully on device) and
writes the list back with the 4th per-10ms-frame column that
`train.mode: frame_ce` consumes — closing the teacher-alignment ->
frame-CE-student distillation loop with no Kaldi in sight.

  python -m uasr.tools.align -c ctc.yaml --split train \
      --out exp/train_aligned.tsv

Alignment is computed at the logits rate and upsampled by the total
stride (frontend downsample x encoder stride) back to 10 ms frames —
the exact inverse of the frame-CE trainer's `labels[:, ::total]`
subsampling, so a frame-CE run on the written list sees precisely the
alignment the teacher produced.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

import uasr  # noqa: F401  (applies uasr._maybe_force_cpu)


def align_list(cfg, list_path: str, out_path: str,
               batch_size: int | None = None) -> dict:
    """Forced-align every utterance in `list_path`; write `out_path`
    with the alignment as the 4th column. Returns stats."""
    from uasr.checkpoint import CheckpointManager
    from uasr.data.dataset import ASRDataset, Batch
    from uasr.models.models import encoder_time_subsample
    from uasr.ops.viterbi import ctc_forced_align
    from uasr.train import CTCTrainer
    from uasr.vocab import load_vocab

    if cfg.train.mode not in ("ctc", "frame_ce"):
        raise SystemExit(
            "forced alignment needs a CTC-trained checkpoint "
            f"(train.mode is {cfg.train.mode!r}; align the selftrain/"
            "distilled student instead of a GAN generator)"
        )
    vocab = load_vocab(cfg.data.vocab_path)
    ds = ASRDataset.from_file(list_path, vocab, cfg.frontend.sample_rate)
    utts = ds.utts
    if not utts:
        raise SystemExit(f"{list_path}: empty list")
    B = batch_size or cfg.data.batch_size
    max_samples = int(cfg.data.max_audio_seconds * cfg.frontend.sample_rate)
    L = cfg.data.max_label_len

    trainer = CTCTrainer(cfg)
    total = cfg.frontend.downsample * encoder_time_subsample(cfg.model)

    @jax.jit
    def align_batch(params, batch: Batch):
        feats, flen = trainer._feats(batch.audio, batch.audio_lengths)
        logits, out_len = trainer.model.apply(params, feats, flen)
        frame_ids, score = ctc_forced_align(
            logits, out_len, batch.labels, batch.label_lengths,
            blank_id=cfg.ctc.blank_id,
        )
        return frame_ids, out_len, score

    # restore (latest or best) exactly as `--mode infer` would
    ckpt_dir = f"{cfg.model_dir}/ckpt"
    mgr = CheckpointManager(ckpt_dir, max_to_keep=cfg.train.keep_checkpoints)
    probe = Batch(
        audio=jnp.zeros((1, max_samples), jnp.float32),
        audio_lengths=jnp.asarray([max_samples]),
        labels=jnp.zeros((1, L), jnp.int32),
        label_lengths=jnp.asarray([1]),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), probe)
    restored = mgr.restore_latest(state)
    if restored is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    state, step = restored
    mgr.close()
    print(f"align: restored step {step}", file=sys.stderr)

    lines = []
    n_frames = 0
    score_sum = 0.0
    for start in range(0, len(utts), B):
        chunk = list(range(start, min(start + B, len(utts))))
        nb = len(chunk)
        labels = np.zeros((nb, L), np.int32)
        llen = np.zeros(nb, np.int64)
        alen = np.zeros(nb, np.int64)
        pad_a = np.zeros((nb, max_samples), np.float32)
        for i, j in enumerate(chunk):
            audio, ids = ds.example(j)
            audio = audio[:max_samples]
            ids = ids[:L]
            pad_a[i, : len(audio)] = audio
            alen[i] = len(audio)
            labels[i, : len(ids)] = ids
            llen[i] = len(ids)
        frame_ids, out_len, score = align_batch(
            state.params,
            Batch(
                jnp.asarray(pad_a), jnp.asarray(alen),
                jnp.asarray(labels), jnp.asarray(llen),
            ),
        )
        frame_ids = np.asarray(frame_ids)
        out_len = np.asarray(out_len)
        score = np.asarray(score)
        for i, j in enumerate(chunk):
            u = utts[j]
            T_i = int(out_len[i])
            # upsample logits-rate labels to 10 ms frames by repeating
            # each label `total` times — the exact inverse of the
            # frame-CE trainer's labels[:, ::total] subsample, so the
            # student sees precisely the teacher's alignment (a crop to
            # the nominal 10 ms frame count could clip the final token
            # when the encoder's length rounding pads upward)
            track = np.repeat(frame_ids[i, :T_i], total)
            toks = " ".join(vocab.tokens[j] for j in track)
            text = " ".join(u.tokens)
            lines.append(f"{u.utt_id}\t{u.wav_path}\t{text}\t{toks}")
            n_frames += len(track)
            score_sum += float(score[i])
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    stats = {
        "utts": len(lines),
        "frames": n_frames,
        "mean_logp_per_frame": score_sum / max(n_frames, 1),
    }
    print(
        f"align: wrote {stats['utts']} utterances -> {out_path} "
        f"(mean path logp/frame {stats['mean_logp_per_frame']:.3f})",
        file=sys.stderr,
    )
    return stats


def main(argv=None):
    p = argparse.ArgumentParser("uasr.tools.align", description=__doc__)
    p.add_argument("-c", "--config", required=True, help="CTC recipe YAML")
    p.add_argument("--split", default="train",
                   choices=["train", "dev", "test"],
                   help="which data.<split>_list to align")
    p.add_argument("--out", required=True, help="aligned list output path")
    p.add_argument("--batch", type=int, default=None,
                   help="override data.batch_size for alignment")
    p.add_argument("--set", action="append", default=[],
                   help="config override, e.g. --set model_dir=exp/ctc")
    args = p.parse_args(argv)

    from uasr.cli import apply_overrides
    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    if cfg.data.vocab_path is None:
        raise SystemExit("alignment needs data.vocab_path")
    if cfg.vocab_size is None:
        from uasr.vocab import load_vocab

        cfg = cfg.replace(vocab_size=len(load_vocab(cfg.data.vocab_path)))
    list_path = getattr(cfg.data, f"{args.split}_list")
    if list_path is None:
        raise SystemExit(f"recipe has no data.{args.split}_list")
    align_list(cfg, list_path, args.out, batch_size=args.batch)


if __name__ == "__main__":
    main()
