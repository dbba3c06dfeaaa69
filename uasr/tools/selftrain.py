"""Self-training CLI (wav2vec-U refinement stage):

  python -m uasr.tools.selftrain -c recipe.yaml \
      --teacher-dir exp/timit_unsup --teacher-mode gan \
      --rounds 2 --conf-threshold 0.5 [--restore-best] [--set k=v ...]

Restores the teacher (GAN/EODM generator or CTC model) from
--teacher-dir (``--restore-best`` takes its label-free-selected
``best_ckpt`` instead of the latest — the right choice for a
``uasr-sweep`` winner), pseudo-labels the recipe's training audio,
trains a CTC student per round (student re-labels for the next round),
then reports teacher vs student PER on the dev split.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

import uasr  # noqa: F401  (import applies uasr._maybe_force_cpu)


def _build_hmm(cfg, probe_logits, probe_batches):
    """CTC-topology LM-HMM for Viterbi pseudo-labeling, with its
    dwell/blank rates calibrated from the TEACHER's greedy path over a
    few probe batches (ctc.viterbi_auto_rates; explicit non-default
    rates win — ops/viterbi.py::resolve_viterbi_rates). The calibration
    is what makes the HMM safe on segment-level (`gan.merge_repeats`)
    streams — see `uasr.ops.viterbi.estimate_hmm_rates`."""
    from uasr.ops.lm import load_lm
    from uasr.ops.viterbi import make_lm_decoder, resolve_viterbi_rates

    sl, bp, how = resolve_viterbi_rates(
        cfg.ctc, probe_logits, probe_batches
    )
    print(f"selftrain: Viterbi rates {how}: "
          f"self_loop={sl:.3f} blank_prob={bp:.3f}", file=sys.stderr)
    dec = make_lm_decoder(
        load_lm(cfg.ctc.lm_path), cfg.ctc.blank_id,
        self_loop=sl, blank_prob=bp,
    )
    print("selftrain: Viterbi-LM pseudo-labeling enabled",
          file=sys.stderr)
    return dec


def _invalidate_stale_students(cfg, teacher_ckpt_dir: str,
                               teacher_step: int, teacher_mode: str,
                               conf_threshold: float,
                               init_from_teacher: bool,
                               gold_list: str | None,
                               align_pseudo_labels: bool = False) -> None:
    """Wipe existing `selftrain_r*` student checkpoints when the
    labeling settings changed since they were trained.

    Rationale (ADVICE round 3): a rerun with a different teacher,
    threshold, or `--set-student` (e.g. enabling `ctc.use_viterbi`)
    would otherwise find a FINISHED student checkpoint, train 0 steps
    via restore-latest, and report a student actually trained on the
    OLD pseudo-labels. The digest covers the teacher identity/step and
    the full student config; identical settings keep resume intact.
    (`--rounds` / `--student-steps` stay out of the digest: growing
    either legitimately resumes the retained students.)"""
    import dataclasses
    import glob
    import hashlib
    import json
    import shutil

    meta = {
        "teacher": os.path.abspath(teacher_ckpt_dir),
        "teacher_step": teacher_step,
        "teacher_mode": teacher_mode,
        "conf_threshold": conf_threshold,
        "init_from_teacher": bool(init_from_teacher),
        "gold_list": gold_list,
        "align_pseudo_labels": bool(align_pseudo_labels),
        "config": dataclasses.asdict(cfg.replace(model_dir="")),
    }
    digest = hashlib.sha256(
        json.dumps(meta, sort_keys=True, default=str).encode()
    ).hexdigest()
    meta_path = os.path.join(cfg.model_dir, "selftrain_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f).get("digest")
        if old != digest:
            stale = sorted(glob.glob(
                os.path.join(cfg.model_dir, "selftrain_r*")))
            for d in stale:
                shutil.rmtree(d, ignore_errors=True)
            if stale:
                print(
                    "selftrain: labeling settings changed since the "
                    f"existing students were trained — wiped {stale} "
                    "(they held pseudo-labels from the old settings)",
                    file=sys.stderr,
                )
    os.makedirs(cfg.model_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump({"digest": digest, "meta": meta}, f, indent=1,
                  default=str)


def run_selftrain(cfg, teacher_dir: str, teacher_mode: str = "gan",
                  rounds: int = 1, conf_threshold: float = 0.0,
                  student_steps: int | None = None,
                  gold_list: str | None = None,
                  restore_best: bool = False,
                  init_from_teacher: bool = False,
                  full_length: bool = True,
                  align_pseudo_labels: bool = False) -> dict:
    """Pseudo-label cfg's train split with the teacher under
    ``teacher_dir`` and train a CTC student (the self-training /
    GAN→HMM refinement stage — SURVEY.md §3.2 lineage). Returns
    ``{"teacher_per", "student_per", "history", "student_dir"}``.

    ``cfg.ctc.use_viterbi`` switches pseudo-labeling to the
    LM-transition Viterbi decode (needs ``cfg.ctc.lm_path``).
    ``init_from_teacher`` fine-tunes the first student round from the
    teacher's weights instead of training from scratch (requires the
    student architecture to match the teacher's — for GAN/EODM
    teachers that means ``model.encoder: classifier``).

    ``full_length`` (default) lifts the recipe's frame/audio caps to
    the corpus maximum for this stage: a GAN recipe trained on short
    windows (e.g. ``data.max_frames: 24``) would otherwise TRUNCATE
    the utterances being labeled, trained on, and dev-scored — on the
    q9 protocol that truncation alone accounted for dev PER 0.196 vs
    0.015 (NOTES_ROUND4.md attribution). Pass ``--no-full-length`` to
    keep the recipe's caps."""
    import numpy as np

    from uasr.checkpoint import CheckpointManager
    from uasr.cli import _batches, _load_source
    from uasr.data.dataset import Batch, TextBatch
    from uasr.selftrain import (
        make_ctc_label_fn, make_gan_label_fn, self_train,
    )
    from uasr.train import CTCTrainer, GANTrainer, TrainState

    if cfg.ctc.use_viterbi and not cfg.ctc.lm_path:
        raise SystemExit("ctc.use_viterbi needs ctc.lm_path (bigram)")
    source, vocab = _load_source(cfg, "train")
    if cfg.vocab_size is None:
        cfg = cfg.replace(vocab_size=len(vocab))
    kind, payload = source
    if kind == "features":
        # SSL feature cache: materialize (feat [T, D], ids) directly —
        # the trainers' 3-dim branch bypasses the frontend
        payload = [(f, list(ids)) for _, f, ids in payload]
    elif kind != "examples":
        # materialize for repeated labeling passes (self-training rereads
        # the corpus every round; stream-once is the wrong tradeoff here)
        payload = [
            (b.audio[i, : b.audio_lengths[i]],
             b.labels[i, : b.label_lengths[i]].tolist())
            for b in _batches(cfg, source, num_epochs=1, drop_remainder=False)
            for i in range(len(b.audio_lengths))
        ]
    examples = payload

    if full_length and examples:
        import dataclasses

        if np.ndim(examples[0][0]) == 2:  # feature examples: frames
            max_t = max(len(f) for f, _ in examples)
            if cfg.data.max_frames < max_t:
                print(
                    "selftrain: lifting data.max_frames "
                    f"{cfg.data.max_frames} -> {max_t} so labeling/"
                    "training/eval see whole utterances "
                    "(--no-full-length keeps the recipe's cap)",
                    file=sys.stderr,
                )
                cfg = cfg.replace(data=dataclasses.replace(
                    cfg.data, max_frames=max_t))
        else:  # audio examples: samples
            max_s = max(len(a) for a, _ in examples)
            cap = int(cfg.data.max_audio_seconds
                      * cfg.frontend.sample_rate)
            if cap < max_s:
                secs = max_s / cfg.frontend.sample_rate
                print(
                    "selftrain: lifting data.max_audio_seconds "
                    f"{cfg.data.max_audio_seconds} -> {secs:.2f} "
                    "(--no-full-length keeps the recipe's cap)",
                    file=sys.stderr,
                )
                cfg = cfg.replace(data=dataclasses.replace(
                    cfg.data, max_audio_seconds=secs))

    ckpt_dir = f"{teacher_dir}/best_ckpt" if restore_best \
        else f"{teacher_dir}/ckpt"
    mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
    import itertools

    probe = list(itertools.islice(
        _batches(cfg, ("examples", examples), num_epochs=1), 4
    ))
    first = probe[0]
    if teacher_mode in ("gan", "eodm"):
        # the teacher generator is a classifier regardless of the
        # student recipe's model.encoder — deep-replace so the student
        # keeps its own architecture (a shallow cfg.replace() would
        # alias and mutate the shared ModelConfig)
        import dataclasses

        tcfg = cfg.replace(
            model=dataclasses.replace(cfg.model, encoder="classifier")
        )
        if teacher_mode == "gan":
            gan = GANTrainer(tcfg)
            text = TextBatch(np.ones((1, 2), np.int32),
                             np.full((1,), 2, np.int32))
            gstate = gan.init_state(jax.random.PRNGKey(0), first, text)
            restored = mgr.restore_latest(gstate)
            if restored is None:
                raise SystemExit(f"no checkpoint under {ckpt_dir}")
            gstate, step = restored
            gen, g_params = gan, gstate.g_params
        else:  # eodm
            # EODM checkpoints are TrainState(step, params, opt), not
            # GANState — restore with the matching trainer/template
            # (the n-gram tables are irrelevant for labeling; a dummy
            # sequence keeps construction cheap)
            from uasr.train import EODMTrainer

            eodm = EODMTrainer(tcfg, text_sequences=[[1, 2] * 8])
            estate = eodm.init_state(jax.random.PRNGKey(0), first)
            restored = mgr.restore_latest(estate)
            if restored is None:
                raise SystemExit(f"no checkpoint under {ckpt_dir}")
            estate, step = restored
            gen, g_params = eodm, estate.params

        def probe_logits(b):
            _, out_len, logits = gen._gen_probs(g_params, b)
            return logits, out_len

        label_maker = lambda hmm: make_gan_label_fn(
            gen, g_params, hmm=hmm, align_frames=align_pseudo_labels)
        teacher_eval = lambda batches: gen.evaluate_per(g_params, batches)
    else:
        tr = CTCTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), first)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        state, step = restored

        def probe_logits(b):
            feats, flen = tr._feats(b.audio, b.audio_lengths)
            return tr.model.apply(state.params, feats, flen)

        label_maker = lambda hmm: make_ctc_label_fn(
            tr, state.params, hmm=hmm, align_frames=align_pseudo_labels)
        teacher_eval = lambda batches: tr.evaluate(state.params, batches)
    mgr.close()
    print(f"teacher restored from {ckpt_dir} (step {step})",
          file=sys.stderr)
    hmm = _build_hmm(cfg, probe_logits, probe) \
        if cfg.ctc.use_viterbi else None
    label_fn = label_maker(hmm)

    _invalidate_stale_students(cfg, ckpt_dir, int(step), teacher_mode,
                               conf_threshold, init_from_teacher,
                               gold_list, align_pseudo_labels)

    def dev_batches_fn():
        dev_source, _ = _load_source(cfg, "dev")
        return _batches(cfg, dev_source, num_epochs=1, drop_remainder=False)

    has_dev = (cfg.data.synthetic or cfg.data.dev_list is not None
               or cfg.data.dev_feature_cache is not None)
    teacher_per = teacher_eval(dev_batches_fn()) if has_dev else float("nan")

    gold = []
    if gold_list:
        from uasr.data.dataset import ASRDataset

        gds = ASRDataset.from_file(gold_list, vocab,
                                   cfg.frontend.sample_rate)
        gold = [gds.example(i) for i in range(len(gds))]

    init_params = None
    if init_from_teacher:
        if teacher_mode in ("gan", "eodm") and \
                cfg.model.encoder != "classifier":
            raise SystemExit(
                "--init-from-teacher with a GAN/EODM teacher needs the "
                "student to keep model.encoder=classifier (the teacher "
                f"generator's architecture), got {cfg.model.encoder!r}"
            )
        init_params = g_params if teacher_mode in ("gan", "eodm") \
            else state.params
        print("selftrain: student initialized from the teacher",
              file=sys.stderr)

    trainer, st_state, history = self_train(
        cfg, label_fn, examples,
        rounds=rounds,
        conf_threshold=conf_threshold,
        steps_per_round=student_steps,
        gold=gold,
        init_params=init_params,
    )
    student_per = (
        trainer.evaluate(st_state.params, dev_batches_fn())
        if has_dev else float("nan")
    )
    return {
        "teacher_per": float(teacher_per),
        "student_per": float(student_per),
        "history": history,
        "student_dir": f"{cfg.model_dir}/selftrain_r{rounds - 1}",
    }


def main(argv=None):
    p = argparse.ArgumentParser("uasr.tools.selftrain", description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--teacher-dir", required=True)
    p.add_argument("--teacher-mode", default="gan",
                   choices=["gan", "eodm", "ctc"])
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--conf-threshold", type=float, default=0.0)
    p.add_argument("--student-steps", type=int, default=None)
    p.add_argument("--gold-list", default=None,
                   help="labeled utterances mixed into every student round")
    p.add_argument("--restore-best", action="store_true",
                   help="restore <teacher-dir>/best_ckpt (the label-free "
                        "selected snapshot, e.g. a uasr-sweep winner) "
                        "instead of the latest checkpoint")
    p.add_argument("--init-from-teacher", action="store_true",
                   help="fine-tune the first student round from the "
                        "teacher's weights instead of from scratch "
                        "(student must keep the teacher's architecture)")
    p.add_argument("--align-pseudo-labels", action="store_true",
                   help="forced-align each pseudo-label transcript "
                        "against the teacher's frame posteriors and "
                        "train the student with per-frame CE "
                        "(train.mode=frame_ce) instead of CTC — dense "
                        "targets carry the teacher's segmentation, so "
                        "scratch and cross-architecture students stop "
                        "paying the CTC realignment tax (round 5)")
    p.add_argument("--no-full-length", action="store_true",
                   help="keep the recipe's data.max_frames/"
                        "max_audio_seconds caps instead of lifting "
                        "them to the corpus maximum (by default this "
                        "stage labels/trains/evaluates whole "
                        "utterances even when the teacher trained on "
                        "short windows)")
    p.add_argument("--set", action="append", default=[])
    args = p.parse_args(argv)

    from uasr.cli import apply_overrides
    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    res = run_selftrain(
        cfg, args.teacher_dir, teacher_mode=args.teacher_mode,
        rounds=args.rounds, conf_threshold=args.conf_threshold,
        student_steps=args.student_steps, gold_list=args.gold_list,
        restore_best=args.restore_best,
        init_from_teacher=args.init_from_teacher,
        full_length=not args.no_full_length,
        align_pseudo_labels=args.align_pseudo_labels,
    )
    print(f"teacher PER={res['teacher_per']:.4f} "
          f"student PER={res['student_per']:.4f} ({args.rounds} rounds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
