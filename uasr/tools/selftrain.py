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
import sys

import jax

import uasr  # noqa: F401  (import applies uasr._maybe_force_cpu)


def run_selftrain(cfg, teacher_dir: str, teacher_mode: str = "gan",
                  rounds: int = 1, conf_threshold: float = 0.0,
                  student_steps: int | None = None,
                  gold_list: str | None = None,
                  restore_best: bool = False,
                  init_from_teacher: bool = False) -> dict:
    """Pseudo-label cfg's train split with the teacher under
    ``teacher_dir`` and train a CTC student (the self-training /
    GAN→HMM refinement stage — SURVEY.md §3.2 lineage). Returns
    ``{"teacher_per", "student_per", "history", "student_dir"}``.

    ``cfg.ctc.use_viterbi`` switches pseudo-labeling to the
    LM-transition Viterbi decode (needs ``cfg.ctc.lm_path``).
    ``init_from_teacher`` fine-tunes the first student round from the
    teacher's weights instead of training from scratch (requires the
    student architecture to match the teacher's — for GAN/EODM
    teachers that means ``model.encoder: classifier``)."""
    import numpy as np

    from uasr.checkpoint import CheckpointManager
    from uasr.cli import _batches, _load_source
    from uasr.data.dataset import Batch, TextBatch
    from uasr.selftrain import (
        make_ctc_label_fn, make_gan_label_fn, self_train,
    )
    from uasr.train import CTCTrainer, GANTrainer, TrainState

    hmm = None
    if cfg.ctc.use_viterbi:
        # HMM-refined pseudo-labels (GAN→HMM lineage): teacher decodes
        # through the LM-transition Viterbi instead of greedy collapse
        import jax.numpy as jnp

        from uasr.ops.lm import load_lm
        from uasr.ops.viterbi import lm_hmm

        if not cfg.ctc.lm_path:
            raise SystemExit("ctc.use_viterbi needs ctc.lm_path (bigram)")
        hmm = tuple(jnp.asarray(a) for a in lm_hmm(
            load_lm(cfg.ctc.lm_path), cfg.ctc.blank_id,
            self_loop=cfg.ctc.viterbi_self_loop,
            blank_prob=cfg.ctc.viterbi_blank_prob,
        ))
        print("selftrain: Viterbi-LM pseudo-labeling enabled",
              file=sys.stderr)
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

    ckpt_dir = f"{teacher_dir}/best_ckpt" if restore_best \
        else f"{teacher_dir}/ckpt"
    mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
    first = next(_batches(cfg, ("examples", examples), num_epochs=1))
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
        else:
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
        label_fn = make_gan_label_fn(gen, g_params, hmm=hmm)
        teacher_eval = lambda batches: gen.evaluate_per(g_params, batches)
    else:
        tr = CTCTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), first)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        state, step = restored
        label_fn = make_ctc_label_fn(tr, state.params, hmm=hmm)
        teacher_eval = lambda batches: tr.evaluate(state.params, batches)
    mgr.close()
    print(f"teacher restored from {ckpt_dir} (step {step})",
          file=sys.stderr)

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
    )
    print(f"teacher PER={res['teacher_per']:.4f} "
          f"student PER={res['student_per']:.4f} ({args.rounds} rounds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
