"""Iterative self-training (wav2vec-U refinement stage).

The wav2vec-U recipe follows the adversarial stage with self-training:
pseudo-label the unlabeled audio with the current model, train a
standard CTC student on the pseudo-labels, optionally iterate with the
student as the new teacher (Baevski et al. 2021 §4.4; deferred from
round 1 — NOTES_ROUND1.md item 3, VERDICT round-1 item 8).

TPU-first: labeling is the jitted eval path (posteriors -> greedy
collapse fully on device; only ids/confidences return to host), and the
student is the ordinary CTCTrainer, so every stage reuses the hot paths.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uasr.config import Config
from uasr.data.dataset import Batch, batch_iterator, prefetch
from uasr.ops.decode import ctc_greedy_decode
from uasr.train import CTCTrainer, TrainState, run_ctc_training


def make_gan_label_fn(gan_trainer, g_params, hmm=None,
                      align_frames=False):
    """(audio Batch) -> (hyps, hyp_lens, confidence) from a GAN/EODM
    generator: posteriors over segments -> greedy collapse; confidence =
    masked mean max-posterior.

    `hmm` = (log_init, log_trans, emit_cols) from `uasr.ops.viterbi.
    lm_hmm`: pseudo-labels come from the LM-transition Viterbi path
    instead of greedy collapse — the GAN→HMM refinement step of the
    unsupervised lineage (the HMM repairs frames the raw generator gets
    wrong, so the CTC student trains on cleaner targets).

    `align_frames=True` additionally forced-aligns each pseudo-label
    transcript against the generator's RAW (pre-merge) frame posteriors
    (`ops.viterbi.ctc_forced_align`), returning
    (hyps, hyp_lens, conf, frame_ids [B, T_in], frame_lens) with the
    alignment track at the model-input frame rate — per-frame targets
    for a `train.mode: frame_ce` student of ANY architecture (round-5
    VERDICT item 2: a frame-level CTC student decodes through repeat
    collapse and inherits flicker noise a segment-merged teacher never
    shows; dense frame targets carry the teacher's dwell structure)."""

    @jax.jit
    def fn(batch: Batch):
        raw_probs, raw_len, probs, out_len, logits = (
            gan_trainer._gen_probs_full(g_params, batch)
        )
        blank = gan_trainer.cfg.ctc.blank_id
        hyps, hyp_len = _decode(logits, out_len, blank, hmm)
        conf = _mean_max(probs, out_len)
        if not align_frames:
            return hyps, hyp_len, conf
        from uasr.ops.viterbi import ctc_forced_align

        frame_ids, _ = ctc_forced_align(
            jnp.log(raw_probs + 1e-8), raw_len, hyps, hyp_len, blank
        )
        return hyps, hyp_len, conf, frame_ids, raw_len

    return fn


def make_ctc_label_fn(ctc_trainer: CTCTrainer, params, hmm=None,
                      align_frames=False):
    """(audio Batch) -> (hyps, hyp_lens, confidence) from a CTC model.
    Precomputed-feature batches ([B, T, D]) bypass the frontend via the
    trainer's `_feats` branch. `hmm`: see make_gan_label_fn.

    `align_frames=True`: see make_gan_label_fn — the alignment is
    forced at the encoder's logits rate and repeated back up by the
    encoder's total time stride so the track lands at the model-input
    frame rate (what a student of any architecture consumes)."""

    @jax.jit
    def fn(batch: Batch):
        feats, flen = ctc_trainer._feats(batch.audio, batch.audio_lengths)
        logits, out_len = ctc_trainer.model.apply(params, feats, flen)
        blank = ctc_trainer.cfg.ctc.blank_id
        hyps, hyp_len = _decode(logits, out_len, blank, hmm)
        conf = _mean_max(jax.nn.softmax(logits, -1), out_len)
        if not align_frames:
            return hyps, hyp_len, conf
        from uasr.models.models import encoder_time_subsample
        from uasr.ops.viterbi import ctc_forced_align

        frame_ids, _ = ctc_forced_align(
            logits, out_len, hyps, hyp_len, blank
        )
        stride = encoder_time_subsample(ctc_trainer.cfg.model)
        if jnp.ndim(batch.audio) == 2:
            stride *= ctc_trainer.cfg.frontend.downsample
        if stride > 1:
            frame_ids = jnp.repeat(frame_ids, stride, axis=1)
        return hyps, hyp_len, conf, frame_ids, out_len * stride

    return fn


def _decode(logits, out_len, blank_id, hmm):
    if hmm is None:
        return ctc_greedy_decode(logits, out_len, blank_id)
    if callable(hmm):  # a make_lm_decoder fn (bigram or trigram)
        hyps, hyp_len, _score = hmm(logits, out_len)
        return hyps, hyp_len
    from uasr.ops.viterbi import viterbi_lm_decode

    hyps, hyp_len, _score = viterbi_lm_decode(logits, out_len, hmm, blank_id)
    return hyps, hyp_len


def _existing_ckpt_step(ckpt_dir: str) -> int | None:
    """Newest retained Orbax step under `ckpt_dir` (numeric step
    subdirectories), without opening a manager (cheap, no side
    effects on retention)."""
    try:
        steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    except FileNotFoundError:
        return None
    return max(steps) if steps else None


def _mean_max(probs: jax.Array, lengths: jax.Array) -> jax.Array:
    T = probs.shape[1]
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    mx = jnp.max(probs, axis=-1)
    return jnp.sum(mx * mask, axis=1) / jnp.maximum(lengths, 1)


def pseudo_label(
    label_fn: Callable,
    examples: Sequence[tuple[np.ndarray, list[int]]],
    batch_size: int,
    max_audio_samples: int,
    max_label_len: int,
    conf_threshold: float = 0.0,
    min_labels: int = 1,
) -> tuple[list[tuple[np.ndarray, list[int]]], dict]:
    """Label every example with the teacher; keep those whose confidence
    clears the threshold. Returns (pseudo-labeled examples, stats)."""
    out = []
    confs = []
    it = batch_iterator(
        examples, batch_size, max_audio_samples, max_label_len,
        shuffle=False, drop_remainder=False, num_epochs=1,
    )
    idx = 0
    for batch in it:
        res = label_fn(Batch(*map(jnp.asarray, batch)))
        aligned = len(res) == 5
        if aligned:
            hyps, hyp_len, conf, frame_ids, frame_len = map(
                np.asarray, res
            )
        else:
            hyps, hyp_len, conf = map(np.asarray, res)
        B = len(hyp_len)
        for b in range(B):
            audio = batch.audio[b, : batch.audio_lengths[b]]
            ids = hyps[b, : hyp_len[b]].tolist()
            confs.append(float(conf[b]))
            if conf[b] >= conf_threshold and len(ids) >= min_labels:
                if aligned:
                    al = frame_ids[b, : frame_len[b]].tolist()
                    out.append((audio, ids, al))
                else:
                    out.append((audio, ids))
            idx += 1
    stats = {
        "labeled": len(out),
        "total": idx,
        "kept_frac": len(out) / max(idx, 1),
        "mean_conf": float(np.mean(confs)) if confs else 0.0,
    }
    return out, stats


def self_train(
    cfg: Config,
    label_fn: Callable,
    unlabeled: Sequence[tuple[np.ndarray, list[int]]],
    rounds: int = 1,
    conf_threshold: float = 0.0,
    dev_batches_fn=None,
    steps_per_round: int | None = None,
    gold: Sequence[tuple[np.ndarray, list[int]]] = (),
    init_params=None,
    log: Callable = print,
) -> tuple[CTCTrainer, TrainState, list[dict]]:
    """Iterate: pseudo-label -> CTC student -> student becomes teacher.

    `unlabeled` examples' label field is ignored (kept for the Batch
    shape). `gold` examples (the teacher's labeled pool, if any) are
    mixed into every student round — the standard semi-supervised setup;
    omit for the fully-unsupervised wav2vec-U flavor. `init_params`
    initializes the FIRST round's student from the teacher's weights
    (fine-tune instead of from-scratch — the HMM-refinement setup; the
    params must match the student architecture, e.g. a GAN generator
    into a `model.encoder: classifier` student); if round 0's directory
    already holds a checkpoint, that checkpoint is resumed and the
    teacher init is skipped. Returns the last student and per-round
    stats.

    When `label_fn` was built with `align_frames=True`, the pseudo-
    labeled examples are (audio, ids, frame_align) triples and every
    student round trains with `train.mode: frame_ce` on the teacher's
    forced-aligned per-frame targets instead of CTC on bare
    transcripts — the round-5 fix for scratch/cross-architecture
    students (VERDICT round-4 weak #1): dense targets carry the
    teacher's segmentation, so the student no longer has to rediscover
    alignment through the flicker-prone CTC pathway. Dev eval still
    decodes and scores PER, so teacher/student numbers stay comparable.
    """
    # feature examples ([T, D]) are measured in frames, audio in samples
    max_samples = (
        cfg.data.max_frames if np.ndim(unlabeled[0][0]) == 2
        else int(cfg.data.max_audio_seconds * cfg.frontend.sample_rate)
    )
    history = []
    trainer = state = None
    for r in range(rounds):
        labeled, stats = pseudo_label(
            label_fn, unlabeled, cfg.data.batch_size, max_samples,
            cfg.data.max_label_len, conf_threshold,
        )
        log(f"[selftrain] round {r}: kept {stats['labeled']}/{stats['total']} "
            f"(mean conf {stats['mean_conf']:.3f})")
        if not labeled:
            raise ValueError(
                "self-training kept 0 utterances; lower conf_threshold"
            )
        aligned = len(labeled[0]) == 3
        if aligned and gold:
            raise ValueError(
                "gold mix-in is not supported with frame-aligned "
                "pseudo-labels (gold utterances carry no alignment "
                "track); drop --gold-list or --align-pseudo-labels"
            )
        labeled = list(gold) + labeled
        import dataclasses

        round_cfg = cfg.replace(
            model_dir=f"{cfg.model_dir}/selftrain_r{r}"
        )
        if aligned:
            round_cfg = round_cfg.replace(
                train=dataclasses.replace(round_cfg.train,
                                          mode="frame_ce")
            )
        if steps_per_round is not None:
            round_cfg = round_cfg.replace(
                train=dataclasses.replace(
                    round_cfg.train, total_steps=steps_per_round
                )
            )
        if aligned:
            from uasr.data.dataset import aligned_batch_iterator

            max_track = max(len(al) for _a, _i, al in labeled)
            batches = prefetch(
                aligned_batch_iterator(
                    labeled, cfg.data.batch_size, max_samples,
                    cfg.data.max_label_len, max_track,
                    seed=cfg.train.seed + r,
                )
            )
        else:
            feats_corpus = np.ndim(labeled[0][0]) == 2
            if (feats_corpus and cfg.data.device_cache
                    and jax.device_count() == 1
                    and jax.default_backend() != "cpu"):
                # device-resident student corpus (round 5): same fix as
                # the GAN stage — one upload, per-step on-device
                # gathers instead of ~2 s/step of tunnel traffic at
                # V=39 shapes
                from uasr.data.cache import device_feature_batches

                batches = prefetch(
                    device_feature_batches(
                        labeled, cfg.data.batch_size, max_samples,
                        cfg.data.max_label_len,
                        seed=cfg.train.seed + r,
                    )
                )
            else:
                batches = prefetch(
                    batch_iterator(
                        labeled, cfg.data.batch_size, max_samples,
                        cfg.data.max_label_len, seed=cfg.train.seed + r,
                    )
                )
        if r == 0 and init_params is not None and \
                _existing_ckpt_step(f"{round_cfg.model_dir}/ckpt") is None:
            from uasr.parallel.mesh import replicated

            trainer = CTCTrainer(round_cfg)
            if trainer.mesh is not None:
                # checkpoint-restored teacher params arrive COMMITTED
                # to one device; the mesh-jitted train step needs them
                # replicated over the trainer's mesh (same rule as
                # run_inference's restore path)
                init_params = jax.device_put(
                    init_params, replicated(trainer.mesh)
                )
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=init_params,
                opt_state=trainer.optimizer.init(init_params),
            )
            trainer, state = run_ctc_training(
                round_cfg, batches, dev_batches_fn=dev_batches_fn,
                trainer=trainer, state=state,
            )
        else:
            # a prior (killed) run of this round left a checkpoint:
            # run_ctc_training's restore-latest resumes it instead of
            # discarding the completed student steps for a fresh
            # teacher re-init (ADVICE round 3)
            if r == 0 and init_params is not None:
                log("[selftrain] round 0: existing student checkpoint "
                    "found — resuming it (teacher init only seeds a "
                    "fresh directory)")
            trainer, state = run_ctc_training(
                round_cfg, batches, dev_batches_fn=dev_batches_fn
            )
        stats["round"] = r
        history.append(stats)
        # the student labels the next round (same labeling flavor)
        label_fn = make_ctc_label_fn(trainer, state.params,
                                     align_frames=aligned)
    return trainer, state, history
