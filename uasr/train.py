"""Training engine: jitted steps + loops for CTC, GAN, and EODM.

Reference call stacks rebuilt TPU-first (SURVEY.md §3.1-3.3):

  - the per-step hot path (frontend -> encoder -> loss -> grad -> Adam)
    is ONE jitted function per paradigm; the acoustic frontend runs
    inside it on device (the reference precomputed features on host);
  - data parallelism: the step is jitted over a ('data','model') mesh
    with the batch sharded on `data` and params replicated/model-
    sharded; GSPMD inserts the gradient psum (SURVEY.md §2.3);
  - eval (greedy decode + edit distance -> PER) also runs on device,
    only two scalars per batch come back to the host (the reference
    decoded on host every dev pass — its boundary #2);
  - GAN: D-steps and G-step are separate jitted functions alternated
    from the host loop, k D-steps per G-step, exactly the reference's
    alternation; WGAN-GP double-backward happens inside jit;
  - EODM: n-gram tables live on device as static gather indices.

Checkpoint cadence and restore-latest resume semantics follow the
reference (SURVEY.md §5).
"""

from __future__ import annotations

import itertools
import signal
import threading
import time
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uasr.checkpoint import CheckpointManager
from uasr.config import Config
from uasr.data.dataset import AlignedBatch, Batch, TextBatch
from uasr.frontend.features import compute_features, frontend_state_from_config
from uasr.frontend.specaugment import spec_augment
from uasr.metrics import MetricWriter, log_stdout
from uasr.models import PhoneClassifier, PhoneDiscriminator, build_model
from uasr.ops.ctc import ctc_loss
from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode
from uasr.ops.edit_distance import batch_edit_distance
from uasr.ops.eodm import device_ngram_tables
from uasr.ops.wgan import bce_d_loss_fn, bce_g_loss_fn, d_loss_fn, g_loss_fn
from uasr.parallel.mesh import make_mesh, shard_batch


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


class GANState(NamedTuple):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


# ------------------------------------------------------------ optimizer


def make_schedule(cfg: Config):
    t = cfg.train
    if t.lr_schedule == "constant":
        return optax.constant_schedule(t.lr)
    if t.lr_schedule == "warmup_rsqrt":

        def sched(step):
            step = jnp.maximum(step, 1)
            return t.lr * jnp.minimum(
                step / max(t.warmup_steps, 1),
                jnp.sqrt(max(t.warmup_steps, 1) / step),
            )

        return sched
    # warmup + exponential decay (reference: warmup_exponential_decay)
    def sched(step):
        warm = jnp.minimum(step / max(t.warmup_steps, 1), 1.0)
        decay = t.decay_rate ** (
            jnp.maximum(step - t.warmup_steps, 0) / max(t.decay_steps, 1)
        )
        return t.lr * warm * decay

    return sched


def make_optimizer(cfg: Config, lr=None, b1: float = 0.9, b2: float = 0.999):
    sched = make_schedule(cfg) if lr is None else lr
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(sched, b1=b1, b2=b2),
    )
    if cfg.train.grad_accum > 1:
        # gradient accumulation: k micro-batches average into one
        # optimizer update (effective batch = k x data.batch_size
        # without the HBM of the bigger batch). Mean-reduced losses
        # over equal micro-batch sizes make this EXACTLY one big-batch
        # step (tests/test_train_integration.py). Each trainer's
        # optimizer instance accumulates independently (GAN D/G each
        # count their own micro-steps).
        opt = optax.MultiSteps(opt, cfg.train.grad_accum)
    return opt


# ---------------------------------------------------------- CTC trainer


class CTCTrainer:
    """Supervised CTC training/eval (reference `main.py` loop,
    SURVEY.md §3.1), one jitted step, DP over the mesh."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.parallel.model_parallel
        )
        self.model = build_model(cfg.model, cfg.dim_output, mesh=self.mesh)
        self._frontend_state = None
        self.optimizer = make_optimizer(cfg)
        self._jit_cache: dict = {}
        # frame-CE mode: supervise per-frame phone posteriors with
        # forced alignments (reference ASR_align_DataSet, SURVEY.md
        # §2.2) instead of the CTC lattice
        self.frame_ce = cfg.train.mode == "frame_ce"

    @property
    def frontend_state(self):
        """Lazy: feature-cache runs (SSL input) never touch the audio
        frontend, so its artifacts (e.g. global-CMVN stats files) must
        not be required to exist for them."""
        if self._frontend_state is None:
            self._frontend_state = frontend_state_from_config(
                self.cfg.frontend
            )
        return self._frontend_state

    def _feats(self, audio, lengths):
        """[B, L] raw audio -> on-device frontend; [B, T, D] precomputed
        features (SSL cache, wav2vec-U stretch) pass through unchanged
        with `lengths` as frame counts."""
        if jnp.ndim(audio) == 3:
            return jnp.asarray(audio), jnp.asarray(lengths)
        return compute_features(
            jnp.asarray(audio), jnp.asarray(lengths),
            self.frontend_state, self.cfg.frontend,
        )

    def init_state(self, rng: jax.Array, example: Batch) -> TrainState:
        feats, flen = self._feats(example.audio, example.audio_lengths)
        params = self.model.init(rng, feats, flen)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
        )

    def _loss(self, params, batch: Batch, rng):
        fcfg = self.cfg.frontend
        feats, flen = self._feats(batch.audio, batch.audio_lengths)
        if fcfg.specaug_time_masks or fcfg.specaug_freq_masks:
            feats = spec_augment(rng, feats, flen, fcfg)
        logits, out_len = self.model.apply(params, feats, flen)
        if self.frame_ce:
            from uasr.models.models import encoder_time_subsample
            from uasr.ops.frame_ce import frame_accuracy, frame_ce_loss

            if not isinstance(batch, AlignedBatch):
                raise TypeError(
                    "train.mode=frame_ce needs AlignedBatch batches "
                    "(list files with an alignment column)"
                )
            # alignment labels arrive at the model-INPUT frame rate;
            # bring them to the logits rate. Raw audio passes through
            # the frontend (x downsample); precomputed-feature batches
            # ([B, T, D] — aligned pseudo-labels over an SSL cache,
            # round 5) bypass it, so only the encoder stride applies.
            total = encoder_time_subsample(self.cfg.model)
            if jnp.ndim(batch.audio) == 2:
                total *= self.cfg.frontend.downsample
            labels = batch.frame_labels[:, ::total]
            T = logits.shape[1]
            if labels.shape[1] < T:
                labels = jnp.pad(
                    labels, ((0, 0), (0, T - labels.shape[1])),
                    constant_values=-1,
                )
            loss = frame_ce_loss(logits, out_len, labels)
            acc = frame_accuracy(logits, out_len, labels)
            return loss, {"loss": loss, "frame_acc": acc}
        if self.cfg.ctc.use_pallas:
            from uasr.ops.pallas_ctc import ctc_loss_pallas

            per_utt = ctc_loss_pallas(
                logits, out_len, batch.labels, batch.label_lengths,
                blank_id=self.cfg.ctc.blank_id,
            )
        else:
            per_utt = ctc_loss(
                logits, out_len, batch.labels, batch.label_lengths,
                blank_id=self.cfg.ctc.blank_id,
            )
        loss = jnp.mean(per_utt)
        return loss, {"ctc_loss": loss, "loss": loss}

    def train_step(self, state: TrainState, batch: Batch, rng) -> tuple:
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), aux

    def eval_step(self, params, batch: Batch):
        """Greedy decode + edit distance fully on device -> (errors,
        ref tokens). PER = sum(err)/sum(ref)."""
        feats, flen = self._feats(batch.audio, batch.audio_lengths)
        logits, out_len = self.model.apply(params, feats, flen)
        if self.cfg.ctc.use_beam:
            hyps, hyp_len, _ = ctc_beam_search_decode(
                logits, out_len, self.cfg.ctc.beam_width, self.cfg.ctc.blank_id
            )
        else:
            hyps, hyp_len = ctc_greedy_decode(
                logits, out_len, self.cfg.ctc.blank_id
            )
        dist = batch_edit_distance(
            batch.labels, batch.label_lengths, hyps, hyp_len
        )
        return jnp.sum(dist), jnp.sum(batch.label_lengths)

    # ---- jit plumbing

    def jitted_train_step(self):
        # sharding follows the inputs: callers place batches with
        # parallel.shard_batch (data axis) and params via param_shardings;
        # GSPMD then inserts the grad psum. No in_shardings pin, so the
        # same step works single-device and on any mesh shape.
        if "train" not in self._jit_cache:
            self._jit_cache["train"] = jax.jit(
                self.train_step, donate_argnums=(0,)
            )
        return self._jit_cache["train"]

    def jitted_eval_step(self):
        if "eval" not in self._jit_cache:
            self._jit_cache["eval"] = jax.jit(self.eval_step)
        return self._jit_cache["eval"]

    def evaluate(self, params, batches: Iterator[Batch]) -> float:
        step = self.jitted_eval_step()
        errs, total = 0, 0
        for b in batches:
            # aligned batches carry a 5th (frame_labels) field the
            # decode-based eval doesn't need
            e, t = step(params, Batch(*map(jnp.asarray, b[:4])))
            errs += int(e)
            total += int(t)
        return errs / max(total, 1)


# ---------------------------------------------------------- GAN trainer


class GeneratorBase:
    """Shared machinery for trainers built on the PhoneClassifier
    generator (GAN / EODM): frontend, optional k-means segmental
    preprocessing, CTC-style repeat merge, and the output regularizers.
    One pathway so every unsupervised objective sees identical inputs."""

    def _init_generator(self, cfg: Config, centroids=None):
        self.cfg = cfg
        self.gen = PhoneClassifier(cfg.model, cfg.dim_output)
        self._frontend_state = None
        # wav2vec-U-style segmental preprocessing (SURVEY.md stretch
        # config): k-means centroids quantize frames; segments pool at
        # cluster changes before the generator
        self.centroids = None
        if cfg.gan.segmenter == "kmeans":
            if centroids is not None:
                self.centroids = jnp.asarray(centroids)
            elif cfg.gan.centroids_path:
                self.centroids = jnp.asarray(
                    np.load(cfg.gan.centroids_path)["centroids"]
                )
            else:
                raise ValueError(
                    "gan.segmenter=kmeans needs centroids (path or array)"
                )

    @property
    def frontend_state(self):
        """Lazy for the same reason as CTCTrainer.frontend_state."""
        if self._frontend_state is None:
            self._frontend_state = frontend_state_from_config(
                self.cfg.frontend
            )
        return self._frontend_state

    def _segment(self, feats, flen, batch: Batch):
        from uasr.ops.segment import kmeans_segment_frontend

        quant_feats = None
        if self.cfg.gan.segment_on_raw and batch.audio.ndim != 3:
            import dataclasses

            raw_cfg = dataclasses.replace(self.cfg.frontend, cmvn="none")
            quant_feats, _ = compute_features(
                batch.audio, batch.audio_lengths, self.frontend_state, raw_cfg
            )
        return kmeans_segment_frontend(
            feats, flen, self.centroids,
            self.cfg.gan.max_segments or None,
            mode_radius=self.cfg.gan.segment_mode_radius,
            quant_feats=quant_feats,
        )

    def _gen_feats(self, batch: Batch):
        if np.ndim(batch.audio) == 3:
            # precomputed features [B, T, D] (wav2vec-U stretch: external
            # SSL features via uasr.data.cache); lengths are frame counts
            feats = jnp.asarray(batch.audio)
            flen = jnp.asarray(batch.audio_lengths)
        else:
            feats, flen = compute_features(
                jnp.asarray(batch.audio), jnp.asarray(batch.audio_lengths),
                self.frontend_state, self.cfg.frontend,
            )
        if self.centroids is not None:
            feats, flen = self._segment(feats, flen, batch)
        return feats, flen

    def _gen_probs_full(self, g_params, batch: Batch):
        """Returns (raw frame posteriors, raw lengths, post-merge probs,
        post-merge lengths, post-merge logits). The raw view feeds the
        smoothness penalty, which must see the frame stream BEFORE the
        repeat merge erases the flicker it exists to punish."""
        feats, flen = self._gen_feats(batch)
        logits, out_len = self.gen.apply(g_params, feats, flen)
        raw_probs = jax.nn.softmax(logits, axis=-1)
        raw_len = out_len
        probs = raw_probs
        if self.cfg.gan.merge_repeats:
            from uasr.ops.segment import merge_repeats_drop_blank

            # CTC-style collapse before D/EODM (wav2vec-U's repeat merge
            # + blank junk sink); boundaries are stop-gradient, the
            # pooled probabilities stay differentiable. log(pooled) acts
            # as the merged logits (softmax(log p) == p on the simplex).
            probs, out_len = merge_repeats_drop_blank(
                probs, out_len, self.cfg.ctc.blank_id
            )
            logits = jnp.log(probs + 1e-8)
        return raw_probs, raw_len, probs, out_len, logits

    def _gen_probs(self, g_params, batch: Batch):
        _, _, probs, out_len, logits = self._gen_probs_full(g_params, batch)
        return probs, out_len, logits

    def _sup_ctc_term(self, g_params, labeled: Batch):
        """Frame-level supervised CTC on a (small) labeled batch — the
        semi-supervised mix-in's dedicated pathway (reference: tiny
        paired set mixed into the G loss, SURVEY.md §3.2). Runs the raw
        generator forward (no segment/merge): supervised CTC is defined
        on the frame stream."""
        feats, flen = self._gen_feats(labeled)
        logits, out_len = self.gen.apply(g_params, feats, flen)
        return jnp.mean(
            ctc_loss(
                logits, out_len, labeled.labels, labeled.label_lengths,
                blank_id=self.cfg.ctc.blank_id,
            )
        )

    def _entropy(self, probs, lengths):
        """Masked mean per-position entropy of posteriors [B, T, V]."""
        T = probs.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        ent = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)
        return jnp.sum(ent * mask) / jnp.maximum(jnp.sum(mask), 1)

    def _aux_penalties(self, probs, lengths, aux, loss,
                       raw_probs=None, raw_len=None):
        """Entropy (peakiness) + diversity (anti-collapse) + smoothness
        (anti-flicker, on the pre-merge frame stream) penalties."""
        g = self.cfg.gan
        if g.entropy_weight > 0:
            ent = self._entropy(probs, lengths)
            aux["g_entropy"] = ent
            loss = loss + g.entropy_weight * ent
        if g.diversity_weight > 0:
            T = probs.shape[1]
            mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
            mean_p = jnp.sum(probs * mask, axis=(0, 1)) / jnp.maximum(
                jnp.sum(mask), 1
            )
            div = -jnp.sum(mean_p * jnp.log(mean_p + 1e-8))
            aux["g_diversity"] = div
            loss = loss - g.diversity_weight * div
        if g.smoothness_weight > 0:
            p = probs if raw_probs is None else raw_probs
            plen = lengths if raw_probs is None else raw_len
            T = p.shape[1]
            # pair (t, t+1) valid iff t+1 < len
            pair_mask = jnp.arange(T - 1)[None, :] < (plen[:, None] - 1)
            sq = jnp.sum((p[:, 1:] - p[:, :-1]) ** 2, axis=-1)
            sm = jnp.sum(sq * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1)
            aux["g_smooth"] = sm
            loss = loss + g.smoothness_weight * sm
        return loss

    def decode_hyps(self, g_params, batches):
        """Greedy hypotheses for a stream of audio batches — label-free
        (feeds unsupervised LM-based model selection). Returns
        (list of per-utterance [T] id arrays, lens [N])."""
        if not hasattr(self, "_dec_jit"):

            def _dec(params, batch: Batch):
                probs, out_len, logits = self._gen_probs(params, batch)
                return ctc_greedy_decode(
                    logits, out_len, self.cfg.ctc.blank_id
                )

            self._dec_jit = jax.jit(_dec)
        hyps, lens = [], []
        for b in batches:
            h, hl = self._dec_jit(g_params, Batch(*map(jnp.asarray, b)))
            h, hl = np.asarray(h), np.asarray(hl)
            for i in range(h.shape[0]):  # per-utterance (batch T varies)
                hyps.append(h[i])
                lens.append(int(hl[i]))
        return hyps, np.asarray(lens)

    def evaluate_per(self, g_params, batches) -> float:
        """Frame/segment posteriors -> greedy collapse -> PER vs labels."""
        if not hasattr(self, "_eval_jit"):

            def _eval(params, batch: Batch):
                probs, out_len, logits = self._gen_probs(params, batch)
                hyps, hyp_len = ctc_greedy_decode(
                    logits, out_len, self.cfg.ctc.blank_id
                )
                dist = batch_edit_distance(
                    batch.labels, batch.label_lengths, hyps, hyp_len
                )
                return jnp.sum(dist), jnp.sum(batch.label_lengths)

            self._eval_jit = jax.jit(_eval)
        errs, total = 0, 0
        for b in batches:
            e, t = self._eval_jit(g_params, Batch(*map(jnp.asarray, b)))
            errs += int(e)
            total += int(t)
        return errs / max(total, 1)


class GANTrainer(GeneratorBase):
    """Adversarial unsupervised training (reference GAN loop,
    SURVEY.md §3.2): G = PhoneClassifier on acoustic features, D =
    conv critic over phone distributions, WGAN-GP, k D-steps per
    G-step, optional supervised CTC mix-in (semi-supervised)."""

    def __init__(self, cfg: Config, mesh=None, centroids=None):
        self._init_generator(cfg, centroids)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.parallel.model_parallel
        )
        self.disc = PhoneDiscriminator(cfg.model)

        def _lr(peak):
            # gan.use_lr_schedule: reuse train.lr_schedule's shape with
            # the GAN-specific peak rate
            if not cfg.gan.use_lr_schedule:
                return peak
            import dataclasses

            return make_schedule(
                cfg.replace(train=dataclasses.replace(cfg.train, lr=peak))
            )

        self.g_opt = make_optimizer(cfg, lr=_lr(cfg.gan.g_lr),
                                    b1=cfg.gan.adam_b1, b2=0.9)
        d_opt = make_optimizer(cfg, lr=_lr(cfg.gan.d_lr),
                               b1=cfg.gan.adam_b1, b2=0.9)
        if cfg.gan.d_weight_decay > 0:
            d_opt = optax.chain(
                optax.add_decayed_weights(cfg.gan.d_weight_decay), d_opt
            )
        self.d_opt = d_opt
        self._jit: dict = {}

    def init_state(self, rng, example_audio: Batch, example_text: TextBatch):
        r1, r2 = jax.random.split(rng)
        feats, flen = self._gen_feats(Batch(*map(jnp.asarray, example_audio)))
        g_params = self.gen.init(r1, feats, flen)
        real = jax.nn.one_hot(
            jnp.asarray(example_text.ids), self.cfg.dim_output
        )
        d_params = self.disc.init(r2, real, jnp.asarray(example_text.lengths))
        return GANState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_opt.init(g_params),
            d_opt=self.d_opt.init(d_params),
        )

    def _real_dist(self, ids: jax.Array) -> jax.Array:
        """One-hot real text, optionally smoothed toward uniform
        (gan.real_label_smooth; wav2vec-U's fix for the peakedness
        shortcut the critic otherwise exploits)."""
        V = self.cfg.dim_output
        real = jax.nn.one_hot(ids, V)
        s = self.cfg.gan.real_label_smooth
        if s > 0:
            real = real * (1.0 - s) + s / V
        return real

    def d_step(self, state: GANState, audio: Batch, text: TextBatch, rng):
        fake, fake_len, _ = self._gen_probs(state.g_params, audio)
        fake = jax.lax.stop_gradient(fake)
        real = self._real_dist(text.ids)

        d_fn = bce_d_loss_fn if self.cfg.gan.objective == "bce" else d_loss_fn

        def loss_fn(d_params):
            return d_fn(
                self.disc.apply, d_params, real, text.lengths,
                fake, fake_len, self.cfg.gan.lambda_gp, rng,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.d_params
        )
        # params arg required by add_decayed_weights (d_weight_decay)
        updates, d_opt = self.d_opt.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state._replace(d_params=d_params, d_opt=d_opt), aux

    def g_step(self, state: GANState, audio: Batch, rng,
               labeled: Batch | None = None):
        sup_w = self.cfg.gan.supervised_weight
        g_fn = bce_g_loss_fn if self.cfg.gan.objective == "bce" else g_loss_fn

        def loss_fn(g_params):
            raw_p, raw_len, fake, fake_len, logits = self._gen_probs_full(
                g_params, audio
            )
            score = self.disc.apply(state.d_params, fake, fake_len)
            loss = g_fn(score)
            aux = {"g_loss": loss}
            loss = self._aux_penalties(fake, fake_len, aux, loss,
                                       raw_probs=raw_p, raw_len=raw_len)
            if sup_w > 0:  # semi-supervised CTC mix-in
                if labeled is not None:
                    # dedicated small paired split (data.labeled_list):
                    # the unlabeled stream stays label-free
                    sup = self._sup_ctc_term(g_params, labeled)
                else:
                    # legacy/oracle path: labels ride on the audio
                    # batches themselves (synthetic ablations)
                    sup = jnp.mean(
                        ctc_loss(
                            logits, fake_len, audio.labels,
                            audio.label_lengths,
                            blank_id=self.cfg.ctc.blank_id,
                        )
                    )
                aux["sup_ctc"] = sup
                loss = loss + sup_w * sup
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        updates, g_opt = self.g_opt.update(grads, state.g_opt)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state._replace(
                step=state.step + 1, g_params=g_params, g_opt=g_opt
            ),
            aux,
        )

    def jitted(self, name):
        if name not in self._jit:
            self._jit[name] = jax.jit(getattr(self, name), donate_argnums=(0,))
        return self._jit[name]

# --------------------------------------------------------- EODM trainer


class EODMTrainer(GeneratorBase):
    """Output-distribution-matching training (reference EODM loop,
    SURVEY.md §3.3). Top-K n-gram tables are built once on the host
    from unpaired text and baked into the jitted step as gathers.
    Shares the generator pathway (frontend -> optional k-means
    segmentation -> PhoneClassifier -> optional repeat merge) with
    GANTrainer, so `gan.segmenter` / `gan.merge_repeats` / the output
    regularizers apply to standalone EODM runs too."""

    def __init__(self, cfg: Config, text_sequences, mesh=None, centroids=None):
        self._init_generator(cfg, centroids)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.parallel.model_parallel
        )
        self.optimizer = make_optimizer(cfg)
        self.tables = device_ngram_tables(cfg.eodm, text_sequences)
        self._jit: dict = {}

    @property
    def model(self):  # CTC-trainer-compatible alias (infer/selftrain)
        return self.gen

    def init_state(self, rng, example: Batch) -> TrainState:
        feats, flen = self._gen_feats(Batch(*map(jnp.asarray, example)))
        params = self.gen.init(rng, feats, flen)
        return TrainState(jnp.zeros((), jnp.int32), params, self.optimizer.init(params))

    def _loss(self, params, batch: Batch):
        from uasr.ops.eodm import eodm_loss

        raw_p, raw_len, probs, out_len, logits = self._gen_probs_full(
            params, batch
        )
        loss = self.cfg.eodm.weight * eodm_loss(
            logits, out_len, self.tables, k_chunk=self.cfg.eodm.k_chunk
        )
        aux = {"eodm_loss": loss}
        loss = self._aux_penalties(probs, out_len, aux, loss,
                                   raw_probs=raw_p, raw_len=raw_len)
        return loss, aux

    def train_step(self, state: TrainState, batch: Batch):
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), aux

    def jitted_train_step(self):
        if "train" not in self._jit:
            self._jit["train"] = jax.jit(self.train_step, donate_argnums=(0,))
        return self._jit["train"]


class GeneratorInfer(GeneratorBase):
    """Inference-side view of the unsupervised generator pathway.

    GAN/EODM checkpoints are trained and dev-eval'd on the FULL chain
    (frontend -> optional k-means segmentation -> PhoneClassifier ->
    optional repeat merge, `GeneratorBase._gen_probs_full`); decoding a
    restored checkpoint on anything else — e.g. the raw classifier over
    frame-rate features — scores a representation the model never saw.
    This class exposes that exact chain as a jit-friendly
    ``(params, audio, lengths) -> (logits, out_len)`` for
    `uasr.infer.run_inference` and `uasr.tools.export`, so train-loop
    PER, `--mode infer` PER, and the serving artifact agree
    (reference `--mode infer` decodes the trained model's own outputs,
    SURVEY.md §3.4)."""

    def __init__(self, cfg: Config, centroids=None):
        self._init_generator(cfg, centroids)

    def logits_fn(self, params, audio, lengths):
        B = audio.shape[0]
        batch = Batch(
            audio=audio,
            audio_lengths=lengths,
            labels=jnp.zeros((B, 1), jnp.int32),
            label_lengths=jnp.zeros((B,), jnp.int32),
        )
        _, _, _, out_len, logits = self._gen_probs_full(params, batch)
        return logits, out_len

    def init_params(self, rng, audio, lengths):
        """Init classifier params through the same feature chain (shapes
        stay D-invariant under segment pooling, but one pathway = zero
        drift)."""
        B = np.shape(audio)[0]
        batch = Batch(
            audio=jnp.asarray(audio),
            audio_lengths=jnp.asarray(lengths),
            labels=jnp.zeros((B, 1), jnp.int32),
            label_lengths=jnp.zeros((B,), jnp.int32),
        )
        feats, flen = self._gen_feats(batch)
        return self.gen.init(rng, feats, flen)


class BestCheckpointKeeper:
    """Best-metric checkpoint under `model_dir/best_ckpt`, with the
    crash-safe commit-before-score discipline: the checkpoint is
    committed BEFORE score.json is written, so a hard kill between the
    two can never persist a phantom best score that would block
    re-saving after resume (round-2 ADVICE finding). The recorded best
    survives preemption/resume for the same reason. Shared by the
    supervised loops (`train.keep_best`: dev PER, lower is better) and
    the label-free UnsupSelector (score, higher is better)."""

    def __init__(self, model_dir: str, higher_is_better: bool):
        import json
        import os

        self._sign = 1.0 if higher_is_better else -1.0
        self.ckpt = CheckpointManager(
            os.path.join(model_dir, "best_ckpt"), max_to_keep=1
        )
        self._score_path = os.path.join(model_dir, "best_ckpt", "score.json")
        self.best = -np.inf
        if os.path.exists(self._score_path):
            with open(self._score_path) as f:
                self.best = self._sign * float(json.load(f)["score"])

    def update(self, score: float, step: int, state) -> bool:
        if self._sign * score > self.best:
            import json

            self.best = self._sign * score
            self.ckpt.save(step, state)
            self.ckpt.wait()
            with open(self._score_path, "w") as f:
                json.dump({"score": float(score), "step": int(step)}, f)
            return True
        return False

    def close(self):
        self.ckpt.close()


class UnsupSelector:
    """Label-free checkpoint selection (wav2vec-U's validation trick):
    score dev-set GREEDY transcriptions by mean LM token log-prob minus
    KL(token usage || text unigram) — computable with zero transcripts —
    and keep the best-scoring checkpoint under `model_dir/best_ckpt`.
    The reference had no model selection beyond keep-latest; for
    unsupervised runs PER is unobservable, so this metric IS the
    stopping/selection criterion."""

    def __init__(self, cfg: Config):
        from uasr.ops.lm import load_lm, load_unigram

        self.lm = load_lm(cfg.gan.select_lm_path)
        V = cfg.dim_output
        if self.lm.shape not in ((V + 1, V), (V + 1, V + 1, V)):
            raise ValueError(
                f"gan.select_lm_path table shape {self.lm.shape} does not "
                f"match the model vocabulary ([{V + 1}, {V}] bigram or "
                f"[{V + 1}, {V + 1}, {V}] trigram expected) — was the LM "
                "built with `prepare lm` on this recipe's vocab?"
            )
        uni = load_unigram(cfg.gan.select_lm_path)
        if uni is None:  # older lm.npz without the unigram: start row
            uni = np.exp(self.lm[V] if self.lm.ndim == 2
                         else self.lm[V, V])
        self.unigram = uni
        self.kl_weight = cfg.gan.select_kl_weight
        self.coverage_weight = cfg.gan.select_coverage_weight
        self._keeper = BestCheckpointKeeper(
            cfg.model_dir, higher_is_better=True
        )

    def score(self, trainer, g_params, batches) -> dict:
        from uasr.ops.lm import unsup_selection_score

        hyps, lens = trainer.decode_hyps(g_params, batches)
        return unsup_selection_score(
            hyps, lens, self.lm, self.unigram, self.kl_weight,
            coverage_weight=self.coverage_weight,
        )

    @property
    def best(self) -> float:
        return self._keeper.best

    def update(self, score: float, step: int, state) -> bool:
        return self._keeper.update(score, step, state)

    def close(self):
        self._keeper.close()


class PreemptionGuard:
    """Preemption-safe checkpointing (SURVEY.md §5 "Failure detection"):
    on SIGTERM/SIGINT the training loop finishes the current step, saves,
    and exits cleanly — the reference's only recovery path was rerun +
    restore-latest, which this preserves while never losing more than one
    save interval."""

    def __init__(self):
        self.triggered = False
        self._prev: dict = {}
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev = signal.signal(sig, self._handle)
                except (ValueError, OSError):
                    continue
                # unwind a stale guard left by an earlier run in this
                # process that exited via an exception (close() never
                # ran): inherit ITS saved handler instead of chaining,
                # so Ctrl-C never traverses dead guards
                owner = getattr(prev, "__self__", None)
                if isinstance(owner, PreemptionGuard):
                    prev = owner._prev.get(sig, signal.SIG_DFL)
                self._prev[sig] = prev

    def _handle(self, signum, frame):
        self.triggered = True
        # a second signal interrupts hard (e.g. double Ctrl-C)
        prev = self._prev.get(signum)
        if prev is not None:
            signal.signal(signum, prev)

    def close(self):
        """Restore the previous handlers. Training loops call this on
        normal completion so sequential runs in one process (e.g.
        self-training rounds) don't chain stale guards — each stale link
        would swallow one Ctrl-C."""
        for sig, prev in self._prev.items():
            try:
                if signal.getsignal(sig) == self._handle:
                    signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev = {}


# -------------------------------------------------------------- loops


def _replicate_restored(state, mesh):
    """Checkpoint-restored arrays arrive COMMITTED to one device; a
    mesh-jitted train step over a sharded batch then fails with an
    incompatible-devices error (surfaced by the round-4
    preemption-mid-sweep test: GAN seed resume crashed on the 8-device
    mesh). Replicate the whole state over the trainer's mesh — the same
    rule run_inference applies to restored params."""
    if mesh is None or np.prod(list(mesh.shape.values())) == 1:
        return state
    from uasr.parallel.mesh import replicated

    return jax.device_put(state, replicated(mesh))


def run_ctc_training(
    cfg: Config,
    train_batches: Iterator[Batch],
    dev_batches_fn=None,
    trainer: CTCTrainer | None = None,
    state: TrainState | None = None,
) -> tuple[CTCTrainer, TrainState]:
    """The reference's epoch loop (SURVEY.md §3.1): train, periodic dev
    PER, periodic checkpoint, restore-latest resume."""
    trainer = trainer or CTCTrainer(cfg)
    writer = MetricWriter(cfg.model_dir, also_tensorboard=cfg.train.tensorboard)
    ckpt = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    rng = jax.random.PRNGKey(cfg.train.seed)
    train_it = iter(train_batches)
    first = next(train_it)
    train_it = itertools.chain([first], train_it)  # init peek, still trained on
    if state is None:
        state = trainer.init_state(rng, first)
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, start = restored
            state = _replicate_restored(state, trainer.mesh)
            log_stdout(start, "resume", restored_step=start)
    step_fn = trainer.jitted_train_step()
    keeper = None
    if cfg.train.keep_best:
        if dev_batches_fn is None:
            raise ValueError(
                "train.keep_best is set but there is no dev split to "
                "score (set data.dev_list) — best-PER tracking would be "
                "silently inert"
            )
        keeper = BestCheckpointKeeper(cfg.model_dir, higher_is_better=False)
    guard = PreemptionGuard()
    t0 = time.time()
    audio_sec_acc = 0.0
    for batch in train_it:
        step = int(state.step)
        if step >= cfg.train.total_steps or guard.triggered:
            if guard.triggered:
                log_stdout(step, "preempt", saving=1)
            break
        rng, sub = jax.random.split(rng)
        bt = AlignedBatch(*batch) if len(batch) == 5 else Batch(*batch)
        dev_batch = shard_batch(bt, trainer.mesh)
        state, aux = step_fn(state, dev_batch, sub)
        audio_sec_acc += float(
            np.sum(batch.audio_lengths) / cfg.frontend.sample_rate
        )
        step = int(state.step)
        if step % cfg.train.log_every == 0:
            jax.block_until_ready(state.params)
            dt = time.time() - t0
            writer.write(
                step, "train",
                loss=float(aux["loss"]),
                grad_norm=float(aux["grad_norm"]),
                audio_sec_per_sec=audio_sec_acc / max(dt, 1e-9),
                **({"frame_acc": float(aux["frame_acc"])}
                   if "frame_acc" in aux else {}),
            )
            log_stdout(step, "train", loss=float(aux["loss"]),
                       audio_sec_per_sec=audio_sec_acc / max(dt, 1e-9))
            t0, audio_sec_acc = time.time(), 0.0
        if dev_batches_fn and step % cfg.train.eval_every == 0:
            per = trainer.evaluate(state.params, dev_batches_fn())
            extra = {}
            if keeper is not None and keeper.update(per, step, state):
                extra["dev_best"] = per
            writer.write(step, "dev", per=per, **extra)
            log_stdout(step, "dev", per=per, **extra)
            t0, audio_sec_acc = time.time(), 0.0
        if step % cfg.train.save_every == 0:
            ckpt.save(step, state)
    ckpt.save(int(state.step), state)
    guard.close()
    ckpt.close()
    if keeper is not None:
        keeper.close()
    writer.close()
    return trainer, state


def run_gan_training(
    cfg: Config,
    audio_batches: Iterator[Batch],
    text_sequences,
    with_eodm: bool = False,
    dev_batches_fn=None,
    labeled_batches: Iterator[Batch] | None = None,
) -> tuple[GANTrainer, GANState]:
    """Reference GAN alternation loop (SURVEY.md §3.2): k D-steps per
    G-step, periodic dev PER, checkpoints. `with_eodm` adds the EODM
    n-gram loss to G's objective (joint mode the reference supported).
    `labeled_batches` (with gan.supervised_weight > 0) is the
    semi-supervised mix-in's small paired stream — frame-level CTC on
    it is added to every G step."""
    from uasr.data.dataset import text_batch_iterator
    from uasr.ops.eodm import eodm_loss

    trainer = GANTrainer(cfg)
    writer = MetricWriter(cfg.model_dir, also_tensorboard=cfg.train.tensorboard)
    ckpt = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    rng = jax.random.PRNGKey(cfg.train.seed)
    text_it = text_batch_iterator(
        text_sequences, cfg.data.batch_size, cfg.data.max_label_len,
        seed=cfg.train.seed,
    )
    audio_it = iter(audio_batches)
    first_a = next(audio_it)
    first_t = next(text_it)
    audio_it = itertools.chain([first_a], audio_it)  # init peeks, still trained on
    text_it = itertools.chain([first_t], text_it)
    state = trainer.init_state(rng, first_a, first_t)
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state, start = restored
        state = _replicate_restored(state, trainer.mesh)
        log_stdout(start, "resume", restored_step=start)

    tables = None
    if with_eodm:
        tables = device_ngram_tables(cfg.eodm, text_sequences)

        def g_step_eodm(state: GANState, audio: Batch, rng,
                        labeled: Batch | None = None):
            g_fn = (bce_g_loss_fn if cfg.gan.objective == "bce"
                    else g_loss_fn)

            def loss_fn(g_params):
                raw_p, raw_len, probs, out_len, logits = (
                    trainer._gen_probs_full(g_params, audio)
                )
                score = trainer.disc.apply(state.d_params, probs, out_len)
                g_l = g_fn(score)
                e_l = cfg.eodm.weight * eodm_loss(
                    logits, out_len, tables, k_chunk=cfg.eodm.k_chunk
                )
                loss = g_l + e_l
                aux = {"g_loss": g_l, "eodm_loss": e_l}
                loss = trainer._aux_penalties(probs, out_len, aux, loss,
                                              raw_probs=raw_p,
                                              raw_len=raw_len)
                if cfg.gan.supervised_weight > 0 and labeled is not None:
                    sup = trainer._sup_ctc_term(g_params, labeled)
                    aux["sup_ctc"] = sup
                    loss = loss + cfg.gan.supervised_weight * sup
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.g_params
            )
            updates, g_opt = trainer.g_opt.update(grads, state.g_opt)
            g_params = optax.apply_updates(state.g_params, updates)
            return (
                state._replace(
                    step=state.step + 1, g_params=g_params, g_opt=g_opt
                ),
                aux,
            )

        g_step = jax.jit(g_step_eodm, donate_argnums=(0,))
    else:
        g_step = trainer.jitted("g_step")
    d_step = trainer.jitted("d_step")

    selector = UnsupSelector(cfg) if cfg.gan.select_lm_path else None
    if selector is not None and dev_batches_fn is None:
        raise ValueError(
            "gan.select_lm_path is set but there is no dev split to score "
            "(set data.dev_list) — selection would be silently inert"
        )
    labeled_it = None
    if labeled_batches is not None:
        if cfg.gan.supervised_weight <= 0:
            raise ValueError(
                "labeled_batches provided but gan.supervised_weight is 0 "
                "— the semi-supervised mix-in would be silently inert"
            )
        labeled_it = iter(labeled_batches)
    guard = PreemptionGuard()
    mesh = trainer.mesh
    t0 = time.time()
    while int(state.step) < cfg.train.total_steps and not guard.triggered:
        d_aux = {}
        for _ in range(cfg.gan.disc_steps):
            a = shard_batch(Batch(*next(audio_it)), mesh)
            t = shard_batch(TextBatch(*next(text_it)), mesh)
            rng, sub = jax.random.split(rng)
            state, d_aux = d_step(state, a, t, sub)
        a = shard_batch(Batch(*next(audio_it)), mesh)
        rng, sub = jax.random.split(rng)
        if labeled_it is not None:
            lab = shard_batch(Batch(*next(labeled_it)), mesh)
            state, g_aux = g_step(state, a, sub, lab)
        else:
            state, g_aux = g_step(state, a, sub)
        step = int(state.step)
        if step % cfg.train.log_every == 0:
            scalars = {k: float(v) for k, v in {**d_aux, **g_aux}.items()}
            scalars["steps_per_sec"] = cfg.train.log_every / max(
                time.time() - t0, 1e-9
            )
            writer.write(step, "train", **scalars)
            log_stdout(step, "train", **scalars)
            t0 = time.time()
        if dev_batches_fn and step % cfg.train.eval_every == 0:
            # materialize once: PER and the selector share the stream
            # (dev is capped by train.dev_eval_batches upstream)
            dev = (list(dev_batches_fn()) if selector is not None
                   else dev_batches_fn())
            per = trainer.evaluate_per(state.g_params, dev)
            extra = {}
            if selector is not None:
                sel = selector.score(trainer, state.g_params, dev)
                extra = {"unsup_score": sel["score"],
                         "unsup_lm_lp": sel["lm_logprob_per_token"],
                         "unsup_usage_kl": sel["usage_kl"],
                         **({"unsup_coverage_kl": sel["coverage_kl"]}
                            if sel.get("coverage_kl") is not None else {})}
                if selector.update(sel["score"], step, state):
                    extra["unsup_best"] = sel["score"]
            writer.write(step, "dev", per=per, **extra)
            log_stdout(step, "dev", per=per, **extra)
            t0 = time.time()
        if step % cfg.train.save_every == 0:
            ckpt.save(step, state)
    ckpt.save(int(state.step), state)
    guard.close()
    ckpt.close()
    if selector is not None:
        selector.close()
    writer.close()
    return trainer, state


def run_eodm_training(
    cfg: Config,
    audio_batches: Iterator[Batch],
    text_sequences,
    dev_batches_fn=None,
) -> tuple[EODMTrainer, TrainState]:
    """Reference EODM loop (SURVEY.md §3.3)."""
    trainer = EODMTrainer(cfg, text_sequences)
    writer = MetricWriter(cfg.model_dir, also_tensorboard=cfg.train.tensorboard)
    ckpt = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    audio_it = iter(audio_batches)
    first = next(audio_it)
    audio_it = itertools.chain([first], audio_it)  # init peek, still trained on
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), first)
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state, start = restored
        state = _replicate_restored(state, trainer.mesh)
        log_stdout(start, "resume", restored_step=start)
    step_fn = trainer.jitted_train_step()
    selector = UnsupSelector(cfg) if cfg.gan.select_lm_path else None
    if selector is not None and dev_batches_fn is None:
        raise ValueError(
            "gan.select_lm_path is set but there is no dev split to score "
            "(set data.dev_list) — selection would be silently inert"
        )
    guard = PreemptionGuard()
    t0 = time.time()
    for batch in audio_it:
        if int(state.step) >= cfg.train.total_steps or guard.triggered:
            break
        state, aux = step_fn(state, shard_batch(Batch(*batch), trainer.mesh))
        step = int(state.step)
        if step % cfg.train.log_every == 0:
            writer.write(
                step, "train", eodm_loss=float(aux["eodm_loss"]),
                steps_per_sec=cfg.train.log_every / max(time.time() - t0, 1e-9),
            )
            log_stdout(step, "train", eodm_loss=float(aux["eodm_loss"]))
            t0 = time.time()
        if dev_batches_fn and step % cfg.train.eval_every == 0:
            dev = (list(dev_batches_fn()) if selector is not None
                   else dev_batches_fn())
            per = trainer.evaluate_per(state.params, dev)
            extra = {}
            if selector is not None:
                sel = selector.score(trainer, state.params, dev)
                extra = {"unsup_score": sel["score"],
                         "unsup_lm_lp": sel["lm_logprob_per_token"],
                         "unsup_usage_kl": sel["usage_kl"],
                         **({"unsup_coverage_kl": sel["coverage_kl"]}
                            if sel.get("coverage_kl") is not None else {})}
                if selector.update(sel["score"], step, state):
                    extra["unsup_best"] = sel["score"]
            writer.write(step, "dev", per=per, **extra)
            log_stdout(step, "dev", per=per, **extra)
            t0 = time.time()
        if step % cfg.train.save_every == 0:
            ckpt.save(step, state)
    ckpt.save(int(state.step), state)
    guard.close()
    ckpt.close()
    if selector is not None:
        selector.close()
    writer.close()
    return trainer, state
