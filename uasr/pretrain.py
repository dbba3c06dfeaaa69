"""Self-supervised pretraining engine (`train.mode: ssl`).

Beyond the reference (SURVEY.md §2.2 "Recipes" / BASELINE config #5:
the wav2vec-U-style stretch consumed externally-produced SSL features;
the reference had no way to make them): CPC/wav2vec-style contrastive
pretraining over raw unlabeled audio, sharing the framework's loader,
mesh, checkpointing, preemption, and metric plumbing. The products are
(a) a checkpoint under model_dir/ckpt and (b) features dumped by
uasr.tools.featurize into the standard feature cache consumed by the
GAN/EODM trainers (`data.feature_cache`).

The hot path is ONE jitted step: conv encoder + causal GRU + K
prediction heads + InfoNCE over sampled in-utterance negatives — all
static shapes, all MXU GEMMs apart from the GRU scan.
"""

from __future__ import annotations

import itertools
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uasr.checkpoint import CheckpointManager
from uasr.config import Config
from uasr.data.dataset import Batch
from uasr.metrics import MetricWriter, log_stdout
from uasr.models.ssl import CPCModel
from uasr.ops.infonce import info_nce_loss, sample_negatives
from uasr.parallel.mesh import make_mesh, shard_batch
from uasr.train import PreemptionGuard, TrainState, make_optimizer


class SSLTrainer:
    """Contrastive pretraining: jitted step, DP over the mesh, the same
    TrainState/checkpoint contract as the CTC trainer."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.parallel.model_parallel
        )
        dt = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
        self.model = CPCModel(cfg.ssl, dtype=dt)
        self.optimizer = make_optimizer(cfg)
        self._frontend_state = None
        self._jit_cache: dict = {}

    def _inputs(self, audio, lengths):
        """input_type=waveform passes raw samples to the conv encoder;
        input_type=fbank runs the fused Pallas log-mel frontend first
        (100 Hz frames — ~20x cheaper than waveform-rate convs)."""
        audio = jnp.asarray(audio)
        lengths = jnp.asarray(lengths)
        if self.cfg.ssl.input_type != "fbank" or audio.ndim == 3:
            return audio, lengths
        from uasr.frontend.features import (
            compute_features, frontend_state_from_config,
        )

        if self._frontend_state is None:
            self._frontend_state = frontend_state_from_config(
                self.cfg.frontend
            )
        return compute_features(
            audio, lengths, self._frontend_state, self.cfg.frontend
        )

    def encode(self, params, audio, lengths):
        """(z, c, preds, frame_lengths) on whatever input_type the
        config selects — the single entry point shared by the train
        loss and uasr.tools.featurize."""
        x, xl = self._inputs(audio, lengths)
        return self.model.apply(params, x, xl)

    def init_state(self, rng: jax.Array, example: Batch) -> TrainState:
        x, xl = self._inputs(example.audio, example.audio_lengths)
        params = self.model.init(rng, x, xl)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
        )

    def _loss(self, params, batch: Batch, rng):
        z, c, preds, flen = self.encode(
            params, batch.audio, batch.audio_lengths
        )
        n_neg = self.cfg.ssl.num_negatives
        neg = (
            sample_negatives(rng, flen, n_neg, z.shape[1])
            if n_neg > 0 else None
        )
        if self.cfg.ssl.fused_loss:
            from uasr.ops.infonce import info_nce_loss_fused

            hp = params["params"]["heads"]
            loss, acc = info_nce_loss_fused(
                c, hp["kernel"], hp["bias"], z, flen,
                num_steps=self.cfg.ssl.predict_steps,
                temperature=self.cfg.ssl.temperature,
                neg_indices=neg,
                chunk=self.cfg.ssl.loss_chunk,
            )
        else:
            loss, acc = info_nce_loss(
                preds, z, flen,
                temperature=self.cfg.ssl.temperature,
                neg_indices=neg,
            )
        return loss, {"nce_loss": loss, "nce_acc": acc}

    def train_step(self, state: TrainState, batch: Batch, rng) -> tuple:
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), aux

    def eval_step(self, params, batch: Batch, rng):
        loss, aux = self._loss(params, batch, rng)
        return loss, aux["nce_acc"]

    def jitted_train_step(self):
        if "train" not in self._jit_cache:
            self._jit_cache["train"] = jax.jit(
                self.train_step, donate_argnums=(0,)
            )
        return self._jit_cache["train"]

    def jitted_eval_step(self):
        if "eval" not in self._jit_cache:
            self._jit_cache["eval"] = jax.jit(self.eval_step)
        return self._jit_cache["eval"]

    def evaluate(self, params, batches: Iterator[Batch]) -> tuple[float, float]:
        """Mean (nce_loss, nce_acc) over dev batches (fixed negative
        seed so the dev number is comparable across evals)."""
        step = self.jitted_eval_step()
        rng = jax.random.PRNGKey(0)
        tot_l = tot_a = n = 0.0
        for b in batches:
            l, a = step(params, Batch(*map(jnp.asarray, b)), rng)
            tot_l += float(l)
            tot_a += float(a)
            n += 1
        return tot_l / max(n, 1), tot_a / max(n, 1)


def run_ssl_pretraining(
    cfg: Config,
    train_batches: Iterator[Batch],
    dev_batches_fn=None,
    trainer: SSLTrainer | None = None,
) -> tuple[SSLTrainer, TrainState]:
    """Pretraining loop with the framework's standard contract: periodic
    logging, dev eval, keep-N checkpoints, restore-latest resume,
    preemption-safe save."""
    trainer = trainer or SSLTrainer(cfg)
    writer = MetricWriter(cfg.model_dir, also_tensorboard=cfg.train.tensorboard)
    ckpt = CheckpointManager(
        f"{cfg.model_dir}/ckpt", max_to_keep=cfg.train.keep_checkpoints
    )
    rng = jax.random.PRNGKey(cfg.train.seed)
    train_it = iter(train_batches)
    first = next(train_it)
    train_it = itertools.chain([first], train_it)  # init peek, still trained on
    state = trainer.init_state(rng, first)
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state, start = restored
        log_stdout(start, "resume", restored_step=start)
    step_fn = trainer.jitted_train_step()
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
        dev_batch = shard_batch(Batch(*batch), trainer.mesh)
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
                nce_loss=float(aux["nce_loss"]),
                nce_acc=float(aux["nce_acc"]),
                grad_norm=float(aux["grad_norm"]),
                audio_sec_per_sec=audio_sec_acc / max(dt, 1e-9),
            )
            log_stdout(step, "train", nce_loss=float(aux["nce_loss"]),
                       nce_acc=float(aux["nce_acc"]),
                       audio_sec_per_sec=audio_sec_acc / max(dt, 1e-9))
            t0, audio_sec_acc = time.time(), 0.0
        if dev_batches_fn and step % cfg.train.eval_every == 0:
            dl, da = trainer.evaluate(state.params, dev_batches_fn())
            writer.write(step, "dev", nce_loss=dl, nce_acc=da)
            log_stdout(step, "dev", nce_loss=dl, nce_acc=da)
            t0, audio_sec_acc = time.time(), 0.0
        if step % cfg.train.save_every == 0:
            ckpt.save(step, state)
    ckpt.save(int(state.step), state)
    guard.close()
    ckpt.close()
    writer.close()
    return trainer, state
