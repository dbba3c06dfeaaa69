"""Inference / decode entry (reference `--mode infer`, SURVEY.md §3.4).

Restores the latest checkpoint, decodes the test set **on device**
(greedy or beam — the reference shipped logits to a host C++ beam
decoder, its RTF bottleneck), folds TIMIT phones if configured, and
reports PER/CER plus decode RTF (decode wall time / audio seconds).
"""

from __future__ import annotations

import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from uasr.config import Config
from uasr.data.dataset import Batch
from uasr.train import CTCTrainer, TrainState
from uasr.vocab import Vocab

# which beam implementation the last run_inference trace selected
# ("pallas" | "pallas_sharded" | "xla") — observability for tests and
# the CLI (the choice happens at trace time, so a plain module global
# is accurate)
LAST_BEAM_IMPL: str | None = None


def _note_beam_impl(name: str) -> None:
    global LAST_BEAM_IMPL
    LAST_BEAM_IMPL = name


def run_inference(
    cfg: Config,
    trainer: CTCTrainer,
    state: TrainState,
    batches: Iterator[Batch],
    vocab: Vocab | None = None,
    fold_timit: bool = False,
    hyp_path: str | None = None,
    logits_fn=None,
) -> dict:
    """Decode + score. Returns {"per": float, "rtf": float, ...}.

    `logits_fn(params, audio, lengths) -> (logits, out_len)` overrides
    the default frontend+encoder forward — GAN/EODM runs pass
    `GeneratorInfer.logits_fn` so decoding sees the same segment/merge
    representation the checkpoint trained on.

    Decode is DATA-SHARDED over the trainer's mesh (scaling-book
    recipe: shard the batch axis, let GSPMD partition the whole
    frontend+encoder+decode graph and psum the error counts) — on a
    pod, `--mode infer` rides every chip. Ragged tail batches are
    zero-padded to the data-axis size (zero-length rows decode to
    nothing and score nothing) and sliced back before hyps are
    written."""
    from uasr.parallel.mesh import replicated, shard_batch

    global LAST_BEAM_IMPL
    LAST_BEAM_IMPL = None
    fcfg = cfg.frontend
    mesh = getattr(trainer, "mesh", None)
    dp = int(mesh.shape[cfg.parallel.data_axis]) if mesh is not None else 1
    if dp > 1:
        # checkpoint-restored params arrive COMMITTED to one device;
        # jitting them against a mesh-sharded batch is an error (unlike
        # the uncommitted arrays init_state produces, they don't
        # auto-relocate). Replicate them over the decode mesh up front.
        state = state._replace(
            params=jax.device_put(state.params, replicated(mesh))
        )
    def _logits(params, batch: Batch):
        from uasr.frontend.features import compute_features

        if logits_fn is not None:
            return logits_fn(params, batch.audio, batch.audio_lengths)
        if jnp.ndim(batch.audio) == 3:
            # precomputed features (SSL cache): frontend bypassed
            return trainer.model.apply(
                params, batch.audio, batch.audio_lengths
            )
        feats, flen = compute_features(
            batch.audio, batch.audio_lengths, trainer.frontend_state, fcfg
        )
        return trainer.model.apply(params, feats, flen)

    lm_logp = None
    viterbi_decode_fn = None
    if cfg.ctc.use_viterbi:
        from uasr.ops.lm import load_lm
        from uasr.ops.viterbi import make_lm_decoder

        if not cfg.ctc.lm_path:
            raise ValueError(
                "ctc.use_viterbi needs ctc.lm_path (a bigram/trigram "
                "table from `prepare lm`) for the HMM transitions"
            )
        table = load_lm(cfg.ctc.lm_path)
        V = cfg.dim_output
        if table.shape not in ((V + 1, V), (V + 1, V + 1, V)):
            raise ValueError(
                f"ctc.use_viterbi needs a [{V + 1}, {V}] bigram or "
                f"[{V + 1}, {V + 1}, {V}] trigram table, got "
                f"{table.shape}"
            )
        # dwell calibration on a few probe batches' greedy paths: the
        # defaults assume frame-level logits; a segment/merged
        # generator stream (dwell ~1 step/token) needs self_loop
        # near 0 or the transition prior deletes tokens (see
        # ops/viterbi.py::estimate_hmm_rates). Explicit non-default
        # rates are never replaced (resolve_viterbi_rates).
        import itertools

        from uasr.ops.viterbi import resolve_viterbi_rates

        batches = iter(batches)
        probe = list(itertools.islice(batches, 4))
        batches = itertools.chain(probe, batches)
        probe_fn = jax.jit(_logits)
        sl, bp, _how = resolve_viterbi_rates(
            cfg.ctc, lambda fb: probe_fn(state.params, fb), probe
        )
        viterbi_decode_fn = make_lm_decoder(
            table, cfg.ctc.blank_id, self_loop=sl, blank_prob=bp
        )
    if cfg.ctc.use_beam and cfg.ctc.lm_path:
        from uasr.ops.lm import load_lm

        lm_logp = load_lm(cfg.ctc.lm_path)
        V = cfg.dim_output
        if lm_logp.shape not in ((V + 1, V), (V + 1, V + 1, V)):
            # a silent mismatch would clip out-of-bounds gathers on
            # device and decode garbage — fail loudly instead
            raise ValueError(
                f"ctc.lm_path table shape {lm_logp.shape} does not match "
                f"the model vocabulary ([{V + 1}, {V}] bigram or "
                f"[{V + 1}, {V + 1}, {V}] trigram expected)"
            )
        lm_logp = jnp.asarray(lm_logp)

    @jax.jit
    def decode_batch(params, batch: Batch):
        from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode
        from uasr.ops.edit_distance import batch_edit_distance

        logits, out_len = _logits(params, batch)
        if viterbi_decode_fn is not None:
            hyps, hyp_len, _ = viterbi_decode_fn(logits, out_len)
        elif cfg.ctc.use_beam:
            import os as _os

            from uasr.ops.pallas_beam import lm_table_fits_vmem

            # whole-recursion Pallas kernel: exact (prune >= V
            # semantics), ~6x the XLA scan on v5e. LM fusion runs
            # in-kernel when the table fits VMEM (one-hot GEMM against
            # the resident table); bigger tables fall back to the XLA
            # scan's dynamic gathers. On CPU the kernel only runs in
            # interpret mode (tests set UASR_PALLAS_BEAM=interpret).
            interp = jax.default_backend() == "cpu"
            pallas_ok = (
                (lm_logp is None or lm_table_fits_vmem(lm_logp))
                and (not interp
                     or _os.environ.get("UASR_PALLAS_BEAM") == "interpret")
            )
            if pallas_ok:
                from uasr.ops.pallas_beam import ctc_beam_search_decode_pallas

                def pallas_beam(lg, ln):
                    return ctc_beam_search_decode_pallas(
                        lg, ln, cfg.ctc.beam_width, cfg.ctc.blank_id,
                        lm_logp=lm_logp, lm_weight=cfg.ctc.lm_weight,
                        lm_bonus=cfg.ctc.lm_bonus, interpret=interp,
                    )

                if dp == 1:
                    hyps, hyp_len, _ = pallas_beam(logits, out_len)
                    _note_beam_impl("pallas")
                else:
                    # the kernel is a single-device program; run one
                    # instance PER DATA SHARD via shard_map so sharded
                    # inference keeps the kernel speedup (round-3
                    # VERDICT item 7: the old fallback decoded every
                    # shard on the 4.9x-slower XLA scan)
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    da = cfg.parallel.data_axis
                    hyps, hyp_len, _ = shard_map(
                        pallas_beam, mesh=mesh,
                        in_specs=(P(da, None, None), P(da)),
                        out_specs=(P(da, None), P(da), P(da)),
                        check_vma=False,
                    )(logits, out_len)
                    _note_beam_impl("pallas_sharded")
            else:
                hyps, hyp_len, _ = ctc_beam_search_decode(
                    logits, out_len, cfg.ctc.beam_width, cfg.ctc.blank_id,
                    lm_logp=lm_logp, lm_weight=cfg.ctc.lm_weight,
                    lm_bonus=cfg.ctc.lm_bonus,
                )
                _note_beam_impl("xla")
        else:
            hyps, hyp_len = ctc_greedy_decode(logits, out_len, cfg.ctc.blank_id)
        dist = batch_edit_distance(
            batch.labels, batch.label_lengths, hyps, hyp_len
        )
        # ragged-tail padding rows (zero-length audio, added above to
        # make B divisible by dp) must score nothing: the segment/merge
        # generator pathway can emit a spurious token for an empty row
        # (segment pooling always yields >= 1 segment), which would
        # count as an insertion against the empty reference
        pad_row = batch.audio_lengths == 0
        dist = jnp.where(pad_row, 0, dist)
        hyp_len = jnp.where(pad_row, 0, hyp_len)
        return hyps, hyp_len, jnp.sum(dist), jnp.sum(batch.label_lengths)

    errs = total = 0
    audio_sec = 0.0
    wall = 0.0
    hyp_f = open(hyp_path, "w") if hyp_path else None
    n_utts = 0
    fold_pairs: list[tuple[list[str], list[str]]] = []
    for b in batches:
        b_np = Batch(*(np.asarray(x) for x in b))
        B0 = b_np.audio.shape[0]
        if dp > 1:
            pad = (-B0) % dp
            if pad:
                b_np = Batch(*(
                    np.concatenate(
                        [x, np.zeros((pad,) + x.shape[1:], x.dtype)]
                    ) for x in b_np
                ))
            db = shard_batch(b_np, mesh, cfg.parallel.data_axis)
        else:
            db = Batch(*map(jnp.asarray, b_np))
        t0 = time.time()
        hyps, hyp_len, e, t = decode_batch(state.params, db)
        jax.block_until_ready(hyps)
        wall += time.time() - t0
        # one device->host transfer per batch: per-utterance slicing of a
        # GSPMD-sharded array would dispatch (and compile) a fresh sharded
        # gather for every distinct (i, length) shape
        hyps = np.asarray(hyps)[:B0]
        hyp_len = np.asarray(hyp_len)[:B0]
        if np.ndim(b.audio) == 3:
            # feature batches: lengths are frames; approximate seconds
            # by the recipe's frame shift (external SSL features carry
            # no sample count)
            audio_sec += (
                float(np.sum(b.audio_lengths))
                * cfg.frontend.frame_shift_ms / 1000.0
            )
        else:
            audio_sec += (
                float(np.sum(b.audio_lengths)) / cfg.frontend.sample_rate
            )
        errs += int(e)
        total += int(t)
        if vocab is not None and (hyp_f is not None or fold_timit):
            for i in range(hyps.shape[0]):
                toks = vocab.decode_for_scoring(
                    np.asarray(hyps[i, : int(hyp_len[i])]), fold_timit=fold_timit
                )
                if hyp_f is not None:
                    hyp_f.write(f"utt{n_utts}\t{' '.join(toks)}\n")
                n_utts += 1
                if fold_timit:
                    ref = vocab.decode_for_scoring(
                        np.asarray(b.labels[i, : int(b.label_lengths[i])]),
                        fold_timit=True,
                    )
                    fold_pairs.append((ref, toks))
    if hyp_f:
        hyp_f.close()
    folded_per = None
    if fold_timit and fold_pairs:
        # host-side scoring in the folded phone space (reference: TIMIT
        # 61->39 fold before PER), via the native C++ edit distance
        from uasr.native import batch_edit_distance_native

        sym = {t: i for i, t in enumerate(
            sorted({t for r, h in fold_pairs for t in r + h})
        )}
        N = max(max((len(r) for r, _ in fold_pairs), default=1), 1)
        M = max(max((len(h) for _, h in fold_pairs), default=1), 1)
        B2 = len(fold_pairs)
        refs = np.zeros((B2, N), np.int32)
        hyps2 = np.zeros((B2, M), np.int32)
        rl = np.zeros(B2, np.int32)
        hl = np.zeros(B2, np.int32)
        for i, (r, h) in enumerate(fold_pairs):
            refs[i, : len(r)] = [sym[t] for t in r]
            hyps2[i, : len(h)] = [sym[t] for t in h]
            rl[i], hl[i] = len(r), len(h)
        d = batch_edit_distance_native(refs, rl, hyps2, hl)
        folded_per = float(d.sum()) / max(int(rl.sum()), 1)
    out = {
        "per": errs / max(total, 1),
        "rtf": wall / max(audio_sec, 1e-9),
        "audio_seconds": audio_sec,
        "errors": errs,
        "ref_tokens": total,
    }
    if folded_per is not None:
        out["per_folded"] = folded_per
    return out
