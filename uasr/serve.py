"""Online streaming recognizer: chunked audio in, incremental tokens out.

Serving-side counterpart of the streaming frontend (BASELINE.json
config #4, SURVEY.md §5 "long-context / streaming seam"). The reference
had no serving path at all — inference was offline batch decode
(SURVEY.md §3.4); this module makes the same checkpoint answer online
with bounded latency and an EXACT-parity guarantee:

    streamed tokens == offline greedy decode of the full utterance

for two encoder classes:

  - **finite receptive field** (``cnn``, ``classifier``): a rolling
    feature window is re-encoded each chunk, provided ``chunk_frames``
    and ``lookback_frames`` each cover the receptive-field half-width
    (checked at construction); emission latency is one chunk (the
    decoded region needs a chunk of real right context);
  - **causal recurrent** (``uni_gru``): no window at all — the
    encoder's own streaming state (conv tail + GRU hidden) is carried
    across chunks and each chunk's tokens are emitted immediately
    (ZERO right-context latency; `finish()` only flushes beam mode).

Attention / BiGRU encoders have unbounded bidirectional context and are
rejected with a clear error.

How it works (all static shapes, everything jitted):

  - audio arrives in fixed chunks of ``chunk_frames * frame_shift``
    samples; the causal streaming frontend (`stream_chunk`) turns each
    into exactly ``chunk_frames`` feature frames (running CMVN state
    carried across chunks, so features are bit-identical to the
    offline `streaming_features` path);
  - a rolling window of W = lookback + 2*chunk feature frames is kept;
    the encoder runs on the whole window each step and the logits of
    the *previous* chunk's region — which now has a full chunk of real
    right context — are decoded (one-chunk emission latency);
  - CTC greedy collapse carries the last raw argmax id across chunk
    boundaries, so repeats spanning a boundary collapse exactly as in
    the offline decode;
  - `finish()` decodes the final region against the encoder's own
    length masking, matching the offline tail exactly.

The chunk step is a pure function (state, chunk) -> (state, ids,
counts); per-chunk latency on hardware is the serving metric
(`bench.py --streaming`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uasr.config import Config, ModelConfig
from uasr.frontend.features import frontend_state_from_config
from uasr.frontend.streaming import (
    StreamState,
    init_stream_state,
    stream_chunk,
)
from uasr.models import build_model


def streaming_receptive_field(cfg: ModelConfig) -> tuple[int, int]:
    """(half_width_in_feature_frames, time_subsample) of a finite-RF
    encoder. Raises for encoders whose context is unbounded (BiGRU scans
    the whole utterance; attention is global)."""
    if cfg.encoder == "classifier":
        return cfg.classifier_context, 1
    if cfg.encoder == "cnn":
        half = cfg.conv_kernel // 2  # first (strided) conv, input rate
        s = cfg.conv_time_stride
        for _ in range(max(cfg.num_conv_layers, 1) - 1):
            half += (cfg.conv_kernel // 2) * s
        for i in range(2):  # dilated residual stack
            half += (cfg.conv_kernel // 2) * (2 ** (i + 1)) * s
        return half, s
    raise ValueError(
        f"encoder {cfg.encoder!r} has unbounded context and cannot "
        "stream exactly; use 'cnn' or 'classifier' (window replay) or "
        "'uni_gru' (carried recurrent state) for online serving — or "
        "opt into approximate window-bounded streaming with "
        "approx_context=True (serving context limited to the rolling "
        "window; tokens can differ from the offline decode near the "
        "window edge)"
    )


class RecognizerState(NamedTuple):
    frontend: StreamState
    feat_buf: jax.Array  # [B, W, D] rolling feature window (left-aligned)
    n_frames: jax.Array  # [B] int32 — feature frames received PER STREAM
    prev_id: jax.Array  # [B] last raw argmax id of the decoded prefix
    valid_frames: jax.Array  # [B] per-stream feature-frame cap (huge = open)


class BeamRecognizerState(NamedTuple):
    """Greedy state + carried beam search: the beam state evolves over
    the region logits exactly as the offline scan would (ctc_beam_scan
    is resumable), and each beam's decoded prefix is materialized
    incrementally so finish() can return the full best transcript."""

    frontend: StreamState
    feat_buf: jax.Array
    n_frames: jax.Array
    prev_id: jax.Array  # greedy-partials carry
    valid_frames: jax.Array  # [B] per-stream feature-frame cap (huge = open)
    beam: object  # ops.decode._BeamState
    prefix: jax.Array  # [B, W, Lmax] int32, -1 padded
    prefix_len: jax.Array  # [B, W]


class RecurrentState(NamedTuple):
    """State of the causal-recurrent path (``uni_gru``): instead of a
    feature window, the encoder's own streaming carry (conv tail + GRU
    hidden per layer) rides across chunks."""

    frontend: StreamState
    carry: tuple  # models.uni_gru_initial_carry: (ctx_tail, h)
    n_frames: jax.Array  # [B] int32 — feature frames received PER STREAM
    prev_id: jax.Array  # [B] last raw argmax id of the decoded prefix
    valid_frames: jax.Array  # [B] per-stream feature-frame cap


class BeamRecurrentState(NamedTuple):
    frontend: StreamState
    carry: tuple
    n_frames: jax.Array
    prev_id: jax.Array
    valid_frames: jax.Array
    beam: object  # ops.decode._BeamState
    prefix: jax.Array  # [B, W, Lmax] int32, -1 padded
    prefix_len: jax.Array  # [B, W]


def beam_advance(
    beam,
    prefix: jax.Array,
    prefix_len: jax.Array,
    logp: jax.Array,
    lengths: jax.Array,
    blank_id: int = 0,
    prune: int | None = None,
    lm_logp=None,
    lm_weight: float = 1.0,
    lm_bonus: float = 0.0,
    merge_impl: str = "fold",
):
    """Advance a carried beam state AND the materialized per-beam
    prefixes over one chunk of log-probs [B, K, V].

    The scan emits per-step backpointers; a chunk-local traceback from
    ALL W beams recovers (a) each surviving beam's ancestor at the
    chunk start and (b) its tokens emitted within the chunk, which are
    appended to the ancestor's prefix. Feeding chunks sequentially is
    bit-identical to one offline scan over the concatenated logp (the
    scan state carries everything; tested in tests/test_serve.py)."""
    from uasr.ops.decode import ctc_beam_scan

    B, K, V = logp.shape
    W = prefix.shape[1]
    L = prefix.shape[2]
    new_beam, parents, chars = ctc_beam_scan(
        logp, lengths, beam, blank_id=blank_id, prune=prune,
        lm_logp=lm_logp, lm_weight=lm_weight, lm_bonus=lm_bonus,
        merge_impl=merge_impl,
    )

    def back(idx, inp):
        parent_t, char_t = inp  # [B, W]
        c = jnp.take_along_axis(char_t, idx, 1)
        nxt = jnp.take_along_axis(parent_t, idx, 1)
        return nxt, c

    idx0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (B, W))
    anc, cs = jax.lax.scan(back, idx0, (parents, chars), reverse=True)
    cs = jnp.moveaxis(cs, 0, 2)  # [B, W, K] chars along each path, time order

    base = jnp.take_along_axis(prefix, anc[..., None], 1)  # [B, W, L]
    base_len = jnp.take_along_axis(prefix_len, anc, 1)  # [B, W]
    keep = cs >= 0
    pos = base_len[..., None] + jnp.cumsum(keep, axis=-1) - 1  # [B, W, K]
    pos = jnp.where(keep & (pos < L), pos, L)  # drop overflow + non-emits
    b_idx = jnp.arange(B)[:, None, None]
    w_idx = jnp.arange(W)[None, :, None]
    new_prefix = base.at[b_idx, w_idx, pos].set(cs, mode="drop")
    new_len = jnp.minimum(base_len + keep.sum(-1), L)
    return new_beam, new_prefix, new_len


class StreamingRecognizer:
    """Chunked online inference over a trained CTC checkpoint.

    Usage:
        rec = StreamingRecognizer(cfg, params)
        st = rec.init(batch)
        for chunk in audio_chunks:          # [B, chunk_samples] each
            st, ids, counts = rec.step(st, chunk)
        st, ids, counts = rec.finish(st)

    Each `step`/`finish` returns up to chunk_frames//subsample new token
    ids per stream, left-compacted and padded with -1; `counts[b]` says
    how many are valid. Audio must arrive in exact multiples of the
    chunk size (pad the tail with zeros — the offline path pads the
    same way, so parity is preserved).

    Beam mode (`ctc.use_beam`): the prefix-beam state (plus each beam's
    materialized transcript) is carried across chunks and evolves
    exactly as the offline scan would (`ctc_beam_scan` is resumable).
    `step()` still emits greedy PARTIALS (provisional, for display);
    `finish()` returns `(state, ids [B, max_label_len], lengths [B])` —
    the COMPLETE best-beam transcript, equal to the offline beam decode
    (with shallow-fusion LM when `ctc.lm_path` is set).
    """

    def __init__(
        self,
        cfg: Config,
        params,
        chunk_frames: int | None = None,
        lookback_frames: int | None = None,
        approx_context: bool = False,
    ):
        self.cfg = cfg
        self.params = params
        self.model = build_model(cfg.model, cfg.dim_output)
        self.fe = frontend_state_from_config(cfg.frontend)
        # causal-recurrent encoders carry their own state — no window,
        # no receptive-field constraints, zero right-context latency.
        # lc_bigru (round 5) rides the same carried-state path but its
        # emissions lag num_gru_layers chunks (each layer's backward
        # window needs the next chunk at its own rate) — EXACT parity
        # with the offline decode by construction.
        self.recurrent = cfg.model.encoder in ("uni_gru", "lc_bigru")
        self.delay = (cfg.model.num_gru_layers
                      if cfg.model.encoder == "lc_bigru" else 0)
        self.approx = False
        if self.recurrent:
            half = 0
            sub = cfg.model.conv_time_stride ** cfg.model.num_conv_layers
        else:
            try:
                half, sub = streaming_receptive_field(cfg.model)
            except ValueError:
                if not approx_context:
                    raise
                # approximate window-bounded streaming (round 4): the
                # unbounded-context encoder (conv_bigru / attention)
                # runs on the rolling window only — left context is
                # bounded by `lookback_frames`, right context by one
                # chunk. NOT exact; equals the offline decode whenever
                # the window covers the whole utterance, and the
                # measured divergence shrinks as lookback grows
                # (tests/test_serve.py parity-bound test).
                from uasr.models.models import encoder_time_subsample

                half, sub = 0, encoder_time_subsample(cfg.model)
                self.approx = True
        self.subsample = sub
        C = chunk_frames or cfg.frontend.streaming_chunk_frames or 64
        if cfg.model.encoder == "lc_bigru":
            # the chunk grid must be the TRAINING window grid or the
            # backward windows would differ from the offline compute
            want = cfg.model.lc_chunk * sub
            if C != want:
                raise ValueError(
                    f"lc_bigru streams exactly only on its training "
                    f"chunk grid: chunk_frames must be lc_chunk * "
                    f"stride = {cfg.model.lc_chunk} * {sub} = {want}, "
                    f"got {C}"
                )
        if C % sub:
            raise ValueError(
                f"chunk ({C}) must be a multiple of the encoder "
                f"subsampling ({sub})"
            )
        # lookback: at least the receptive field (approx mode: default
        # 4 chunks of left context), rounded UP to a chunk multiple so
        # the rolling buffer fills exactly before it starts shifting
        # (the shift is then always one whole chunk)
        want_lb = lookback_frames or (4 * C if self.approx else half)
        Lb = 0 if self.recurrent else -(-max(want_lb, 1) // C) * C
        if C < half:
            raise ValueError(
                f"chunk_frames {C} < receptive-field half-width {half}: "
                "the decoded region would need context beyond the window"
            )
        if Lb < half:
            raise ValueError(
                f"lookback_frames {Lb} < receptive-field half-width {half}"
            )
        # merged-stream checkpoints (gan.merge_repeats): greedy decode
        # of the merged stream == blank-dropping repeat collapse over
        # the RAW frame argmaxes (pooled runs keep their run argmax:
        # a mean of vectors sharing an argmax keeps it), so the online
        # carry can reproduce the train-eval representation EXACTLY —
        # only the emission rule changes (blanks do not reset the
        # repeat carry). Round-4, VERDICT round-3 item 6b.
        self.collapse = "ctc"
        if cfg.train.mode in ("gan", "eodm", "gan+eodm") and \
                cfg.gan.merge_repeats:
            if cfg.gan.segmenter != "none":
                raise ValueError(
                    "streaming serving supports merge_repeats but not "
                    "gan.segmenter=kmeans (segment pooling needs the "
                    "whole utterance)"
                )
            if cfg.ctc.use_beam:
                raise ValueError(
                    "streaming beam search runs on the raw frame "
                    "stream; a merge_repeats checkpoint's train-eval "
                    "representation is the merged stream — use greedy "
                    "streaming (exact) or offline beam decode"
                )
            self.collapse = "merge"
        if cfg.frontend.cmvn != "streaming":
            raise ValueError(
                "online serving needs frontend.cmvn: streaming (causal "
                f"running stats); got {cfg.frontend.cmvn!r} — offline "
                "CMVN modes read the whole utterance"
            )
        if cfg.frontend.downsample != 1 or cfg.frontend.splice_left or \
                cfg.frontend.splice_right:
            raise ValueError(
                "streaming serving supports downsample=1 / no splicing "
                "(the chunked frontend emits frame-rate features)"
            )
        self.chunk = C
        self.lookback = Lb
        self.window = Lb + 2 * C
        self.blank = cfg.ctc.blank_id
        # beam mode (ctc.use_beam): carry the prefix-beam state across
        # chunks; step() still emits greedy PARTIALS (provisional),
        # finish() returns the full beam-decoded transcript
        self.use_beam = cfg.ctc.use_beam
        self.beam_width = cfg.ctc.beam_width
        self.max_tokens = cfg.data.max_label_len
        self.lm_logp = None
        if self.use_beam and cfg.ctc.lm_path:
            from uasr.ops.lm import load_lm

            lm = load_lm(cfg.ctc.lm_path)
            V = cfg.dim_output
            if lm.shape not in ((V + 1, V), (V + 1, V + 1, V)):
                # same loud guard as uasr/infer.py: a silent mismatch
                # would clip out-of-bounds gathers on device and decode
                # garbage
                raise ValueError(
                    f"ctc.lm_path table shape {lm.shape} does not match "
                    f"vocab ({V} tokens): expected {(V + 1, V)} (bigram) "
                    f"or {(V + 1, V + 1, V)} (trigram)"
                )
            self.lm_logp = jnp.asarray(lm)
        # params threaded explicitly so the same impls are exportable
        # as (params, state, ...) StableHLO functions (tools/export
        # --streaming)
        import functools

        self._step = jax.jit(
            functools.partial(self._step_impl, self.params)
        )
        self._finish = jax.jit(
            functools.partial(self._finish_impl, self.params)
        )

    # ---- public API

    def init(self, batch: int, audio_lengths=None) -> RecognizerState:
        """Fresh state for `batch` parallel streams.

        audio_lengths (optional, [batch] samples): when the utterance
        lengths are known up front (file-driven serving, mixed-length
        batches), decoding freezes per stream at its own audio end —
        zero padding to the batch max is then never decoded as speech,
        matching the offline decode's length masking exactly. Omit for
        open-ended streams."""
        D = self.cfg.frontend.num_mel_bins
        if audio_lengths is None:
            valid = jnp.full((batch,), 1 << 30, jnp.int32)
        else:
            # samples -> frontend frames, the same ceil the offline
            # pipeline uses; the logits-rate cap is derived where needed
            fs = self.cfg.frontend.frame_shift
            valid = (jnp.asarray(audio_lengths, jnp.int32) + fs - 1) // fs
        if self.recurrent:
            from uasr.models.models import (
                lc_initial_carry, uni_gru_initial_carry,
            )

            carry0 = (
                lc_initial_carry(self.cfg.model, batch)
                if self.delay
                else uni_gru_initial_carry(self.cfg.model, batch)
            )
            rbase = RecurrentState(
                frontend=init_stream_state(batch, self.cfg.frontend),
                carry=carry0,
                n_frames=jnp.zeros((batch,), jnp.int32),
                prev_id=jnp.full((batch,), self.blank, jnp.int32),
                valid_frames=valid,
            )
            if not self.use_beam:
                return rbase
            from uasr.ops.decode import ctc_beam_init

            Wb, L = self.beam_width, self.max_tokens
            return BeamRecurrentState(
                *rbase,
                beam=ctc_beam_init(batch, Wb),
                prefix=jnp.full((batch, Wb, L), -1, jnp.int32),
                prefix_len=jnp.zeros((batch, Wb), jnp.int32),
            )
        base = RecognizerState(
            frontend=init_stream_state(batch, self.cfg.frontend),
            feat_buf=jnp.zeros((batch, self.window, D), jnp.float32),
            n_frames=jnp.zeros((batch,), jnp.int32),
            prev_id=jnp.full((batch,), self.blank, jnp.int32),
            valid_frames=valid,
        )
        if not self.use_beam:
            return base
        from uasr.ops.decode import ctc_beam_init

        Wb, L = self.beam_width, self.max_tokens
        return BeamRecognizerState(
            *base,
            beam=ctc_beam_init(batch, Wb),
            prefix=jnp.full((batch, Wb, L), -1, jnp.int32),
            prefix_len=jnp.zeros((batch, Wb), jnp.int32),
        )

    def step(self, state: RecognizerState, audio_chunk):
        """Consume chunk_frames*frame_shift samples; emit the tokens of
        the PREVIOUS chunk's region (empty on the first call)."""
        S = self.chunk * self.cfg.frontend.frame_shift
        if audio_chunk.shape[-1] != S:
            raise ValueError(
                f"chunk must be exactly {S} samples "
                f"({self.chunk} frames), got {audio_chunk.shape[-1]}"
            )
        return self._step(state, jnp.asarray(audio_chunk))

    def finish(self, state: RecognizerState):
        """Decode the final region (the last chunk received)."""
        return self._finish(state)

    # ---- dynamic-batching primitives (tools/serve_daemon.py)
    #
    # A serving daemon multiplexes many live client streams onto the
    # slots of ONE batched recognizer: slots join, idle, and leave at
    # different times. All per-stream state is per-slot (n_frames
    # included), so slot b's trajectory is independent of every other
    # slot's; these helpers step a masked subset, reset freed slots,
    # and stamp a slot's final length — each a single device dispatch.

    def _select_slots(self, mask, new, old):
        """Per-slot pytree select: slot b takes `new` where mask[b].
        Every state leaf has batch leading except the uni_gru hidden
        carry ([L, B, H]), handled explicitly."""
        mask = jnp.asarray(mask, bool)

        def sel(nl, ol):
            m = mask.reshape((mask.shape[0],) + (1,) * (nl.ndim - 1))
            return jnp.where(m, nl, ol)

        if self.recurrent:
            tail = sel(new.carry[0], old.carry[0])
            h = jnp.where(mask[None, :, None], new.carry[1], old.carry[1])
            rest = jax.tree.map(
                sel, new._replace(carry=None), old._replace(carry=None)
            )
            return rest._replace(carry=(tail, h))
        return jax.tree.map(sel, new, old)

    def masked_step(self, state, audio_chunks, mask,
                    stamp_mask=None, stamp_samples=None, packed=False):
        """Step only the slots with mask[b]=True; masked-out slots keep
        their state bit-for-bit and report 0 emitted tokens. One jitted
        dispatch regardless of how many slots are active.

        stamp_mask/stamp_samples (optional): additionally stamp those
        slots' utterance length (see set_valid_samples) in the SAME
        dispatch — the stamp applies before the step, so a tick that
        both learns a stream's true length and consumes its (padded)
        tail chunk masks the padding correctly.

        Transfer discipline (the serving hot loop may run over a
        remote-tunneled device where EVERY transfer is a round trip):
        all inputs ride ONE upload — mask/stamp/samples are bitcast
        into 3 trailing f32 columns of the audio matrix — and ids+
        counts come back as ONE [B, K+1] i32 download. packed=True
        returns that un-materialized device array (column K = count)
        so a caller can pipeline the readback; default splits it.
        """
        import numpy as np

        S = self.chunk * self.cfg.frontend.frame_shift
        if audio_chunks.shape[-1] != S:
            raise ValueError(
                f"chunk must be exactly {S} samples, got "
                f"{audio_chunks.shape[-1]}"
            )
        if not hasattr(self, "_masked_step_fn"):
            import functools

            def impl(params, state, packed_in):
                chunks = packed_in[:, :S]
                aux = jax.lax.bitcast_convert_type(
                    packed_in[:, S:], jnp.int32
                )
                mask = aux[:, 0] != 0
                smask = aux[:, 1] != 0
                fs = self.cfg.frontend.frame_shift
                frames = (aux[:, 2] + fs - 1) // fs
                state = state._replace(
                    valid_frames=jnp.where(smask, frames,
                                           state.valid_frames)
                )
                new, ids, counts = self._step_impl(params, state, chunks)
                kept = self._select_slots(mask, new, state)
                counts = jnp.where(mask, counts, 0)
                return kept, jnp.concatenate(
                    [ids, counts[:, None]], axis=1
                )

            self._masked_step_fn = jax.jit(
                functools.partial(impl, self.params)
            )
        B = len(mask)
        aux = np.zeros((B, 3), np.int32)
        aux[:, 0] = np.asarray(mask, bool)
        if stamp_mask is not None:
            aux[:, 1] = np.asarray(stamp_mask, bool)
            aux[:, 2] = np.asarray(stamp_samples, np.int64).clip(
                0, 2**31 - 1
            )
        packed_in = np.concatenate(
            [np.asarray(audio_chunks, np.float32), aux.view(np.float32)],
            axis=1,
        )
        kept, out = self._masked_step_fn(state, packed_in)
        if packed:
            return kept, out
        o = np.asarray(out)
        return kept, o[:, :-1], o[:, -1]

    def masked_step_and_finish(self, state, audio_chunks, mask,
                               finish_mask, stamp_mask=None,
                               stamp_samples=None):
        """masked_step + finish_and_reset over DISJOINT slot sets in
        ONE dispatch. The daemon's finalize tick otherwise pays a
        separate finish dispatch (one extra ~9 ms tunnel round trip per
        utterance end — BASELINE.md serve ladder); finalizing slots
        never carry a chunk in the same tick, and per-slot state is
        independent, so stepping and finishing compose in either order.

        Returns (state, step_out [B, K+1], finish_out [B, Kf+1]) as
        PACKED DEVICE arrays (column layouts as masked_step /
        finish_and_reset; the caller materializes after overlapping
        work)."""
        import numpy as np

        S = self.chunk * self.cfg.frontend.frame_shift
        if audio_chunks.shape[-1] != S:
            raise ValueError(
                f"chunk must be exactly {S} samples, got "
                f"{audio_chunks.shape[-1]}"
            )
        # cache keyed by slot count: the closed-over reset template is
        # sized to B, so a later call with a different batch size must
        # build (not retrace against) its own (ADVICE round 4)
        if not hasattr(self, "_step_finish_fns"):
            self._step_finish_fns = {}
        if len(mask) not in self._step_finish_fns:
            import functools

            template = self.init(len(mask))

            def impl(params, state, packed_in, fmask):
                chunks = packed_in[:, :S]
                aux = jax.lax.bitcast_convert_type(
                    packed_in[:, S:], jnp.int32
                )
                m = aux[:, 0] != 0
                smask = aux[:, 1] != 0
                fs = self.cfg.frontend.frame_shift
                frames = (aux[:, 2] + fs - 1) // fs
                state = state._replace(
                    valid_frames=jnp.where(smask, frames,
                                           state.valid_frames)
                )
                new, ids, counts = self._step_impl(params, state, chunks)
                kept = self._select_slots(m, new, state)
                counts = jnp.where(m, counts, 0)
                step_out = jnp.concatenate(
                    [ids, counts[:, None]], axis=1
                )
                _fin, fids, fcounts = self._finish_impl(params, kept)
                kept = self._select_slots(fmask, template, kept)
                fin_out = jnp.concatenate(
                    [fids, fcounts[:, None].astype(fids.dtype)], axis=1
                )
                return kept, step_out, fin_out

            self._step_finish_fns[len(mask)] = jax.jit(
                functools.partial(impl, self.params)
            )
        B = len(mask)
        aux = np.zeros((B, 3), np.int32)
        aux[:, 0] = np.asarray(mask, bool)
        if stamp_mask is not None:
            aux[:, 1] = np.asarray(stamp_mask, bool)
            aux[:, 2] = np.asarray(stamp_samples, np.int64).clip(
                0, 2**31 - 1
            )
        packed_in = np.concatenate(
            [np.asarray(audio_chunks, np.float32), aux.view(np.float32)],
            axis=1,
        )
        kept, sout, fout = self._step_finish_fns[B](
            state, packed_in, jnp.asarray(finish_mask, bool)
        )
        # DEVICE arrays returned (packed semantics): materializing here
        # would serialize the tick — the daemon drains the previous
        # tick's output while this dispatch runs, then reads fout
        return kept, sout, fout

    def finish_and_reset(self, state, mask, packed=False):
        """Decode the masked slots' final region AND re-initialize them
        for the next client, in one dispatch: returns (state_with_masked_
        slots_reset, final_ids, final_counts). Unmasked slots keep their
        state bit-for-bit (their returned ids/counts are meaningless).
        packed=True returns (state, [B, K+1] device array) as in
        masked_step."""
        import numpy as np

        if not hasattr(self, "_finish_reset_fns"):
            self._finish_reset_fns = {}
        B = len(state.prev_id)
        if B not in self._finish_reset_fns:
            import functools

            template = self.init(B)

            def impl(params, state, mask):
                fin, ids, counts = self._finish_impl(params, state)
                kept = self._select_slots(mask, template, state)
                return kept, jnp.concatenate(
                    [ids, counts[:, None].astype(ids.dtype)], axis=1
                )

            self._finish_reset_fns[B] = jax.jit(
                functools.partial(impl, self.params)
            )
        kept, out = self._finish_reset_fns[B](
            state, jnp.asarray(mask, bool)
        )
        if packed:
            return kept, out
        o = np.asarray(out)
        return kept, o[:, :-1], o[:, -1]

    def reset_slots(self, state, mask):
        """Return `state` with the masked slots re-initialized (fresh
        open-ended streams), ready for the next client."""
        if not hasattr(self, "_reset_fns"):
            self._reset_fns = {}
        B = len(state.prev_id)
        if B not in self._reset_fns:
            template = self.init(B)

            def impl(state, mask):
                return self._select_slots(mask, template, state)

            self._reset_fns[B] = jax.jit(impl)
        return self._reset_fns[B](state, jnp.asarray(mask, bool))

    def set_valid_samples(self, state, mask, samples):
        """Stamp the masked slots' utterance length (in samples) so the
        tail's zero padding is never decoded as speech — the same
        length-freezing contract as init(audio_lengths)."""
        if not hasattr(self, "_set_valid_fn"):
            def impl(state, mask, samples):
                fs = self.cfg.frontend.frame_shift
                frames = (samples.astype(jnp.int32) + fs - 1) // fs
                return state._replace(
                    valid_frames=jnp.where(mask, frames, state.valid_frames)
                )

            self._set_valid_fn = jax.jit(impl)
        return self._set_valid_fn(
            state, jnp.asarray(mask, bool), jnp.asarray(samples, jnp.int32)
        )

    # ---- jitted internals

    def _push(self, buf, n_prev, feats):
        """Append `chunk` frames, left-aligned; roll once full.

        n_prev is PER-SLOT [B] (streams in a dynamic batch have
        different ages, tools/serve_daemon.py), so grow-vs-roll is a
        per-row gather: slot b shifts its window by C once full
        (n_prev[b] only takes multiples of C, so the insert position is
        min(n_prev, W-C) and a rolling slot always shifts one chunk)."""
        C, W = self.chunk, self.window
        pos = jnp.minimum(n_prev, W - C)[:, None]  # [B, 1] insert row
        rolling = (n_prev + C > W)[:, None, None]  # [B, 1, 1]
        w = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]
        # a rolling slot always shifts exactly one chunk, so the shifted
        # rows are a static rotate selected per slot (no gather)
        old_rows = jnp.where(rolling, jnp.roll(buf, -C, axis=1), buf)
        fidx = jnp.clip(w - pos, 0, C - 1)
        feat_rows = jnp.take_along_axis(feats, fidx[..., None], axis=1)
        in_feat = (w >= pos) & (w < pos + C)
        return jnp.where(in_feat[..., None], feat_rows, old_rows)

    def _decode_region_logits(self, buf, n, region_start, params=None,
                              valid_frames=None):
        """Run the encoder on the window; return the logits of feature
        frames [region_start, region_start + chunk).

        valid_frames [B] (optional): per-stream feature-frame caps —
        window rows past a stream's own utterance end are masked by the
        encoder's length handling, exactly like the offline pipeline's
        per-utterance masking (mixed-length batch parity)."""
        C, W, s = self.chunk, self.window, self.subsample
        B = buf.shape[0]
        n = jnp.broadcast_to(jnp.asarray(n, jnp.int32), (B,))
        region_start = jnp.broadcast_to(
            jnp.asarray(region_start, jnp.int32), (B,)
        )
        valid = jnp.minimum(n, W)  # [B]
        a = jnp.maximum(n - W, 0)  # [B] absolute frame index of buf row 0
        if valid_frames is None:
            lengths = valid
        else:
            lengths = jnp.minimum(
                jnp.clip(valid_frames.astype(jnp.int32) - a, 0, W), valid
            )
        logits, _ = self.model.apply(
            self.params if params is None else params, buf, lengths
        )
        off = (region_start - a) // s  # [B] per-slot region offset
        idx = off[:, None] + jnp.arange(C // s, dtype=jnp.int32)[None, :]
        return jnp.take_along_axis(logits, idx[..., None], axis=1)

    def _emit(self, ids, prev_id, active):
        """Greedy collapse with carried prev id; returns
        (ids_out [B, K] padded with -1, counts [B], new_prev).

        collapse="ctc": standard CTC semantics — a blank RESETS the
        repeat carry (blank-separated repeats emit twice); prev_id is
        the last raw argmax. collapse="merge": merged-stream semantics
        (gan.merge_repeats) — blanks are dropped without resetting the
        carry, so blank-separated repeats collapse to ONE token;
        prev_id is the last emitted (non-blank) id."""
        B, K = ids.shape
        if self.collapse == "merge":
            ids_a = jnp.where(active, ids, self.blank)
            arr = jnp.concatenate([prev_id[:, None], ids_a], axis=1)
            m = arr != self.blank
            lastnb = jax.lax.cummax(
                jnp.where(m, jnp.arange(K + 1, dtype=jnp.int32)[None, :],
                          -1),
                axis=1,
            )  # index of last non-blank up to t (incl the carry slot)
            prev_nb = jnp.where(
                lastnb[:, :-1] >= 0,
                jnp.take_along_axis(
                    arr, jnp.maximum(lastnb[:, :-1], 0), axis=1
                ),
                self.blank,
            )
            keep = (ids_a != self.blank) & (ids_a != prev_nb)
            last = lastnb[:, -1]
            new_prev = jnp.where(
                last >= 0,
                jnp.take_along_axis(arr, jnp.maximum(last, 0)[:, None],
                                    1)[:, 0],
                self.blank,
            )
            ids = ids_a
        else:
            prev_shift = jnp.concatenate(
                [prev_id[:, None], ids[:, :-1]], axis=1
            )
            keep = (ids != prev_shift) & (ids != self.blank) & active
            new_prev = jnp.where(active[:, 0], ids[:, -1], prev_id)
        pos = jnp.cumsum(keep, axis=1) - 1  # target slot per kept token
        out = jnp.full((B, K + 1), -1, jnp.int32)
        rows = jnp.arange(B)[:, None]
        # dump dropped tokens into the K-th scratch column
        out = out.at[rows, jnp.where(keep, pos, K)].set(
            jnp.where(keep, ids, -1)
        )
        counts = jnp.sum(keep, axis=1).astype(jnp.int32)
        return out[:, :K], counts, new_prev

    def _advance_beam(self, state, region_logits, can, region_logit_start):
        """Evolve the carried beam over the region's logits; per-stream
        length gating freezes rows past their utterance end (and all
        rows when `can` is false). prune=V: the streaming beam runs the
        EXACT candidate set, so finish() matches the exact offline beam
        (the offline TPU path dispatches to the exact Pallas kernel)."""
        B, K, V = region_logits.shape
        s = self.subsample
        logp = jax.nn.log_softmax(region_logits.astype(jnp.float32), -1)
        vlog = (state.valid_frames + s - 1) // s  # frame cap -> logits cap
        lengths = jnp.where(
            can, jnp.clip(vlog - region_logit_start, 0, K), 0
        )
        return beam_advance(
            state.beam, state.prefix, state.prefix_len, logp, lengths,
            blank_id=self.blank, prune=V, lm_logp=self.lm_logp,
            lm_weight=self.cfg.ctc.lm_weight,
            lm_bonus=self.cfg.ctc.lm_bonus,
        )

    def _step_recurrent(self, params, state: RecurrentState, audio_chunk):
        """Causal path: frontend chunk -> encoder.step with the carried
        recurrent state -> tokens. uni_gru emits the CURRENT chunk
        immediately; lc_bigru emits the chunk `delay` chunks back (its
        layers' backward windows each need the next chunk at their own
        rate), empty until the layer pipeline fills."""
        C, s = self.chunk, self.subsample
        fstate, feats = stream_chunk(
            state.frontend, audio_chunk, self.fe, self.cfg.frontend
        )
        a = state.n_frames  # [B] absolute frame index of this chunk's start
        if self.delay:
            logits, new_carry = self.model.apply(
                params, feats, a, state.valid_frames, state.carry,
                method="step",
            )
            estart = a - self.delay * C  # emitted region's first frame
        else:
            fv = jnp.clip(state.valid_frames - a, 0, C)  # valid frames
            logits, new_carry = self.model.apply(
                params, feats, fv, state.carry, method="step"
            )
            estart = a
        n = a + C
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        B, K = ids.shape
        can = estart >= 0
        pos = (jnp.maximum(estart, 0) // s)[:, None] \
            + jnp.arange(K)[None, :]
        vlog = (state.valid_frames + s - 1) // s
        active = can[:, None] & (pos < vlog[:, None])
        out, counts, prev = self._emit(ids, state.prev_id, active)
        if not self.use_beam:
            return RecurrentState(
                fstate, new_carry, n, prev, state.valid_frames
            ), out, counts
        beam, prefix, plen = self._advance_beam(
            state, logits, can, jnp.maximum(estart, 0) // s
        )
        new = BeamRecurrentState(
            fstate, new_carry, n, prev, state.valid_frames,
            beam, prefix, plen,
        )
        return new, out, counts

    def _finish_recurrent(self, params, state: RecurrentState):
        """Causal path: uni_gru decoded every chunk on arrival, so
        greedy has nothing to flush (beam mode reads out the best
        transcript). lc_bigru flushes its `delay`-chunk emission lag
        with zero-input steps — the flushed windows clamp at each
        stream's valid length exactly as the offline windows do."""
        B = state.prev_id.shape[0]
        K = self.chunk // self.subsample
        s = self.subsample
        if self.delay:
            C = self.chunk
            zeros = jnp.zeros(
                (B, C, self.cfg.frontend.num_mel_bins), jnp.float32
            )
            carry, nf, prev = state.carry, state.n_frames, state.prev_id
            vlog = (state.valid_frames + s - 1) // s
            if self.use_beam:
                beam, prefix, plen = state.beam, state.prefix, \
                    state.prefix_len
            outs = []
            for _ in range(self.delay):
                logits, carry = self.model.apply(
                    params, zeros, nf, state.valid_frames, carry,
                    method="step",
                )
                estart = nf - self.delay * C
                ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                can = estart >= 0
                pos = (jnp.maximum(estart, 0) // s)[:, None] \
                    + jnp.arange(K)[None, :]
                active = can[:, None] & (pos < vlog[:, None])
                out, _c, prev = self._emit(ids, prev, active)
                outs.append(out)
                if self.use_beam:
                    tmp = state._replace(beam=beam, prefix=prefix,
                                         prefix_len=plen)
                    beam, prefix, plen = self._advance_beam(
                        tmp, logits, can, jnp.maximum(estart, 0) // s
                    )
                nf = nf + C
            if self.use_beam:
                from uasr.ops.decode import _logaddexp

                best = jnp.argmax(_logaddexp(beam.p_b, beam.p_nb), 1)
                final = jnp.take_along_axis(
                    prefix, best[:, None, None], 1
                )[:, 0]
                final_len = jnp.take_along_axis(
                    plen, best[:, None], 1
                )[:, 0]
                return state, final, final_len
            # compact the per-flush left-aligned outputs into one row
            allv = jnp.concatenate(outs, axis=1)
            keep = allv >= 0
            W = allv.shape[1]
            pos2 = jnp.cumsum(keep, axis=1) - 1
            rows = jnp.arange(B)[:, None]
            res = jnp.full((B, W + 1), -1, jnp.int32)
            res = res.at[rows, jnp.where(keep, pos2, W)].set(
                jnp.where(keep, allv, -1)
            )
            return state._replace(prev_id=prev), res[:, :W], \
                keep.sum(axis=1).astype(jnp.int32)
        if not self.use_beam:
            return state, jnp.full((B, K), -1, jnp.int32), \
                jnp.zeros((B,), jnp.int32)
        from uasr.ops.decode import _logaddexp

        best = jnp.argmax(_logaddexp(state.beam.p_b, state.beam.p_nb), 1)
        final = jnp.take_along_axis(
            state.prefix, best[:, None, None], 1
        )[:, 0]
        final_len = jnp.take_along_axis(
            state.prefix_len, best[:, None], 1
        )[:, 0]
        return state, final, final_len

    def _step_impl(self, params, state: RecognizerState, audio_chunk):
        if self.recurrent:
            return self._step_recurrent(params, state, audio_chunk)
        C = self.chunk
        fstate, feats = stream_chunk(
            state.frontend, audio_chunk, self.fe, self.cfg.frontend
        )
        buf = self._push(state.feat_buf, state.n_frames, feats)
        n = state.n_frames + C  # [B] per-slot stream age
        # decode the previous chunk's region once it has C frames of
        # real right context; before that (first call) emit nothing
        can = n >= 2 * C  # [B]
        start = jnp.maximum(n - 2 * C, 0)
        region = self._decode_region_logits(
            buf, n, start, params, state.valid_frames
        )
        ids = jnp.argmax(region, axis=-1).astype(jnp.int32)
        B, K = ids.shape
        # positional mask: region logit (start//s + t) must be inside
        # the stream's own utterance (huge cap = open-ended stream)
        s = self.subsample
        pos = (start // s)[:, None] + jnp.arange(K)[None, :]
        vlog = (state.valid_frames + s - 1) // s
        active = can[:, None] & (pos < vlog[:, None])
        out, counts, prev = self._emit(ids, state.prev_id, active)
        if not self.use_beam:
            return RecognizerState(
                fstate, buf, n, prev, state.valid_frames
            ), out, counts
        beam, prefix, plen = self._advance_beam(
            state, region, can, start // self.subsample
        )
        new = BeamRecognizerState(
            fstate, buf, n, prev, state.valid_frames, beam, prefix, plen
        )
        return new, out, counts

    def _finish_impl(self, params, state: RecognizerState):
        if self.recurrent:
            return self._finish_recurrent(params, state)
        C = self.chunk
        n = state.n_frames  # [B]
        can = n >= C
        start = jnp.maximum(n - C, 0)
        region = self._decode_region_logits(
            state.feat_buf, n, start, params, state.valid_frames
        )
        ids = jnp.argmax(region, axis=-1).astype(jnp.int32)
        B, K = ids.shape
        s = self.subsample
        pos = (start // s)[:, None] + jnp.arange(K)[None, :]
        vlog = (state.valid_frames + s - 1) // s
        active = can[:, None] & (pos < vlog[:, None])
        out, counts, prev = self._emit(ids, state.prev_id, active)
        if not self.use_beam:
            return state._replace(prev_id=prev), out, counts
        # beam mode: finish returns the COMPLETE best transcript (the
        # greedy step() partials were provisional)
        from uasr.ops.decode import _logaddexp

        beam, prefix, plen = self._advance_beam(
            state, region, can, start // self.subsample
        )
        best = jnp.argmax(_logaddexp(beam.p_b, beam.p_nb), axis=1)  # [B]
        final = jnp.take_along_axis(
            prefix, best[:, None, None], 1
        )[:, 0]  # [B, Lmax]
        final_len = jnp.take_along_axis(plen, best[:, None], 1)[:, 0]
        new = BeamRecognizerState(
            state.frontend, state.feat_buf, n, prev, state.valid_frames,
            beam, prefix, plen,
        )
        return new, final, final_len
