"""HMM Viterbi decoding and CTC forced alignment, fully on device.

The unsupervised lineage the reference implements refines and decodes
its frame-level phone posteriors with an HMM whose transition model
comes from the unpaired phoneme text (Chen/Liu/Lee 2019 — the GAN
"harmonized with an iteratively refined HMM" that SURVEY.md's paper
list cites; wav2vec-U's Viterbi/Kaldi decode stage plays the same
role). The reference itself shipped only host-side greedy/beam CTC
decoding (SURVEY.md §3.4) — this module is the missing HMM stage,
TPU-first: max-plus `lax.scan` over static [B, S] state lattices, so
it jits, batches and shards like every other op, and pseudo-label
refinement (uasr.selftrain) never leaves the chip.

Two lattices are provided:

- `lm_hmm` + `viterbi_decode`: free decoding over a CTC-topology HMM
  (phone states + per-phone blank-hold states) whose phone→phone
  transitions are the bigram LM of the unpaired text. This replaces
  greedy argmax-collapse at eval/pseudo-labeling time with an
  LM-smoothed path — exactly the refinement the GAN+HMM papers use.
- `ctc_forced_align`: Viterbi over the 2L+1 CTC label lattice — the
  best monotonic alignment of a known transcript, yielding per-frame
  labels for `train.mode: frame_ce` (reference `ASR_align_DataSet`
  consumed externally-produced Kaldi alignments; this generates them
  inside the framework).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


# ---------------------------------------------------------------------------
# generic dense-transition Viterbi
# ---------------------------------------------------------------------------


def viterbi_decode(
    emit_logp: jax.Array,
    lengths: jax.Array,
    log_init: jax.Array,
    log_trans: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Max-plus Viterbi over a dense-transition HMM.

    emit_logp: [B, T, S] per-frame state emission log-probs.
    lengths:   [B] valid frame counts (states beyond are frozen).
    log_init:  [S] initial state log-probs.
    log_trans: [S, S] log P(s_t = j | s_{t-1} = i).

    Returns (states [B, T] int32 best path, score [B]). Rows t >=
    lengths[b] repeat the final state (identity backpointers), so the
    caller can mask with `lengths` exactly as for logits.
    """
    B, T, S = emit_logp.shape
    ident = jnp.arange(S, dtype=jnp.int32)[None, :]

    delta0 = log_init[None, :] + emit_logp[:, 0, :]

    def step(delta, inputs):
        emit_t, t = inputs  # [B, S], scalar
        # scores[b, i, j] = delta[b, i] + trans[i, j]
        scores = delta[:, :, None] + log_trans[None, :, :]
        bp = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [B, S]
        new = jnp.max(scores, axis=1) + emit_t
        active = (t < lengths)[:, None]
        return (
            jnp.where(active, new, delta),
            jnp.where(active, bp, ident),
        )

    delta, bps = jax.lax.scan(
        step,
        delta0,
        (jnp.moveaxis(emit_logp[:, 1:, :], 1, 0), jnp.arange(1, T)),
    )  # bps: [T-1, B, S]

    best = jnp.argmax(delta, axis=1).astype(jnp.int32)  # [B]
    score = jnp.max(delta, axis=1)

    def back(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], 1)[:, 0]
        return prev, state

    # reverse traceback: `rest[k]` is the state at time k+1 (the scan
    # emits its carry AFTER consuming bps[k]); `first` is the t=0 state
    first, rest = jax.lax.scan(back, best, bps, reverse=True)
    if T > 1:
        states = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        states = best[:, None]
    return states, score


# ---------------------------------------------------------------------------
# CTC-topology HMM with bigram-LM transitions
# ---------------------------------------------------------------------------


def lm_hmm(
    lm_logp: np.ndarray,
    blank_id: int,
    self_loop: float = 0.75,
    blank_prob: float = 0.1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the CTC-topology HMM from a bigram LM table.

    lm_logp: [V + 1, V] table from `uasr.ops.lm.build_bigram_lm` (row
    V = start-of-sequence; the blank COLUMN carries ~0 mass).

    States (S = 2V + 1):
      s in [0, V):   emitting phone s           (dead for s == blank_id)
      s in [V, 2V):  blank hold after phone s-V (dead for blank phone)
      s == 2V:       initial blank (start-of-sequence LM history)

    Transitions (probability space, rows renormalized over live states):
      phone i:  self_loop -> i | blank_prob -> blank_i
                | rest * P_lm(j | i) -> phone j != i
      blank_i:  self_loop -> blank_i | rest * P_lm(j | i) -> any phone j
                (j == i re-enters as a NEW token — CTC semantics)
      init blank: self_loop hold | rest * P_lm(j | SOS)

    Returns (log_init [S], log_trans [S, S], emit_cols [S] int32) with
    emit_cols mapping each state to the logits column it consumes.
    """
    V = lm_logp.shape[1]
    if lm_logp.ndim != 2 or lm_logp.shape[0] != V + 1:
        raise ValueError(
            f"lm_hmm needs a bigram [V+1, V] table, got {lm_logp.shape}"
        )
    S = 2 * V + 1
    P = np.exp(lm_logp.astype(np.float64))  # [V+1, V]
    live = np.ones(V, bool)
    live[blank_id] = False
    # renormalize LM rows over live phone columns
    P = P * live[None, :]
    P = P / np.maximum(P.sum(axis=1, keepdims=True), 1e-30)

    trans = np.zeros((S, S), np.float64)
    for i in range(V):
        if not live[i]:
            continue
        # phone -> phone (exclude self: the self-loop carries that mass)
        row = P[i].copy()
        denom = row.sum() - row[i]
        rest = max(1.0 - self_loop - blank_prob, 1e-6)
        if denom > 1e-30:
            trans[i, :V] = rest * row / denom
            trans[i, i] = 0.0
        trans[i, i] = self_loop
        trans[i, V + i] = blank_prob
        # blank_i -> phones (all live, LM history = i) / hold
        trans[V + i, :V] = (1.0 - self_loop) * P[i]
        trans[V + i, V + i] = self_loop
    # initial blank: SOS history
    trans[2 * V, :V] = (1.0 - self_loop) * P[V]
    trans[2 * V, 2 * V] = self_loop

    init = np.zeros(S, np.float64)
    init[:V] = 0.5 * P[V]
    init[2 * V] = 0.5

    with np.errstate(divide="ignore"):
        log_trans = np.where(trans > 0, np.log(trans), NEG)
        log_init = np.where(init > 0, np.log(init), NEG)

    emit_cols = np.concatenate(
        [np.arange(V), np.full(V + 1, blank_id)]
    ).astype(np.int32)
    return (
        log_init.astype(np.float32),
        log_trans.astype(np.float32),
        emit_cols,
    )


def greedy_path_stats(
    logits: jax.Array, lengths: jax.Array, blank_id: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy-argmax path statistics for `estimate_hmm_rates`:
    (valid_steps, blank_steps, tokens) summed over the batch, where
    `tokens` counts collapsed non-blank runs (what greedy decode would
    emit). Jittable; scalars only cross the host boundary."""
    B, T = logits.shape[:2]
    am = jnp.argmax(logits, axis=-1)
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    blank = (am == blank_id) & valid
    prev = jnp.pad(am, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    tok = (am != blank_id) & (am != prev) & valid
    return valid.sum(), blank.sum(), tok.sum()


def estimate_hmm_rates(
    valid_steps: int, blank_steps: int, tokens: int
) -> tuple[float, float]:
    """Calibrate `lm_hmm`'s dwell prior to the stream being decoded.

    self_loop ≈ 1 - 1/dwell with dwell = non-blank steps per emitted
    token: a frame-level 33 Hz stream with ~4-frame phones gives ~0.75
    (the historical default), while a merged SEGMENT-level stream (a
    `gan.merge_repeats` generator) has dwell ≈ 1 → self_loop ≈ 0.
    Without this calibration the transition prior out-votes the
    emissions on segment streams and merges adjacent segments — the
    round-3 self-training regression: Viterbi pseudo-labels lost half
    their tokens (label PER 0.53 vs greedy 0.19 on the q9 protocol,
    NOTES_ROUND4.md). blank_prob scales with the observed blank
    fraction of the greedy path (floored so repeated phones stay
    expressible via the blank-hold state)."""
    valid_steps = max(int(valid_steps), 1)
    nonblank = max(valid_steps - int(blank_steps), 1)
    dwell = nonblank / max(int(tokens), 1)
    self_loop = float(np.clip(1.0 - 1.0 / max(dwell, 1.0), 0.0, 0.95))
    blank_frac = int(blank_steps) / valid_steps
    blank_prob = float(
        np.clip(blank_frac * (1.0 - self_loop), 0.01, 0.4)
    )
    return self_loop, blank_prob


def resolve_viterbi_rates(
    ctc_cfg, probe_logits, probe_batches, max_batches: int = 4
) -> tuple[float, float, str]:
    """Resolve the HMM dwell rates for a decode/labeling run.

    Policy (ADVICE round 4): `ctc.viterbi_auto_rates` only calibrates
    when the user LEFT `viterbi_self_loop`/`viterbi_blank_prob` at
    their dataclass defaults — explicitly tuned rates are never
    silently replaced. Calibration averages `greedy_path_stats` over up
    to `max_batches` probe batches, so one atypical first batch cannot
    skew the dwell estimate for the whole run.

    probe_logits: Batch -> (logits, out_lengths) under the model being
    decoded. probe_batches: iterable of raw batch tuples (only
    `max_batches` are consumed). Returns (self_loop, blank_prob,
    human-readable provenance string for the caller's log line)."""
    import jax.numpy as _jnp

    from uasr.config import CTCConfig
    from uasr.data.dataset import Batch

    sl, bp = ctc_cfg.viterbi_self_loop, ctc_cfg.viterbi_blank_prob
    if not ctc_cfg.viterbi_auto_rates:
        return sl, bp, "explicit (viterbi_auto_rates off)"
    defaults = (CTCConfig.viterbi_self_loop, CTCConfig.viterbi_blank_prob)
    if (sl, bp) != defaults:
        return sl, bp, (
            "explicit rates kept (viterbi_self_loop/viterbi_blank_prob "
            "differ from defaults; auto-calibration skipped)"
        )
    totals = np.zeros(3, np.int64)
    n = 0
    for b in probe_batches:
        if not isinstance(b, Batch):
            b = Batch(*map(_jnp.asarray, b))
        logits, out_len = probe_logits(b)
        totals += np.array(
            [int(x) for x in
             greedy_path_stats(logits, out_len, ctc_cfg.blank_id)],
            np.int64,
        )
        n += 1
        if n >= max_batches:
            break
    if n == 0:
        return sl, bp, "defaults (no probe batches available)"
    sl, bp = estimate_hmm_rates(*totals)
    return sl, bp, f"calibrated over {n} probe batch(es)"


def viterbi_lm_decode(
    logits: jax.Array,
    lengths: jax.Array,
    hmm: tuple,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """LM-smoothed HMM decode of frame/segment logits.

    hmm = (log_init, log_trans, emit_cols) from `lm_hmm` (host numpy;
    pass through jnp.asarray once outside jit if reusing).
    Returns (ids [B, T] left-compacted, out_lengths [B], score [B]) —
    the same contract as `ctc_greedy_decode` plus the path score.
    """
    log_init, log_trans, emit_cols = (jnp.asarray(a) for a in hmm)
    B, T, V = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    emit = jnp.take(logp, emit_cols, axis=2)  # [B, T, S]
    states, score = viterbi_decode(emit, lengths, log_init, log_trans)
    ids, out_len = states_to_tokens(states, lengths, V, blank_id)
    return ids, out_len, score


def states_to_tokens(
    states: jax.Array, lengths: jax.Array, vocab_size: int, blank_id: int
) -> tuple[jax.Array, jax.Array]:
    """Collapse an HMM state path to token ids: a token is emitted on
    entry into a phone state (s < V) from a different state. Returns
    (ids [B, T] left-compacted padded with blank_id, out_lengths [B])."""
    B, T = states.shape
    V = vocab_size
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < lengths[:, None]
    is_phone = states < V
    prev = jnp.pad(states, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    keep = is_phone & (states != prev) & valid
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)
    out = jnp.full((B, T), blank_id, jnp.int32)
    b_idx = jnp.arange(B)[:, None].repeat(T, 1)
    out = out.at[b_idx, pos].set(states.astype(jnp.int32), mode="drop")
    return out, keep.sum(axis=1)


# ---------------------------------------------------------------------------
# trigram CTC-topology HMM (structured (prev, cur) phone-pair lattice)
# ---------------------------------------------------------------------------


def trigram_hmm(
    lm3: np.ndarray,
    blank_id: int,
    self_loop: float = 0.75,
    blank_prob: float = 0.1,
) -> dict:
    """Host-built log-coefficient tensors for `viterbi_trigram_decode`.

    lm3: [V+1, V+1, V] trigram table from `build_trigram_lm` /
    `prepare import-arpa` (history index V = start-of-sequence).

    A dense trigram HMM would need S = O(V^2) states and the generic
    `viterbi_decode`'s [B, S, S] step tensor — 40 MB/step/utt at V=40.
    Instead the lattice is kept STRUCTURED: states are phone-pair
    histories (a, b) (plus per-pair blank holds and one initial blank),
    and each Viterbi step contracts only over the single predecessor
    slot `a` — [B, H, V, V] work instead of [B, S, S]
    (VERDICT round-3 item 8; the same factorization the in-kernel
    beam's one-hot GEMM exploits).

    Returns the dict of jnp coefficient tensors consumed by
    `viterbi_trigram_decode`.
    """
    Vp1, Vp1b, V = lm3.shape
    if Vp1 != V + 1 or Vp1b != V + 1:
        raise ValueError(
            f"trigram_hmm needs a [V+1, V+1, V] table, got {lm3.shape}"
        )
    H = V + 1
    P = np.exp(lm3.astype(np.float64))  # [H, H, V]
    live = np.ones(V, bool)
    live[blank_id] = False
    P = P * live[None, None, :]
    P = P / np.maximum(P.sum(axis=2, keepdims=True), 1e-30)

    rest = max(1.0 - self_loop - blank_prob, 1e-6)
    # advance P(a, b) -> P(b, c), c != b: log(rest * P(c|a,b)) with the
    # self column's mass renormalized away (the self-loop carries it)
    Pb = P[:, :V, :].copy()  # histories with a real current phone b
    b_idx = np.arange(V)
    self_col = Pb[:, b_idx, b_idx]  # [H, V]
    denom = np.maximum(Pb.sum(axis=2) - self_col, 1e-30)  # [H, V]
    adv = Pb / denom[:, :, None]
    adv[:, b_idx, b_idx] = 0.0
    with np.errstate(divide="ignore"):
        log_adv = np.where(adv > 0, np.log(rest * adv), NEG)
        # blank exit B(a, b) -> P(b, c), any live c (repeat re-entry)
        log_exit = np.where(
            Pb > 0, np.log(max(1.0 - self_loop, 1e-6) * Pb), NEG
        )
        # initial blank -> P(SOS, c)
        log_init_c = np.where(
            P[V, V] > 0,
            np.log(max(1.0 - self_loop, 1e-6) * P[V, V]), NEG,
        )
        # t=0: P(SOS, c) with prob 0.5 * P(c|SOS,SOS), I with 0.5
        log_start_c = np.where(
            P[V, V] > 0, np.log(0.5 * P[V, V]), NEG
        )
    return {
        "V": V,
        "blank_id": blank_id,
        "log_adv": jnp.asarray(log_adv, jnp.float32),      # [H, V, V]
        "log_exit": jnp.asarray(log_exit, jnp.float32),    # [H, V, V]
        "log_init_c": jnp.asarray(log_init_c, jnp.float32),  # [V]
        "log_start_c": jnp.asarray(log_start_c, jnp.float32),  # [V]
        "log_sl": jnp.float32(np.log(max(self_loop, 1e-30))),
        "log_bp": jnp.float32(np.log(max(blank_prob, 1e-30))),
        "log_start_i": jnp.float32(np.log(0.5)),
        "live": jnp.asarray(live),
    }


def viterbi_trigram_decode(
    logits: jax.Array,
    lengths: jax.Array,
    hmm3: dict,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Trigram-LM-smoothed HMM decode (same contract as
    `viterbi_lm_decode`): (ids [B, T] left-compacted, out_lengths [B],
    path score [B]).

    State = (kind, a, b): kind 0 = emitting phone b with previous
    phone a (a = V means start-of-sequence), kind 1 = blank hold after
    pair (a, b), kind 2 = the initial blank. The scan carries
    delta_P/delta_B [B, H, V] + delta_I [B]; backpointers pack
    (source kind, source a) into one int32 per state per step.
    """
    B, T, Vl = logits.shape
    V = hmm3["V"]
    if Vl != V:
        raise ValueError(f"logits V={Vl} != table V={V}")
    H = V + 1
    logp = jax.nn.log_softmax(logits, axis=-1)
    emit_tok = logp  # [B, T, V]
    emit_blank = logp[:, :, blank_id]  # [B, T]
    log_adv, log_exit = hmm3["log_adv"], hmm3["log_exit"]
    log_sl, log_bp = hmm3["log_sl"], hmm3["log_bp"]
    live = hmm3["live"]

    # ---- t = 0
    dP0 = jnp.full((B, H, V), NEG)
    dP0 = dP0.at[:, V, :].set(
        hmm3["log_start_c"][None, :] + emit_tok[:, 0, :]
    )
    dB0 = jnp.full((B, H, V), NEG)
    dI0 = hmm3["log_start_i"] + emit_blank[:, 0]

    def step(carry, inputs):
        dP, dB, dI = carry
        e_tok, e_blk, t = inputs  # [B, V], [B], scalar
        # entry into P(b, c) (new history (b, c)), contracted over a
        fromP = jnp.max(
            dP[:, :, :, None] + log_adv[None, :, :, :], axis=1
        )  # [B, V, V] indexed (b, c)
        argP = jnp.argmax(
            dP[:, :, :, None] + log_adv[None, :, :, :], axis=1
        ).astype(jnp.int32)
        fromB = jnp.max(
            dB[:, :, :, None] + log_exit[None, :, :, :], axis=1
        )
        argB = jnp.argmax(
            dB[:, :, :, None] + log_exit[None, :, :, :], axis=1
        ).astype(jnp.int32)
        # candidates for new dP[a, b]:
        #   code 0: stay              (all a)
        #   code 1: advance from P    (a real)
        #   code 2: exit from B       (a real)
        #   code 3: from initial blank (a == SOS only)
        stay = dP + log_sl
        entry_real = jnp.stack([fromP, fromB], axis=0)  # [2, B, V, V]
        best_entry = jnp.max(entry_real, axis=0)
        which = jnp.argmax(entry_real, axis=0).astype(jnp.int32)  # 0=P,1=B
        ent = jnp.full((B, H, V), NEG)
        ent = ent.at[:, :V, :].set(best_entry)
        ent = ent.at[:, V, :].set(dI[:, None] + hmm3["log_init_c"][None, :])
        newP = jnp.maximum(stay, ent)
        is_entry = ent > stay
        code = jnp.where(
            is_entry,
            jnp.where(
                jnp.arange(H)[None, :, None] == V,
                3,
                1 + jnp.pad(which, ((0, 0), (0, 1), (0, 0)))[:, :H, :],
            ),
            0,
        )
        src_a = jnp.where(
            code == 1,
            jnp.pad(argP, ((0, 0), (0, 1), (0, 0)))[:, :H, :],
            jnp.where(
                code == 2,
                jnp.pad(argB, ((0, 0), (0, 1), (0, 0)))[:, :H, :],
                0,
            ),
        )
        newP = newP + e_tok[:, None, :]
        newP = jnp.where(live[None, None, :], newP, NEG)
        # blank holds
        stayB = dB + log_sl
        toB = dP + log_bp
        newB = jnp.maximum(stayB, toB) + e_blk[:, None, None]
        codeB = (toB > stayB).astype(jnp.int32)  # 1 = entered from P
        newI = dI + log_sl + e_blk
        bpP = src_a * 4 + code  # packed int32 [B, H, V]
        active = (t < lengths)[:, None, None]
        out = (
            jnp.where(active, newP, dP),
            jnp.where(active, newB, dB),
            jnp.where(active[:, 0, 0], newI, dI),
        )
        bp = (
            jnp.where(active, bpP, 0),
            jnp.where(active, codeB, 0),
        )
        return out, bp

    if T > 1:
        (dP, dB, dI), (bpP, bpB) = jax.lax.scan(
            step,
            (dP0, dB0, dI0),
            (
                jnp.moveaxis(emit_tok[:, 1:, :], 1, 0),
                jnp.moveaxis(emit_blank[:, 1:], 1, 0),
                jnp.arange(1, T),
            ),
        )
    else:
        dP, dB, dI = dP0, dB0, dI0
        bpP = jnp.zeros((0, B, H, V), jnp.int32)
        bpB = jnp.zeros((0, B, H, V), jnp.int32)

    # ---- final state
    flatP = dP.reshape(B, H * V)
    flatB = dB.reshape(B, H * V)
    allf = jnp.concatenate([flatP, flatB, dI[:, None]], axis=1)
    best = jnp.argmax(allf, axis=1).astype(jnp.int32)
    score = jnp.max(allf, axis=1)
    kind = jnp.where(best < H * V, 0, jnp.where(best < 2 * H * V, 1, 2))
    idx = jnp.where(kind < 2, best % (H * V), 0)
    a = idx // V
    b = idx % V

    def back(carry, bps):
        kind, a, b = carry
        bpP_t, bpB_t = bps  # [B, H, V]
        flat_idx = a * V + b
        pp = jnp.take_along_axis(
            bpP_t.reshape(B, H * V), flat_idx[:, None], 1
        )[:, 0]
        pb = jnp.take_along_axis(
            bpB_t.reshape(B, H * V), flat_idx[:, None], 1
        )[:, 0]
        codeP, src_a = pp % 4, pp // 4
        # P-state transitions
        pk = jnp.where(codeP == 0, 0, jnp.where(codeP == 2, 1, 0))
        pk = jnp.where(codeP == 3, 2, pk)  # from initial blank
        pa = jnp.where(codeP == 0, a, src_a)
        pb_ = jnp.where(codeP == 0, b, a)
        # entry flag: a token was emitted AT this step
        entered = (kind == 0) & (codeP != 0)
        # B-state transitions: 0 stay-B, 1 from-P (same (a, b))
        bk = jnp.where(pb == 1, 0, 1)
        nk = jnp.where(kind == 0, pk, jnp.where(kind == 1, bk, 2))
        na = jnp.where(kind == 0, pa, jnp.where(kind == 1, a, 0))
        nb = jnp.where(kind == 0, pb_, jnp.where(kind == 1, b, 0))
        tok = jnp.where(kind == 0, b, -1)
        return (nk, na, nb), (tok, entered)

    if T > 1:
        (k0, a0, b0), (toks, entered) = jax.lax.scan(
            back, (kind, a, b), (bpP, bpB), reverse=True
        )
        toks = jnp.concatenate(
            [jnp.where(k0 == 0, b0, -1)[None], toks], axis=0
        )  # [T, B]
        entered = jnp.concatenate(
            [(k0 == 0)[None], entered], axis=0
        )
        toks = toks.T
        entered = entered.T
    else:
        toks = jnp.where(kind == 0, b, -1)[:, None]
        entered = (kind == 0)[:, None]

    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < lengths[:, None]
    keep = entered & (toks >= 0) & valid
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)
    out = jnp.full((B, T), blank_id, jnp.int32)
    b_rows = jnp.arange(B)[:, None].repeat(T, 1)
    out = out.at[b_rows, pos].set(toks.astype(jnp.int32), mode="drop")
    return out, keep.sum(axis=1), score


def make_lm_decoder(
    table: np.ndarray,
    blank_id: int,
    self_loop: float = 0.75,
    blank_prob: float = 0.1,
):
    """Uniform entry point for LM-HMM Viterbi decoding: returns
    `decode(logits, lengths) -> (ids, out_len, score)` for a BIGRAM
    [V+1, V] or TRIGRAM [V+1, V+1, V] table (infer / selftrain route
    through this, so `ctc.use_viterbi` accepts either — the framework's
    own `prepare lm --order 3` / `import-arpa` trigrams are no longer
    beam-only)."""
    if table.ndim == 2:
        hmm = tuple(jnp.asarray(x) for x in lm_hmm(
            table, blank_id, self_loop=self_loop, blank_prob=blank_prob
        ))
        return lambda logits, lengths: viterbi_lm_decode(
            logits, lengths, hmm, blank_id
        )
    if table.ndim == 3:
        hmm3 = trigram_hmm(
            table, blank_id, self_loop=self_loop, blank_prob=blank_prob
        )
        return lambda logits, lengths: viterbi_trigram_decode(
            logits, lengths, hmm3, blank_id
        )
    raise ValueError(f"LM table rank {table.ndim} unsupported")


# ---------------------------------------------------------------------------
# CTC forced alignment (Viterbi over the 2L+1 label lattice)
# ---------------------------------------------------------------------------


def ctc_forced_align(
    logits: jax.Array,
    lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Best CTC alignment of known transcripts: per-frame label ids.

    logits: [B, T, V] raw logits; labels: [B, L] token ids (no blanks).
    Returns (frame_ids [B, T] int32 — blank_id or the aligned label at
    each frame, frames t >= lengths[b] set to blank_id; score [B] log
    prob of the best path). A zero-length transcript aligns to all
    blanks.

    Same lattice as the CTC loss (uasr/ops/ctc.py): S = 2L + 1 states,
    even = blank, odd s = labels[(s-1)//2]; transitions stay/advance/
    skip (skip only between distinct labels across a blank). Max-plus
    instead of log-sum-exp, with [B, S] shifts instead of a dense
    [S, S] matrix — the band never materializes.
    """
    B, T, V = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    logp = jax.nn.log_softmax(logits, axis=-1)

    s_idx = jnp.arange(S)
    is_lab = (s_idx % 2) == 1
    lab_pos = jnp.clip((s_idx - 1) // 2, 0, L - 1)
    # state -> emitted token column
    state_tok = jnp.where(
        is_lab[None, :], jnp.take_along_axis(
            labels, jnp.broadcast_to(lab_pos[None, :], (B, S)) % L, axis=1
        ), blank_id,
    )  # [B, S]
    # dead states beyond this utterance's transcript
    alive = s_idx[None, :] < (2 * label_lengths[:, None] + 1)
    # skip (s-2 -> s) allowed only into a label state whose label
    # differs from the previous label state's
    prev_lab = jnp.take_along_axis(
        labels, jnp.maximum(lab_pos[None, :] - 1, 0) % L, axis=1
    )
    can_skip = (
        is_lab[None, :] & (lab_pos[None, :] >= 1)
        & (state_tok != prev_lab)
    )

    def emit_at(t):
        return jnp.take_along_axis(logp[:, t, :], state_tok, axis=1)

    emit0 = jnp.take_along_axis(logp[:, 0, :], state_tok, axis=1)
    start_ok = (s_idx[None, :] <= 1) & alive
    delta0 = jnp.where(start_ok, emit0, NEG)
    ident = jnp.zeros((B, S), jnp.int32)  # backpointer = shift amount

    def shift(x, k):
        return jnp.pad(x, ((0, 0), (k, 0)), constant_values=NEG)[:, :S]

    def step(delta, inputs):
        emit_t, t = inputs
        stay = delta
        adv = shift(delta, 1)
        skp = jnp.where(can_skip, shift(delta, 2), NEG)
        stacked = jnp.stack([stay, adv, skp], axis=0)  # [3, B, S]
        bp = jnp.argmax(stacked, axis=0).astype(jnp.int32)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(alive, best + emit_t, NEG)
        active = (t < lengths)[:, None]
        return (
            jnp.where(active, new, delta),
            jnp.where(active, bp, ident),
        )

    emits = jax.vmap(emit_at)(jnp.arange(1, T)) if T > 1 else jnp.zeros(
        (0, B, S)
    )
    delta, bps = jax.lax.scan(step, delta0, (emits, jnp.arange(1, T)))

    # final state: best of last blank (2*l) and last label (2*l - 1)
    end_b = 2 * label_lengths
    end_l = jnp.maximum(2 * label_lengths - 1, 0)
    d_endb = jnp.take_along_axis(delta, end_b[:, None], 1)[:, 0]
    d_endl = jnp.take_along_axis(delta, end_l[:, None], 1)[:, 0]
    best = jnp.where(d_endl > d_endb, end_l, end_b).astype(jnp.int32)
    score = jnp.maximum(d_endb, d_endl)

    def back(state, bp_t):
        k = jnp.take_along_axis(bp_t, state[:, None], 1)[:, 0]
        return state - k, state

    first, rest = jax.lax.scan(back, best, bps, reverse=True)
    if T > 1:
        states = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        states = best[:, None]
    frame_ids = jnp.take_along_axis(state_tok, states, axis=1)
    t_idx = jnp.arange(T)[None, :]
    frame_ids = jnp.where(t_idx < lengths[:, None], frame_ids, blank_id)
    # zero-length transcripts: lattice is the single blank state
    frame_ids = jnp.where(
        (label_lengths == 0)[:, None] & (t_idx < lengths[:, None]),
        blank_id, frame_ids,
    )
    return frame_ids.astype(jnp.int32), score
