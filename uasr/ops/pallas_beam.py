"""Pallas TPU kernel for CTC prefix beam search (the whole per-step
update fused into one kernel).

Why: the XLA beam step is ~40 small HLOs over [B, W·V]-sized tensors;
inside a `lax.scan` each costs scheduling/launch latency that dwarfs its
arithmetic — measured ~200 us per timestep on v5e (beam-only, B=128,
W=8, V=64), i.e. the decoder is latency-bound, not compute-bound. Here
the entire recursion runs as ONE kernel: the grid iterates (batch tile,
time), beam state lives in VMEM scratch across steps, and every op is a
straight-line VPU instruction.

Design (mirrors `ctc_beam_search_decode(merge_impl="fold")`, the exact
O(W^2) merge — see uasr/ops/decode.py):

  - candidates = W stays + W*V extends, laid out as one [BT, W*V + W]
    lane dimension; no per-beam pruning at all (the kernel is EXACT,
    equivalent to prune >= V);
  - duplicate prefixes can only be ext(w, c) == stay(w') with
    c == last[w']: folded via W*W hash comparisons before selection;
  - top-W selection = W rounds of (max, first-argmax, mask) — no sort;
  - prefix hashes are never stored per candidate: an extension's hash
    derives arithmetically from (parent hash, char), a stay's is the
    parent's. Dead selections get per-slot sentinel hashes so a stale
    duplicate can never alias a live prefix;
  - backpointers (parent, char) stream out per step; the winning prefix
    is rebuilt by the same O(T) reverse traceback as the XLA path;
  - everything stays 2D [BT, lanes] (per-beam scalars are [BT, 1]
    columns) — Mosaic-friendly layouts, no 1D vectors.

Shallow n-gram LM fusion runs IN-KERNEL: phone-vocabulary LM tables are
small (bigram [V+1, V] ~17 KB, trigram [(V+1)^2, V] ~1 MB at V=64), so
the whole table lives in VMEM for the entire recursion and the per-beam
"dynamic row gather" the XLA path does becomes a one-hot GEMM on the
MXU: onehot(history) [BT, H] @ table [H, V] -> the LM row for every
batch element of a beam in one matmul (H = V+1 for bigram, (V+1)^2 for
trigram with the joint (last2, last) history flattened). Tables too big
for VMEM dispatch to the XLA path (`lm_table_fits_vmem`).

Verified in interpreter mode against the XLA implementation (which is
itself brute-force-verified) — tests/test_pallas_beam.py; compiled-path
parity on hardware via `uasr.tools.tpu_selftest beam`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
# Knuth multiplicative hash, 2654435761 as a wrapped int32 (hash algebra
# is mod 2^32; only equality matters)
_HASH_MULT = -1640531535
_HASH2_MULT = 40503
_SENT1 = -0x40000000  # per-slot sentinel bases for dead beams
_SENT2 = -0x20000000


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return jnp.where(
        m <= NEG, NEG, m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))
    )


def _beam_kernel(
    *refs,
    W: int,
    V: int,
    blank_id: int,
    lm_order: int = 0,      # 0 = no LM, 2 = bigram, 3 = trigram
    lm_weight: float = 1.0,
    lm_bonus: float = 0.0,
    H: int = 0,             # padded history-row count of the LM table
):
    # positional refs: inputs, outputs, scratch (lm_ref only when fused)
    #   lp_ref   [1, BT, V] log-softmax at step t
    #   len_ref  [BT, W]    lengths (lane-broadcast)
    #   lm_ref   [H, V]     dense LM log-prob table (lm_order > 0 only)
    #   parent_ref / char_ref  out [1, BT, W] backpointers
    #   pb_ref / pnb_ref       out [BT, W] final state
    #   *_s                    scratch [BT, W]
    if lm_order:
        lp_ref, len_ref, lm_ref = refs[:3]
        rest = refs[3:]
    else:
        lp_ref, len_ref = refs[:2]
        lm_ref = None
        rest = refs[2:]
    (parent_ref, char_ref, pb_ref, pnb_ref,
     last_s, last2_s, h1_s, h2_s, pb_s, pnb_s) = rest
    t = pl.program_id(1)
    BT = pb_s.shape[0]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)

    @pl.when(t == 0)
    def _():
        last_s[...] = jnp.full((BT, W), -1, jnp.int32)
        last2_s[...] = jnp.full((BT, W), -1, jnp.int32)
        h1_s[...] = jnp.zeros((BT, W), jnp.int32)
        h2_s[...] = jnp.zeros((BT, W), jnp.int32)
        pb_s[...] = jnp.where(w_iota == 0, 0.0, NEG).astype(jnp.float32)
        pnb_s[...] = jnp.full((BT, W), NEG, jnp.float32)

    lp = lp_ref[0]            # [BT, V]
    last = last_s[...]
    last2 = last2_s[...]
    h1 = h1_s[...]
    h2 = h2_s[...]
    p_b = pb_s[...]
    p_nb = pnb_s[...]

    lp_blank = lp[:, blank_id : blank_id + 1]    # [BT, 1]
    total_prev = _logaddexp(p_b, p_nb)           # [BT, W]

    # ---- stay candidates
    stay_pb = total_prev + lp_blank              # [BT, W]
    # lp at each beam's last symbol: one-hot contraction per beam column
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, V), 1)
    lp_last_cols = []
    for w in range(W):
        sel = v_iota == last[:, w : w + 1]
        lp_last_cols.append(
            jnp.sum(jnp.where(sel, lp, 0.0), axis=1, keepdims=True)
        )
    lp_last = jnp.concatenate(lp_last_cols, axis=1)  # [BT, W]
    stay_pnb = jnp.where(last >= 0, p_nb + lp_last, NEG)

    # ---- extend candidates, per-beam [BT, V] columns (col = w*V + c)
    if lm_order:
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, H), 1)
        lm_tab = lm_ref[...]                     # [H, V], VMEM-resident
    ext_cols = []
    for w in range(W):
        base_w = jnp.where(
            v_iota == last[:, w : w + 1],
            p_b[:, w : w + 1],
            total_prev[:, w : w + 1],
        )
        e = base_w + lp
        if lm_order:
            # per-beam LM row = one-hot(history) @ table: the MXU does
            # the dynamic gather (matches decode.py's lm_logp[hist] /
            # lm_logp[hist2, hist] exactly, incl. the start row V)
            lw = last[:, w : w + 1]              # [BT, 1]
            hist = jnp.where(lw >= 0, lw, V)
            if lm_order == 3:
                lw2 = last2[:, w : w + 1]
                hist2 = jnp.where(lw2 >= 0, lw2, V)
                hist = hist2 * (V + 1) + hist    # joint flattened row
            onehot = (h_iota == hist).astype(jnp.float32)
            # HIGHEST: the default MXU precision rounds the f32 table
            # to bf16 before the multiply (measured 0.07 score drift on
            # v5e); full-precision passes keep 1.0 * logp exact
            lm_row = jnp.dot(onehot, lm_tab,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            e = e + lm_weight * lm_row + lm_bonus
        e = jnp.where(v_iota == blank_id, NEG, e)
        ext_cols.append(e)

    # ---- fold ext(w, c=last[w']) into stay(w') when the prefixes match
    stay_pnb_cols = [stay_pnb[:, wp : wp + 1] for wp in range(W)]
    for wp in range(W):
        c_p = last[:, wp : wp + 1]               # [BT, 1]
        live = c_p >= 0
        sel = v_iota == c_p                      # [BT, V]
        contribs = []
        for w in range(W):
            m = (
                live
                & (h1[:, w : w + 1] * _HASH_MULT + (c_p + 1)
                   == h1[:, wp : wp + 1])
                & (h2[:, w : w + 1] * _HASH2_MULT + (c_p + 7)
                   == h2[:, wp : wp + 1])
            )                                    # [BT, 1]
            g = jnp.sum(jnp.where(sel, ext_cols[w], 0.0), axis=1,
                        keepdims=True)
            contribs.append(jnp.where(m, g, NEG))
            ext_cols[w] = jnp.where(m & sel, NEG, ext_cols[w])
        fold = functools.reduce(_logaddexp, contribs)
        stay_pnb_cols[wp] = _logaddexp(stay_pnb_cols[wp], fold)
    stay_pnb = jnp.concatenate(stay_pnb_cols, axis=1)  # [BT, W]
    ext = jnp.concatenate(ext_cols, axis=1)      # [BT, W*V]

    # ---- candidate totals: [BT, K], K = W*V + W (ext first, then stay)
    K = W * V + W
    stay_total = _logaddexp(stay_pb, stay_pnb)
    cand = jnp.concatenate([ext, stay_total], axis=1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, K), 1)

    # ---- top-W selection: W rounds of (max, first-argmax, mask)
    sel_cols = []
    for _ in range(W):
        m = jnp.max(cand, axis=1, keepdims=True)          # [BT, 1]
        hit = cand == m
        col = jnp.min(jnp.where(hit, k_iota, K), axis=1,
                      keepdims=True)                      # first argmax
        sel_cols.append(col)
        cand = jnp.where(k_iota == col, NEG, cand)

    # ---- rebuild selected state (hashes derive from (parent, char))
    # NOT k_iota[:, : W * V]: a strided slice of a broadcasted_iota hits
    # a Mosaic ApplyVectorLayout crash ("limits[i] <= dim(i)" in
    # vector_extract_strided_slice); materializing the iota at the
    # needed width avoids the slice entirely
    kv_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, W * V), 1)
    new_last, new_last2, new_h1, new_h2 = [], [], [], []
    new_pb, new_pnb, out_parent, out_char = [], [], [], []
    for w in range(W):
        col = sel_cols[w]                        # [BT, 1]
        is_ext = col < W * V
        parent = jnp.where(is_ext, col // V, col - W * V)
        char = jnp.where(is_ext, col % V, -1)
        p_last = jnp.zeros_like(col)
        p_last2 = jnp.zeros_like(col)
        p_h1 = jnp.zeros_like(col)
        p_h2 = jnp.zeros_like(col)
        p_pb = jnp.zeros(col.shape, jnp.float32)
        p_pnb = jnp.zeros(col.shape, jnp.float32)
        for wp in range(W):
            hitp = parent == wp
            p_last = jnp.where(hitp, last[:, wp : wp + 1], p_last)
            p_last2 = jnp.where(hitp, last2[:, wp : wp + 1], p_last2)
            p_h1 = jnp.where(hitp, h1[:, wp : wp + 1], p_h1)
            p_h2 = jnp.where(hitp, h2[:, wp : wp + 1], p_h2)
            p_pb = jnp.where(hitp, stay_pb[:, wp : wp + 1], p_pb)
            p_pnb = jnp.where(hitp, stay_pnb[:, wp : wp + 1], p_pnb)
        e_sel = jnp.sum(
            jnp.where(kv_iota == col, ext, 0.0), axis=1, keepdims=True
        )
        s_pb = jnp.where(is_ext, NEG, p_pb)
        s_pnb = jnp.where(is_ext, e_sel, p_pnb)
        s_h1 = jnp.where(is_ext, p_h1 * _HASH_MULT + (char + 1), p_h1)
        s_h2 = jnp.where(is_ext, p_h2 * _HASH2_MULT + (char + 7), p_h2)
        s_last = jnp.where(is_ext, char, p_last)
        s_last2 = jnp.where(is_ext, p_last, p_last2)
        dead = _logaddexp(s_pb, s_pnb) < (0.5 * NEG)
        s_h1 = jnp.where(dead, _SENT1 + w, s_h1)
        s_h2 = jnp.where(dead, _SENT2 + w, s_h2)
        new_last.append(s_last)
        new_last2.append(s_last2)
        new_h1.append(s_h1)
        new_h2.append(s_h2)
        new_pb.append(s_pb)
        new_pnb.append(s_pnb)
        out_parent.append(parent)
        out_char.append(char)

    cat = lambda xs: jnp.concatenate(xs, axis=1)  # [BT, W]
    n_last, n_last2 = cat(new_last), cat(new_last2)
    n_h1, n_h2 = cat(new_h1), cat(new_h2)
    n_pb, n_pnb = cat(new_pb), cat(new_pnb)
    o_parent, o_char = cat(out_parent), cat(out_char)

    # ---- freeze finished utterances
    active = t < len_ref[...]                    # [BT, W], lane-bcast
    last_s[...] = jnp.where(active, n_last, last)
    last2_s[...] = jnp.where(active, n_last2, last2)
    h1_s[...] = jnp.where(active, n_h1, h1)
    h2_s[...] = jnp.where(active, n_h2, h2)
    pb_s[...] = jnp.where(active, n_pb, p_b)
    pnb_s[...] = jnp.where(active, n_pnb, p_nb)
    parent_ref[0] = jnp.where(active, o_parent, w_iota)
    char_ref[0] = jnp.where(active & (o_char >= 0), o_char, -1)
    pb_ref[...] = pb_s[...]
    pnb_ref[...] = pnb_s[...]


def _batch_tile(B: int, cap: int = 128) -> int:
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


# LM tables above this stay on the XLA beam (the table is VMEM-resident
# for the whole recursion; leave headroom for the beam state + logits
# blocks in v5e's ~16 MB VMEM)
_LM_VMEM_BUDGET = 6 * 1024 * 1024


def lm_table_fits_vmem(lm_logp) -> bool:
    """True if a [V+1, V] / [V+1, V+1, V] LM table is small enough for
    the in-kernel fusion (dispatch guard used by uasr.infer)."""
    n = 1
    for d in lm_logp.shape:
        n *= int(d)
    return n * 4 <= _LM_VMEM_BUDGET


def ctc_beam_search_decode_pallas(
    logits: jax.Array,
    lengths: jax.Array,
    beam_width: int = 8,
    blank_id: int = 0,
    lm_logp: jax.Array | None = None,
    lm_weight: float = 1.0,
    lm_bonus: float = 0.0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for `ctc_beam_search_decode` (incl. shallow
    bigram/trigram LM fusion via `lm_logp`, same table layout as
    uasr.ops.lm): returns (ids [B, T], out_lengths [B], best log-prob
    [B]). Exact (prune >= V semantics)."""
    B, T, V = logits.shape
    W = beam_width
    BT = _batch_tile(B)
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp_t = jnp.moveaxis(logp, 1, 0)              # [T, B, V]
    len_w = jnp.broadcast_to(
        lengths.astype(jnp.int32)[:, None], (B, W)
    )

    lm_order, H = 0, 0
    inputs = [lp_t, len_w]
    lm_spec = []
    if lm_logp is not None:
        lm_order = 2 if lm_logp.ndim == 2 else 3
        flat = jnp.asarray(lm_logp, jnp.float32).reshape(-1, V)
        H = ((flat.shape[0] + 127) // 128) * 128  # sublane-pad history
        flat = jnp.pad(flat, ((0, H - flat.shape[0]), (0, 0)))
        inputs.append(flat)
        lm_spec = [pl.BlockSpec((H, V), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM)]

    parents, chars, pb, pnb = pl.pallas_call(
        functools.partial(
            _beam_kernel, W=W, V=V, blank_id=blank_id,
            lm_order=lm_order, lm_weight=float(lm_weight),
            lm_bonus=float(lm_bonus), H=H,
        ),
        grid=(B // BT, T),
        in_specs=[
            pl.BlockSpec((1, BT, V), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, W), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + lm_spec,
        out_specs=[
            pl.BlockSpec((1, BT, W), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, W), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, W), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, W), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, W), jnp.int32),
            jax.ShapeDtypeStruct((T, B, W), jnp.int32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, W), jnp.int32),
            pltpu.VMEM((BT, W), jnp.int32),
            pltpu.VMEM((BT, W), jnp.int32),
            pltpu.VMEM((BT, W), jnp.int32),
            pltpu.VMEM((BT, W), jnp.float32),
            pltpu.VMEM((BT, W), jnp.float32),
        ],
        # the VMEM-resident LM table (double-buffered by the pipeline)
        # pushes past the default 16 MB scoped-vmem limit at trigram
        # sizes; v5e has 128 MiB physical VMEM (same conditional-raise
        # pattern as pallas_gru.py)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
            if lm_order else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(*inputs)

    total = _logaddexp(pb, pnb)                  # [B, W]
    best = jnp.argmax(total, axis=1)

    def back(idx, inp):
        parent_t, char_t = inp                   # [B, W]
        c = jnp.take_along_axis(char_t, idx[:, None], 1)[:, 0]
        nxt = jnp.take_along_axis(parent_t, idx[:, None], 1)[:, 0]
        return nxt, c

    _, path_chars = jax.lax.scan(back, best, (parents, chars), reverse=True)
    path = path_chars.T                          # [B, T]

    keep = path >= 0
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, T)
    ids = jnp.full((B, T), blank_id, dtype=jnp.int32)
    b_idx = jnp.arange(B)[:, None].repeat(T, 1)
    ids = ids.at[b_idx, pos].set(jnp.maximum(path, 0), mode="drop")
    out_len = keep.sum(axis=1)
    score = jnp.take_along_axis(total, best[:, None], 1)[:, 0]
    return ids, out_len, score
