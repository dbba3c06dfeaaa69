"""Fused multi-head self-attention Pallas kernel for short sequences.

The attention encoders run at post-subsample T≈200 (B=128, H=8,
dh=64 at bench shapes). XLA's unfused lowering materializes the
[B, H, T, T] score/prob tensors in HBM — the round-3 ablation put the
conformer's MHSA at ~3.7× its roofline for exactly that reason, and
the library flash-attention kernel measured 1.8-2× SLOWER at these
shapes (B·H tiny grid programs; its tiling is built for T ≥ 1k;
NOTES_ROUND3 session 8 — don't redo). This kernel is purpose-built
for the short-T regime instead:

- grid over BATCH BLOCKS (NB rows per program, ~B/NB fat programs, not
  B·H tiny ones) so the per-grid-step fixed cost (~9 µs measured on
  the GRU kernels) is amortized;
- per (row, head) the whole QK^T → bias/mask → softmax → PV chain runs
  in VMEM: the [T, T] scores NEVER touch HBM;
- softmax in f32 with saved per-row logsumexp; the backward recomputes
  probabilities flash-style from (q, k, lse) and fuses dQ/dK/dV — and
  the conformer's shared relative-position bias gradient — into one
  kernel, accumulating d_bias across the (sequential) TPU grid;
- the head dimension is a LANE SLICE of the packed [T, H·dh] layout
  flax's DenseGeneral already produces, so no [B,T,H,dh] → [B,H,T,dh]
  relayout is paid on either side.

`fused_dot_product_attention` is signature-compatible with
`flax.linen.dot_product_attention` (flax filters kwargs), so it drops
into `nn.MultiHeadDotProductAttention(attention_fn=...)` — QKV/out
projections and their model-axis TP shardings are untouched. It falls
back to the flax implementation for attention dropout, non-key-only
masks, or on CPU (UASR_PALLAS_ATTN=interpret forces the kernel in
interpreter mode for tests; =off forces the fallback everywhere).

Reference parity: the reference repo delegates attention-free models
to cuDNN (SURVEY.md §2.2 has conv/GRU only); this kernel serves the
beyond-reference transformer/conformer families (SURVEY.md §5 "if the
wav2vec-U stretch adds transformers").
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # python float: jnp scalars become captured consts in kernels

# batch rows per grid program. The forward keeps 4 (3 input + 1 output)
# [NB, Tp, D] blocks + the [H, Tp, Tp] bias resident; the backward has
# 5 inputs + 3 outputs + d_bias, so it defaults to half the rows.
FWD_NB = int(os.environ.get("UASR_ATTN_FWD_NB", "4"))
BWD_NB = int(os.environ.get("UASR_ATTN_BWD_NB", "2"))


def _nb_for(B: int, cap: int) -> int:
    nb = max(1, min(cap, B))
    while B % nb:
        nb -= 1
    return nb


def _pad_to(a, axis: int, size: int):
    pad = size - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _fwd_kernel(H, has_bias, *refs):
    if has_bias:
        q_ref, k_ref, v_ref, m_ref, b_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref = refs
    NB, Tp, D = q_ref.shape
    dh = D // H
    scale = 1.0 / math.sqrt(dh)
    for nb in range(NB):
        # additive key mask, hoisted out of the head loop (one select
        # per row instead of H compare/selects on [Tp, Tp])
        madd = jnp.where(m_ref[nb] > 0, 0.0, _NEG)  # [1, Tp]
        for h in range(H):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[nb, :, sl]
            s = jax.lax.dot_general(
                q, k_ref[nb, :, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_bias:
                s = s + b_ref[h]
            s = s + madd
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)  # in (0, 1]: exact in bf16's range
            l = jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(q_ref.dtype), v_ref[nb, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # normalize AFTER the PV matmul: one [Tp, dh] multiply
            # instead of a [Tp, Tp] divide
            o_ref[nb, :, sl] = (o / l).astype(o_ref.dtype)
            lse_ref[nb, h, :] = m[:, 0] + jnp.log(l[:, 0])


def _bwd_kernel(H, has_bias, *refs):
    if has_bias:
        (q_ref, k_ref, v_ref, o_ref, do_ref, m_ref, lse_ref, b_ref,
         dq_ref, dk_ref, dv_ref, db_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, m_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    NB, Tp, D = q_ref.shape
    dh = D // H
    scale = 1.0 / math.sqrt(dh)
    if has_bias:
        # d_bias accumulates across the whole (sequential) grid: its
        # block index map is constant, so the buffer stays resident
        @pl.when(pl.program_id(0) == 0)
        def _():
            db_ref[...] = jnp.zeros_like(db_ref)
    for nb in range(NB):
        madd = jnp.where(m_ref[nb] > 0, 0.0, _NEG)  # [1, Tp]
        for h in range(H):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[nb, :, sl]
            k = k_ref[nb, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_bias:
                s = s + b_ref[h]
            s = s + madd
            p = jnp.exp(s - lse_ref[nb, h, :][:, None])  # [Tp, Tp] f32
            do = do_ref[nb, :, sl]
            pb = p.astype(q_ref.dtype)
            dv = jax.lax.dot_general(  # P^T dO
                pb, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_ref[nb, :, sl] = dv.astype(dv_ref.dtype)
            dp = jax.lax.dot_general(  # dO V^T
                do, v_ref[nb, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                do.astype(jnp.float32) * o_ref[nb, :, sl].astype(jnp.float32),
                axis=1, keepdims=True,
            )
            t = p * (dp - delta)  # dS before the q-scale; == d_bias
            if has_bias:
                db_ref[h] += t
            tb = (t * scale).astype(q_ref.dtype)
            dq_ref[nb, :, sl] = jax.lax.dot_general(
                tb, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[nb, :, sl] = jax.lax.dot_general(  # dS^T Q
                tb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)


def _fwd(q, k, v, bias, kmask, H, has_bias, interpret):
    B, Tp, D = q.shape
    NB = _nb_for(B, FWD_NB)
    row = lambda i: (i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((NB, Tp, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, Tp, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, Tp, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, 1, Tp), row, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, kmask]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((H, Tp, Tp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, H, has_bias),
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((NB, Tp, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, H, Tp), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Tp * (D // H),
            bytes_accessed=4 * B * Tp * D * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attn_core(q, k, v, bias, kmask, H, has_bias, interpret):
    """Padded fused attention. q/k/v: [B, Tp, H*dh] (Tp lane-aligned),
    bias: [H, Tp, Tp] f32 (dummy [0] when has_bias=False), kmask:
    [B, 1, Tp] int32 key-validity. Returns [B, Tp, H*dh] in q.dtype."""
    return _fwd(q, k, v, bias, kmask, H, has_bias, interpret)[0]


def _attn_fwd_rule(q, k, v, bias, kmask, H, has_bias, interpret):
    out, lse = _fwd(q, k, v, bias, kmask, H, has_bias, interpret)
    return out, (q, k, v, bias, kmask, out, lse)


def _attn_bwd_rule(H, has_bias, interpret, res, dout):
    q, k, v, bias, kmask, out, lse = res
    B, Tp, D = q.shape
    NB = _nb_for(B, BWD_NB)
    row = lambda i: (i, 0, 0)  # noqa: E731
    blk = lambda: pl.BlockSpec((NB, Tp, D), row,  # noqa: E731
                               memory_space=pltpu.VMEM)
    in_specs = [
        blk(), blk(), blk(), blk(), blk(),
        pl.BlockSpec((NB, 1, Tp), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((NB, H, Tp), row, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, out, dout.astype(q.dtype), kmask, lse]
    out_specs = [blk(), blk(), blk()]
    out_shape = [jax.ShapeDtypeStruct((B, Tp, D), q.dtype)] * 3
    if has_bias:
        in_specs.append(
            pl.BlockSpec((H, Tp, Tp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
        out_specs.append(
            pl.BlockSpec((H, Tp, Tp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((H, Tp, Tp), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, H, has_bias),
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Tp * Tp * (D // H),
            bytes_accessed=8 * B * Tp * D * q.dtype.itemsize,
            transcendentals=B * H * Tp * Tp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    dq, dk, dv = outs[:3]
    dbias = outs[3] if has_bias else jnp.zeros_like(bias)
    return dq, dk, dv, dbias, None


_attn_core.defvjp(_attn_fwd_rule, _attn_bwd_rule)


def _flax_fallback(query, key, value, bias, mask, dropout_rng,
                   dropout_rate, deterministic, dtype, precision):
    import flax.linen as nn

    return nn.dot_product_attention(
        query, key, value, bias=bias, mask=mask,
        dropout_rng=dropout_rng, dropout_rate=dropout_rate,
        deterministic=deterministic, dtype=dtype, precision=precision,
    )


def fused_dot_product_attention(
    query, key, value, bias=None, mask=None, dropout_rng=None,
    dropout_rate=0.0, deterministic=True, dtype=None, precision=None,
    interpret=None,
):
    """Drop-in for flax.linen.dot_product_attention backed by the fused
    Pallas kernel (see module docstring). query/key/value: [B, T, H, dh]
    (self-attention: all the same T). Falls back to flax for attention
    dropout, exotic masks/biases, or on CPU unless
    UASR_PALLAS_ATTN=interpret."""
    if interpret is None:
        mode = os.environ.get("UASR_PALLAS_ATTN", "auto")
        if mode == "off" or (
            mode != "interpret" and jax.default_backend() in ("cpu",)
        ):
            return _flax_fallback(query, key, value, bias, mask,
                                  dropout_rng, dropout_rate,
                                  deterministic, dtype, precision)
        interpret = mode == "interpret"
    if (dropout_rate > 0.0 and not deterministic) or query.ndim != 4:
        return _flax_fallback(query, key, value, bias, mask, dropout_rng,
                              dropout_rate, deterministic, dtype, precision)
    B, T, H, dh = query.shape
    if key.shape != query.shape or value.shape != query.shape:
        return _flax_fallback(query, key, value, bias, mask, dropout_rng,
                              dropout_rate, deterministic, dtype, precision)

    # key-only padding masks ([B, 1, 1, T] broadcast) are the only kind
    # the encoders build; anything else goes to flax
    if mask is not None:
        if not (mask.ndim == 4 and mask.shape[1] == 1
                and mask.shape[2] == 1 and mask.shape[0] in (1, B)
                and mask.shape[3] == T):
            return _flax_fallback(query, key, value, bias, mask,
                                  dropout_rng, dropout_rate,
                                  deterministic, dtype, precision)
        kmask = jnp.broadcast_to(mask[:, 0, 0, :], (B, T)).astype(jnp.int32)
    else:
        kmask = jnp.ones((B, T), jnp.int32)

    has_bias = bias is not None
    if has_bias:
        # batch-shared bias only (the conformer's rel-pos bias is
        # [1, H, T, T]); per-example biases go to flax
        if bias.ndim == 4 and bias.shape[0] == 1:
            bias3 = bias[0]
        elif bias.ndim == 3:
            bias3 = bias
        else:
            return _flax_fallback(query, key, value, bias, mask,
                                  dropout_rng, dropout_rate,
                                  deterministic, dtype, precision)
        if bias3.shape != (H, T, T):
            return _flax_fallback(query, key, value, bias, mask,
                                  dropout_rng, dropout_rate,
                                  deterministic, dtype, precision)

    # pad T to a sublane multiple only (usually a no-op: the encoders'
    # post-subsample T is a multiple of 8 at production shapes). Full-
    # array trailing dims satisfy the TPU tile rule without lane
    # padding, and skipping the pad-to-128 saves ~0.45 ms/layer of
    # HBM round-trips through pad/slice at bench shapes
    Tp = -(-T // 8) * 8
    D = H * dh
    q3 = _pad_to(query.reshape(B, T, D), 1, Tp)
    k3 = _pad_to(key.reshape(B, T, D), 1, Tp)
    v3 = _pad_to(value.reshape(B, T, D), 1, Tp)
    kmask_p = _pad_to(kmask, 1, Tp)[:, None, :]  # [B, 1, Tp] (TPU tile rule)
    if has_bias:
        # the pad/astype are ordinary differentiable ops: their VJPs
        # (slice back to [H, T, T], cast to the caller's dtype) compose
        # with the kernel's f32 [H, Tp, Tp] d_bias automatically
        bias_p = _pad_to(_pad_to(bias3.astype(jnp.float32), 1, Tp), 2, Tp)
        out = _attn_core(q3, k3, v3, bias_p, kmask_p, H, True, interpret)
    else:
        out = _attn_core(q3, k3, v3, jnp.zeros((0,), jnp.float32),
                         kmask_p, H, False, interpret)
    return out[:, :T].reshape(B, T, H, dh)
