"""Pallas TPU kernels for the CTC forward-backward recursion.

The autodiff route (uasr.ops.ctc: `lax.scan` alpha recursion, gradient
via logsumexp VJPs) is correct but pays the XLA while-loop launch
overhead twice (forward + transposed backward) over T steps of tiny
[B, S] VPU work. Here both passes are single kernels:

  forward:  grid over time, alpha [B, S] carried in VMEM scratch,
            whole alpha trajectory written out (needed by backward);
  backward: reverse grid computing beta and emitting the posterior
            gamma = exp(alpha + beta - ll) scaled by the upstream
            cotangent — the classic alpha-beta CTC gradient — as
            d(emit) directly.

Everything is kept FINITE (log-zero = -1e5, masks are additive -1e5
terms), so float `where`-free lerp masking is safe and no NaNs can leak
through the VJP.

The label-dependent structure (blank-interleaved extended sequence,
skip-transition mask, final-state indicator) is precomputed in XLA as
[B, S] additive masks; the emit gather (logp at extended labels) and
its scatter VJP also stay in XLA. Cross-checked against optax.ctc_loss
and uasr.ops.ctc in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uasr.ops.ctc import LOG_EPSILON

NEG = LOG_EPSILON  # finite -inf


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, NEG)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def _shift_right(x, k):
    """Shift lanes toward higher s by k, filling with NEG (alpha[s-k])."""
    B, S = x.shape
    rolled = pltpu.roll(x, k, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    return jnp.where(col < k, NEG, rolled)


def _shift_left(x, k):
    """Shift lanes toward lower s by k, filling with NEG (x[s+k])."""
    B, S = x.shape
    rolled = pltpu.roll(x, S - k, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    return jnp.where(col >= S - k, NEG, rolled)


def _fwd_kernel(emit_ref, act_ref, skip_ref, svalid_ref, alpha_traj_ref,
                alpha_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # virtual seed alpha_{-1} = [0 at s=0, NEG elsewhere]: one plain
        # update step then yields exactly alpha_0 = emit_0 on states
        # {0, 1} (the skip path into s=2 is blocked by skip_neg because
        # z[2] is always blank), so no t==0 special-casing is needed
        B, S = alpha_scr.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        alpha_scr[...] = jnp.where(col == 0, 0.0, NEG)

    alpha = alpha_scr[...]
    a1 = _shift_right(alpha, 1)
    a2 = _shift_right(alpha, 2) + skip_ref[...]
    new = _lse3(alpha, a1, a2) + emit_ref[0]
    new = jnp.maximum(new + svalid_ref[...], NEG)
    mf = act_ref[0, 0][:, None]  # [B, 1] 1 = step active
    alpha_new = mf * new + (1.0 - mf) * alpha
    alpha_scr[...] = alpha_new
    alpha_traj_ref[0] = alpha_new


def _bwd_kernel(emit_next_ref, act_ref, act_next_ref, skipw_ref,
                finals_ref, alpha_ref, scale_ref, demit_ref, beta_scr):
    t_rev = pl.program_id(0)
    B, S = beta_scr.shape

    @pl.when(t_rev == 0)
    def _():
        beta_scr[...] = finals_ref[...]

    beta = beta_scr[...]

    @pl.when(t_rev > 0)
    def _():
        # step from beta_{t+1} to beta_t using emit_{t+1}
        be = beta + emit_next_ref[0]
        b0 = be
        b1 = _shift_left(be, 1)
        b2 = _shift_left(be + skipw_ref[...], 2)
        new = _lse3(b0, b1, b2)
        mf = act_next_ref[0, 0][:, None]  # t+1 active?
        beta_scr[...] = mf * jnp.maximum(new, NEG) + (1.0 - mf) * beta

    beta_t = beta_scr[...]
    # gamma = ct_b * exp(alpha + beta - ll), zero on inactive steps
    gam = jnp.exp(
        jnp.maximum(alpha_ref[0] + beta_t, 2.0 * NEG) - scale_ref[0, :][:, None]
    )
    mf_t = act_ref[0, 0][:, None]
    demit_ref[0] = gam * mf_t * scale_ref[1, :][:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ctc_ll(emit, act, skip_neg, svalid_neg, finals_neg, last_blank_pos,
            interpret=False):
    """Log likelihood per utterance from the alpha recursion.

    emit: [T, B, S] log p(z_s) per frame; act: [T, B] {0,1};
    skip_neg/svalid_neg/finals_neg: [B, S] additive masks (0 or NEG).
    Returns ll [B].
    """
    ll, _ = _ctc_fwd(emit, act, skip_neg, svalid_neg, finals_neg,
                     last_blank_pos, interpret)
    return ll


def _ctc_fwd(emit, act, skip_neg, svalid_neg, finals_neg, last_blank_pos,
             interpret):
    T, B, S = emit.shape
    act_r = act.reshape(T, 1, B)
    alpha_traj = pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, S), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(emit, act_r, skip_neg, svalid_neg)
    final = alpha_traj[-1] + finals_neg  # [B, S]
    m = jnp.maximum(jnp.max(final, axis=1), NEG)
    ll = m + jnp.log(jnp.sum(jnp.exp(final - m[:, None]), axis=1))
    return ll, (emit, act, skip_neg, svalid_neg, finals_neg, alpha_traj, ll)


def _ctc_fwd_rule(emit, act, skip_neg, svalid_neg, finals_neg,
                  last_blank_pos, interpret):
    ll, res = _ctc_fwd(emit, act, skip_neg, svalid_neg, finals_neg,
                       last_blank_pos, interpret)
    return ll, res


def _ctc_bwd_rule(interpret, res, g):
    emit, act, skip_neg, svalid_neg, finals_neg, alpha_traj, ll = res
    T, B, S = emit.shape
    act_r = act.reshape(T, 1, B)
    # emit_{t+1} stream: shift the emit blocks by one (clamped at T-1;
    # the kernel skips the transition at the first reverse step)
    scale = jnp.stack([ll, g.astype(jnp.float32)], axis=0)  # [2, B]
    demit = pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, B, S),
                lambda t: (jnp.minimum(T - t, T - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),  # emit at t+1 (t = T-1-t_rev)
            pl.BlockSpec((1, 1, B), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),  # act at t
            pl.BlockSpec(
                (1, 1, B),
                lambda t: (jnp.minimum(T - t, T - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),  # act at t+1
            pl.BlockSpec((B, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, S), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),  # alpha at t
            pl.BlockSpec((2, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, S), lambda t: (T - 1 - t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(emit, act_r, act_r, skip_neg, finals_neg, alpha_traj, scale)
    return demit.astype(emit.dtype), None, None, None, None, None


_ctc_ll.defvjp(_ctc_fwd_rule, _ctc_bwd_rule)


def ctc_loss_pallas(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for uasr.ops.ctc.ctc_loss using the Pallas
    forward-backward kernels. Returns per-utterance NLL [B]."""
    B, T, V = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1
    logp = jax.nn.log_softmax(logits, axis=-1)

    z = jnp.full((B, S), blank_id, dtype=jnp.int32)
    z = z.at[:, 1::2].set(labels.astype(jnp.int32))
    z_shift2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    skip_ok = (z != blank_id) & (z != z_shift2)
    skip_neg = jnp.where(skip_ok, 0.0, NEG).astype(jnp.float32)

    s_idx = jnp.arange(S)[None, :]
    svalid_neg = jnp.where(
        s_idx < (2 * label_lengths + 1)[:, None], 0.0, NEG
    ).astype(jnp.float32)
    last = 2 * label_lengths
    finals = (s_idx == last[:, None]) | (
        (s_idx == last[:, None] - 1) & (label_lengths[:, None] > 0)
    )
    finals_neg = jnp.where(finals, 0.0, NEG).astype(jnp.float32)

    emit = jnp.take_along_axis(logp, z[:, None, :], axis=-1)  # [B, T, S]
    emit = jnp.moveaxis(emit, 1, 0).astype(jnp.float32)  # [T, B, S]
    act = (
        jnp.arange(T)[:, None] < logit_lengths[None, :]
    ).astype(jnp.float32)

    ll = _ctc_ll(emit, act, skip_neg, svalid_neg, finals_neg, last, interpret)
    return -ll
