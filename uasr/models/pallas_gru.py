"""Pallas TPU kernel for the (bidirectional-grouped) GRU recurrence,
with a hand-written backward kernel (custom VJP).

Why: the `lax.scan` GRU lowers to an XLA while-loop that launches
several kernels per timestep; at T~200 steps the launch overhead is
~3x the arithmetic (measured: encoder fwd 10.4 ms vs ~3 ms roofline at
B=128, H=512 on v5e). Here the whole recurrence is ONE kernel: the
grid iterates over time (TPU grid steps run sequentially on a core),
the hidden state and the recurrent weights live in VMEM scratch across
steps, and the per-step x-projections stream in double-buffered via the
BlockSpec pipeline.

Scope: the recurrent half only. The input projections x @ wx (+bx) for
all timesteps stay outside as one large XLA GEMM; their gradient flows
through d(xproj) which this kernel returns.

Layout: inputs grouped [G, ...] (G=2 for the fused BiGRU: forward +
time-reversed stream), matching uasr.models.layers.BiGRU. Kernels loop
over g with 2D [B, .] tensors to keep VMEM temporaries within the 16 MB
scoped budget at production sizes (B=128, H=512).

Backward: reverse-time grid; gates are recomputed from (h_prev, xp)
(rematerialization — only the h trajectory is saved). The kernel emits
d(xproj) and d(hproj); the weight gradients dwh/dbh are reduced OUTSIDE
the kernel as one big XLA GEMM over the whole trajectory
(dwh = sum_t h_{t-1}^T dhproj_t), which is both faster than per-step
accumulation and saves the 6 MB f32 VMEM accumulator that blew the
scoped-vmem limit.

Verified against the lax.scan reference for values and gradients in
interpreter mode (tests/test_pallas_gru.py) and on real TPU (forward
bit-exact; grads within f32 accumulation-order noise, rel <= 5e-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates_2d(xp, hproj, h_prev):
    """Gate math on one group. xp/hproj: [B, 3H]; h_prev: [B, H]."""
    H = h_prev.shape[-1]
    xr, xz, xn = xp[:, :H], xp[:, H:2 * H], xp[:, 2 * H:]
    hr, hz, hn = hproj[:, :H], hproj[:, H:2 * H], hproj[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_cand = (1.0 - z) * n + z * h_prev
    return r, z, n, hn, h_cand


def _batch_tile(B: int, cap: int = 128) -> int:
    """Largest divisor of B that is <= cap (the per-grid-step batch tile:
    keeps all VMEM temporaries bounded regardless of batch size, lifting
    round-1's B*H ceiling — NOTES_ROUND1.md item 6)."""
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


def _fwd_kernel(KT, xp_ref, mask_ref, wh_ref, bh_ref, ys_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    G = h_scr.shape[0]
    for k in range(KT):  # KT timesteps per grid step (padded steps have
        for g in range(G):  # mask 0 -> carry flows through untouched)
            mf = mask_ref[k, g][:, None]  # [B, 1] in {0, 1}
            h_prev = h_scr[g]
            # cast to the weight dtype (bf16 in production) so the MXU
            # runs native passes instead of promoted-f32 emulation —
            # same precision as the XLA scan reference, ~6x faster dots
            hproj = (
                jnp.dot(h_prev.astype(wh_ref.dtype), wh_ref[g],
                        preferred_element_type=jnp.float32)
                + bh_ref[g, :][None, :]
            )
            _, _, _, _, h_cand = _gates_2d(xp_ref[k, g], hproj, h_prev)
            h_new = mf * h_cand + (1.0 - mf) * h_prev
            h_store = h_new.astype(ys_ref.dtype)
            # round the carry to the output dtype so the backward pass
            # (which recomputes gates from the stored ys) sees the exact
            # fwd values
            ys_ref[k, g] = h_store
            h_scr[g] = h_store.astype(jnp.float32)


def _bwd_kernel(
    KT,  # timesteps per grid step (bound via functools.partial)
    xp_ref,  # [KT, G, B, 3H] at the tile's timesteps
    mask_ref,  # [KT, G, B]
    hprev_ref,  # [KT, G, B, H] = ys shifted one step (zeros at t = 0)
    wh_ref,  # [G, H, 3H]
    bh_ref,  # [G, 3H]
    dy_ref,  # [KT, G, B, H] upstream grad of ys
    dxp_ref,  # out [KT, G, B, 3H]
    dhproj_ref,  # out [KT, G, B, 3H] (dwh/dbh reduced outside)
    dh_scr,  # [G, B, H] carried dL/dh_prev
):
    t_rev = pl.program_id(1)  # 0 = last time tile

    @pl.when(t_rev == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    G, B, H = dh_scr.shape
    for k in reversed(range(KT)):
        for g in range(G):
            mf = mask_ref[k, g][:, None]  # [B, 1]
            h_prev_raw = hprev_ref[k, g]
            h_prev = h_prev_raw.astype(jnp.float32)
            xp = xp_ref[k, g]
            hproj = (
                jnp.dot(h_prev_raw, wh_ref[g],
                        preferred_element_type=jnp.float32)
                + bh_ref[g, :][None, :]
            )
            r, z, n, hn, _ = _gates_2d(xp, hproj, h_prev)

            dh_total = dh_scr[g] + dy_ref[k, g]
            dh_cand = dh_total * mf
            dh_prev = dh_total * (1.0 - mf)

            dz = dh_cand * (h_prev - n)
            dn = dh_cand * (1.0 - z)
            dh_prev = dh_prev + dh_cand * z
            dn_pre = dn * (1.0 - n * n)
            dhn = dn_pre * r
            dr_pre = (dn_pre * hn) * r * (1.0 - r)
            dz_pre = dz * z * (1.0 - z)

            dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
            dhproj = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
            dh_prev = dh_prev + jnp.dot(
                dhproj.astype(wh_ref.dtype), wh_ref[g].T,
                preferred_element_type=jnp.float32,
            )
            dxp_ref[k, g] = dxp.astype(dxp_ref.dtype)
            dhproj_ref[k, g] = dhproj.astype(dhproj_ref.dtype)
            dh_scr[g] = dh_prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_gru_scan(xproj, wh, bh, tmask, interpret=False):
    """Grouped GRU recurrence. xproj: [T, G, B, 3H] (input projections,
    input bias already added); wh: [G, H, 3H]; bh: [G, 3H]; tmask:
    [T, G, B] (1 = step active; per-group so the time-reversed BiGRU
    stream can carry its own validity window). Returns ys: [T, G, B, H]."""
    ys, _ = _fwd(xproj, wh, bh, tmask, interpret)
    return ys


def _fwd(xproj, wh, bh, tmask, interpret):
    T, G, B, H3 = xproj.shape
    H = H3 // 3
    BT = _batch_tile(B)
    KT = min(FWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    mask = _pad_time(tmask.astype(jnp.float32), Tp)  # [Tp, G, B]
    xp = _pad_time(xproj, Tp)
    # grid (batch tiles, time): time is the fast axis, so each tile runs
    # its full recurrence with the carry in scratch before the next tile
    # starts (scratch re-zeroed at t == 0)
    ys = pl.pallas_call(
        functools.partial(_fwd_kernel, KT),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, G, BT, H3), lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, G, BT, H), lambda b, t: (t, 0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, G, B, H), xproj.dtype),
        scratch_shapes=[pltpu.VMEM((G, BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * G * B * H * H3,
            bytes_accessed=(xproj.size + T * G * B * H) * xproj.dtype.itemsize,
            transcendentals=3 * T * G * B * H,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(xp, mask, wh, bh)
    ys = ys[:T]
    return ys, (xproj, wh, bh, tmask, ys)


def _fwd_rule(xproj, wh, bh, tmask, interpret):
    ys, res = _fwd(xproj, wh, bh, tmask, interpret)
    return ys, res


def _pad_time(a, Tp):
    """Zero-pad axis 0 (time) to length Tp."""
    T = a.shape[0]
    if T == Tp:
        return a
    return jnp.pad(a, [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1))


# timesteps per grid step (fwd / bwd kernels). Padded steps carry mask 0
# (and dy 0), so they contribute nothing and the carry flows through
# untouched. Swept on v5e at B=128, T=200, H=512 (round 2, bwd only):
# isolated chained fwd+bwd ms/iter KT=1 3.75, KT=2 3.53, KT=4 3.69,
# KT=8 3.61 — but END-TO-END the full train step was flat-to-slightly-
# worse at bwd KT=2 (57.7k vs 58.0k audio-s/s). Both kernels now tile
# (UASR_GRU_FWD_KT / UASR_GRU_BWD_KT env overrides for sweeps); see
# BASELINE.md for the round-3 end-to-end sweep results.
import os as _os

FWD_TIME_TILE = int(_os.environ.get("UASR_GRU_FWD_KT", "1"))
BWD_TIME_TILE = int(_os.environ.get("UASR_GRU_BWD_KT", "1"))


def _bwd_rule(interpret, res, dy):
    xproj, wh, bh, tmask, ys = res
    T, G, B, H3 = xproj.shape
    H = H3 // 3
    BT = _batch_tile(B)
    KT = min(BWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    # h_prev trajectory shifted one step (h_prev[t] = ys[t-1], zeros at
    # t = 0) so every kernel block is tile-aligned
    hprev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    xp = _pad_time(xproj, Tp)
    mask = _pad_time(tmask.astype(jnp.float32), Tp)  # [Tp, G, B]
    hprev_p = _pad_time(hprev, Tp)
    dyp = _pad_time(dy, Tp)
    dxp, dhproj = pl.pallas_call(
        functools.partial(_bwd_kernel, KT),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, G, BT, H3), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT), lambda b, t: (ntt - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, G, BT, H3), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H3), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, G, B, H3), xproj.dtype),
            jax.ShapeDtypeStruct((Tp, G, B, H3), xproj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((G, BT, H), jnp.float32)],
        # KT > 1 blocks exceed the 16 MB default scoped-VMEM budget;
        # only raise it then (requesting 100 MB unconditionally would
        # fail on pre-v5e parts whose physical VMEM is smaller)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(xp, mask, hprev_p, wh, bh, dyp)
    dhproj = dhproj[:T]
    # weight grads as one large trajectory GEMM (outside the kernel;
    # an in-kernel VMEM accumulator was measured slower — NOTES_ROUND2)
    dwh = jnp.einsum(
        "tgbh,tgbo->gho", hprev, dhproj,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    dbh = dhproj.sum(axis=(0, 2)).astype(bh.dtype)
    return dxp[:T].astype(xproj.dtype), dwh, dbh, None


pallas_gru_scan.defvjp(_fwd_rule, _bwd_rule)
