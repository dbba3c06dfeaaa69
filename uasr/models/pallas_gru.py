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

Backward (default, UASR_GRU_BWD_IMPL=fused): reverse-time grid; gates
are recomputed from (h_prev, xp) (rematerialization — only the h
trajectory is saved). The alternative (=linear) exploits that the GRU
backward step is LINEAR in the carried gradient: the forward kernel
emits per-step linearization coefficients and the backward kernel runs
just multiplies + ONE dot per step — measured SLOWER end-to-end (see
BWD_IMPL note below), kept as the documented negative result. In both,
the weight gradients dwh/dbh are reduced OUTSIDE the kernel as big XLA
GEMMs over the whole trajectory (dwh = sum_t h_{t-1}^T dhproj_t),
which is both faster than per-step accumulation and saves the 6 MB f32
VMEM accumulator that blew the scoped-vmem limit.

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


def _batch_tile(B: int, cap: int | None = None) -> int:
    """Largest divisor of B that is <= cap (the per-grid-step batch tile:
    keeps all VMEM temporaries bounded regardless of batch size, lifting
    round-1's B*H ceiling — NOTES_ROUND1.md item 6). The recurrence is
    latency-bound, so batch tiles are pure serial repeats: a bigger cap
    amortizes the per-step floor over more rows (UASR_GRU_BT to sweep)."""
    if cap is None:
        cap = _BT_CAP
    bt = min(B, cap)
    while B % bt:
        bt -= 1
    return bt


def _fwd_kernel(KT, save_coeffs, xp_ref, mask_ref, wh_ref, bh_ref, *refs):
    if save_coeffs:
        ys_ref, c4_ref, ch_ref, h_scr = refs
    else:
        (ys_ref, h_scr), c4_ref, ch_ref = refs, None, None
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    G = h_scr.shape[0]
    for k in range(KT):  # KT timesteps per grid step (padded steps have
        # phase 1: issue ALL groups' recurrent dots first, so group 1's
        # MXU pass overlaps group 0's VPU gate math (phase 2) instead of
        # serializing dot -> gates -> dot -> gates
        hprojs = []
        for g in range(G):  # mask 0 -> carry flows through untouched
            h_prev = h_scr[g]
            # cast to the weight dtype (bf16 in production) so the MXU
            # runs native passes instead of promoted-f32 emulation —
            # same precision as the XLA scan reference, ~6x faster dots
            hproj = (
                jnp.dot(h_prev.astype(wh_ref.dtype), wh_ref[g],
                        preferred_element_type=jnp.float32)
                + bh_ref[g, :][None, :]
            )
            hprojs.append((h_prev, hproj))
        for g in range(G):  # phase 2: VPU gate math + carry update
            mf = mask_ref[k, g][:, None]  # [B, 1] in {0, 1}
            h_prev, hproj = hprojs[g]
            r, z, n, hn, h_cand = _gates_2d(xp_ref[k, g], hproj, h_prev)
            h_new = mf * h_cand + (1.0 - mf) * h_prev
            h_store = h_new.astype(ys_ref.dtype)
            # round the carry to the output dtype so the backward pass
            # sees the exact fwd values
            ys_ref[k, g] = h_store
            h_scr[g] = h_store.astype(jnp.float32)
            if save_coeffs:
                # backward-pass linearization coefficients (see
                # _bwd_lin_kernel): computed HERE where the gates are
                # already in VMEM — a handful of VPU multiplies whose
                # output DMA hides under this compute-bound step
                # (rematerializing gates in a separate XLA pass was
                # measured 1.5x SLOWER end-to-end: full-trajectory HBM
                # round-trips for hproj/gates/coeff tensors)
                c_n2 = mf * ((1.0 - z) * (1.0 - n * n))
                c4 = jnp.concatenate(
                    [c_n2 * (hn * (r * (1.0 - r))),       # c_r
                     mf * ((h_prev - n) * (z * (1.0 - z))),  # c_z
                     c_n2,
                     c_n2 * r],                            # c_nh
                    axis=-1,
                )
                c4_ref[k, g] = c4.astype(c4_ref.dtype)
                ch_ref[k, g] = (1.0 - mf) + mf * z


def _bwd_lin_kernel(
    KT,  # timesteps per grid step (bound via functools.partial)
    c4_ref,  # [KT, G, B, 4H] coeffs (c_r, c_z, c_n2, c_nh) — see _bwd_rule
    ch_ref,  # [KT, G, B, H] f32 carry coeff (1 - mf) + mf * z
    dy_ref,  # [KT, G, B, H] upstream grad of ys
    wh_ref,  # [G, H, 3H]
    out_ref,  # out [KT, G, B, 4H] = (dr_pre, dz_pre, dn_pre, dhn)
    dh_scr,  # [G, B, H] carried dL/dh_prev
):
    """Slim backward: the GRU backward step is LINEAR in the carried
    gradient d = dh_scr + dy, so every gate recomputation (two
    transcendental passes + the hproj dot) is hoisted OUT of the kernel
    into one parallel XLA pass that emits per-step coefficients. The
    sequential critical path here is 5 elementwise multiplies and ONE
    [B, 3H] x [3H, H] dot per step (the old fused kernel ran two dots +
    full gate math per step — ~2x the serialized work)."""
    t_rev = pl.program_id(1)  # 0 = last time tile

    @pl.when(t_rev == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    G, B, H = dh_scr.shape
    for k in reversed(range(KT)):
        for g in range(G):
            c4 = c4_ref[k, g].astype(jnp.float32)  # [B, 4H]
            d = dh_scr[g] + dy_ref[k, g].astype(jnp.float32)
            d4 = c4 * jnp.concatenate([d, d, d, d], axis=-1)
            out_ref[k, g] = d4.astype(out_ref.dtype)
            # dhproj = (dr_pre, dz_pre, dhn) — columns 0:2H and 3H:4H
            dhproj = jnp.concatenate(
                [d4[:, : 2 * H], d4[:, 3 * H :]], axis=-1
            )
            dh_scr[g] = ch_ref[k, g] * d + jnp.dot(
                dhproj.astype(wh_ref.dtype), wh_ref[g].T,
                preferred_element_type=jnp.float32,
            )


def _bwd_kernel(
    KT,  # timesteps per grid step (bound via functools.partial)
    xp_ref,  # [KT, G, B, 3H] at the tile's timesteps
    mask_ref,  # [KT, G, B]
    hprev_ref,  # [KT, G, B, H] = ys shifted one step (zeros at t = 0)
    wh_ref,  # [G, H, 3H]
    bh_ref,  # [G, 3H]
    dy_ref,  # [KT, G, B, H] upstream grad of ys
    dxp_ref,  # out [KT, G, B, 3H]
    dhn_ref,  # out [KT, G, B, H] (dhproj's n-block; rz blocks = dxp's)
    dh_scr,  # [G, B, H] carried dL/dh_prev
):
    t_rev = pl.program_id(1)  # 0 = last time tile

    @pl.when(t_rev == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    G, B, H = dh_scr.shape
    # Phase 1 — everything independent of the carried gradient runs
    # BEFORE the sequential loop: the gate-recompute projection as one
    # taller [KT*B, H] x [H, 3H] GEMM per group, then the gates (the
    # only transcendentals) reduced to per-step linear coefficients
    # (the GRU backward step is linear in the carried gradient — see
    # _bwd_lin_kernel's derivation; unlike that env-gated variant the
    # coefficients here come from tile-local VMEM, no extra HBM DMA).
    c4s = {}  # (k, g) -> [B, 4H] = (c_r, c_z, c_n2, c_nh)
    chs = {}  # (k, g) -> [B, H] carry coefficient
    for g in range(G):
        hp_all = jnp.dot(
            hprev_ref[:, g].reshape(KT * B, H), wh_ref[g],
            preferred_element_type=jnp.float32,
        ) + bh_ref[g, :][None, :]
        for k in range(KT):
            mf = mask_ref[k, g][:, None]  # [B, 1]
            h_prev = hprev_ref[k, g].astype(jnp.float32)
            r, z, n, hn, _ = _gates_2d(
                xp_ref[k, g], hp_all[k * B:(k + 1) * B], h_prev
            )
            c_n2 = mf * ((1.0 - z) * (1.0 - n * n))
            c4s[k, g] = jnp.concatenate(
                [c_n2 * (hn * (r * (1.0 - r))),          # c_r
                 mf * ((h_prev - n) * (z * (1.0 - z))),  # c_z
                 c_n2,
                 c_n2 * r],                              # c_nh
                axis=-1,
            )
            chs[k, g] = (1.0 - mf) + mf * z
    # Phase 2 — the sequential chain: 5 multiplies + ONE dot per step
    for k in reversed(range(KT)):
        for g in range(G):
            d = dh_scr[g] + dy_ref[k, g]
            e = c4s[k, g] * jnp.concatenate([d, d, d, d], axis=-1)
            dxp_ref[k, g] = e[:, :3 * H].astype(dxp_ref.dtype)
            dhn_ref[k, g] = e[:, 3 * H:].astype(dhn_ref.dtype)
            dhproj = jnp.concatenate([e[:, :2 * H], e[:, 3 * H:]], axis=-1)
            dh_scr[g] = chs[k, g] * d + jnp.dot(
                dhproj.astype(wh_ref.dtype), wh_ref[g].T,
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_gru_scan(xproj, wh, bh, tmask, interpret=False):
    """Grouped GRU recurrence. xproj: [T, G, B, 3H] (input projections,
    input bias already added); wh: [G, H, 3H]; bh: [G, 3H]; tmask:
    [T, G, B] (1 = step active; per-group so the time-reversed BiGRU
    stream can carry its own validity window). Returns ys: [T, G, B, H]."""
    return _fwd(xproj, wh, bh, tmask, interpret, save_coeffs=False)[0]


def _fwd(xproj, wh, bh, tmask, interpret, save_coeffs):
    T, G, B, H3 = xproj.shape
    H = H3 // 3
    BT = _batch_tile(B)
    KT = min(FWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    mask = _pad_time(tmask.astype(jnp.float32), Tp)  # [Tp, G, B]
    xp = _pad_time(xproj, Tp)
    tmap = lambda b, t: (t, 0, b, 0)  # noqa: E731
    out_specs = [pl.BlockSpec((KT, G, BT, H), tmap, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((Tp, G, B, H), xproj.dtype)]
    if save_coeffs:
        out_specs += [
            pl.BlockSpec((KT, G, BT, 4 * H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H), tmap, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Tp, G, B, 4 * H), xproj.dtype),
            # carry-path coefficient stays f32: it multiplies the carried
            # gradient every step, so its rounding error compounds over T
            jax.ShapeDtypeStruct((Tp, G, B, H), jnp.float32),
        ]
    # grid (batch tiles, time): time is the fast axis, so each tile runs
    # its full recurrence with the carry in scratch before the next tile
    # starts (scratch re-zeroed at t == 0)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, KT, save_coeffs),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, G, BT, H3), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((G, BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * G * B * H * H3,
            bytes_accessed=(xproj.size + T * G * B * H) * xproj.dtype.itemsize,
            transcendentals=3 * T * G * B * H,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 or BT > 128 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(xp, mask, wh, bh)
    ys = outs[0][:T]
    if save_coeffs:
        return ys, outs[1][:T], outs[2][:T]
    return (ys,)


def _fwd_rule(xproj, wh, bh, tmask, interpret):
    if BWD_IMPL == "linear":
        ys, c4, ch = _fwd(xproj, wh, bh, tmask, interpret, save_coeffs=True)
        return ys, (wh, bh, ys, c4, ch)
    ys = _fwd(xproj, wh, bh, tmask, interpret, save_coeffs=False)[0]
    return ys, (xproj, wh, bh, tmask, ys)


def _pad_time(a, Tp):
    """Zero-pad axis 0 (time) to length Tp."""
    T = a.shape[0]
    if T == Tp:
        return a
    return jnp.pad(a, [(0, Tp - T)] + [(0, 0)] * (a.ndim - 1))


# timesteps per grid step (fwd / bwd kernels). Padded steps carry mask 0
# (and dy 0), so they contribute nothing and the carry flows through
# untouched. Forward: the recurrent dot depends on the carry, so tiling
# buys nothing (round-3 sweep flat) — KT=1. Backward: the whole gate
# recompute (projection GEMM + transcendentals, reduced to linear
# coefficients) is hoisted out of the sequential loop as phase 1 of the
# kernel; KT sets how many steps share one phase-1 pass. Kernel-level
# probe on v5e (B=128, T=200, H=512, two-stream bwd+dwh): KT=1 1.19 ms,
# KT=2 1.37 ms, KT=4 1.62 ms, KT=8 1.52 ms (±0.1 noise); end-to-end
# flagship: KT=1 71.2k, KT=2 72.1k, KT=4 72.1k audio-s/s (the phase-1
# hoist + H-wide dhn output are ~+1% over the pre-hoist kernel at its
# best tile). Env overrides UASR_GRU_FWD_KT / UASR_GRU_BWD_KT for
# sweeps; see BASELINE.md.
import os as _os

FWD_TIME_TILE = int(_os.environ.get("UASR_GRU_FWD_KT", "1"))
BWD_TIME_TILE = int(_os.environ.get("UASR_GRU_BWD_KT", "2"))
_BT_CAP = int(_os.environ.get("UASR_GRU_BT", "128"))


# backward implementation: "fused" (default) recomputes gates in-kernel;
# "linear" saves per-step linearization coefficients from the forward
# kernel and runs a slim backward (one dot + multiplies per step). The
# linear variant was the round-3 structural candidate and measured
# SLOWER end-to-end (51.3k/50.3k at KT=1/2 vs fused 53.4k same-day,
# B=128 x 8s): the kernels are latency-bound, so halving critical-path
# FLOPs doesn't pay for the +4.5 MB/step of coefficient DMA. Kept
# env-gated and tested as the documented negative result.
BWD_IMPL = _os.environ.get("UASR_GRU_BWD_IMPL", "fused")


def _bwd_rule(interpret, res, dy):
    if BWD_IMPL == "linear":
        return _bwd_linear(res, dy, interpret)
    return _bwd_fused(res, dy, interpret)


def _bwd_linear(res, dy, interpret):
    """Backward via per-step linear coefficients.

    d_t := dL/dh_t (carried) obeys, for the reset-after GRU,
        dxp_t    = (c_r, c_z, c_n2)_t ⊙ d_t        (per gate block)
        dhproj_t = (c_r, c_z, c_nh)_t ⊙ d_t
        d_{t-1}  = c_h_t ⊙ d_t + dhproj_t @ wh^T
    with coefficients depending only on forward quantities:
        c_n2 = mf (1-z)(1-n²)       c_r = c_n2 · hn · r(1-r)
        c_z  = mf (h_prev - n) z(1-z)   c_nh = c_n2 · r
        c_h  = (1-mf) + mf z
    The coefficients were computed by the FORWARD kernel (save_coeffs),
    where the gates were already in VMEM, so this pass launches the slim
    kernel directly — no gate rematerialization, no transcendentals, one
    dot per sequential step."""
    wh, bh, ys, c4, ch = res
    T, G, B, H = ys.shape
    H3 = 3 * H
    BT = _batch_tile(B)
    KT = min(BWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    c4 = _pad_time(c4, Tp)
    # padded tail steps: c4 = 0 and c_h = 1 make the carry flow through
    ch = jnp.concatenate(
        [ch, jnp.ones((Tp - T, G, B, H), jnp.float32)], axis=0
    ) if Tp != T else ch
    dyp = _pad_time(dy, Tp)
    rev = lambda b, t: (ntt - 1 - t, 0, b, 0)  # noqa: E731
    out4 = pl.pallas_call(
        functools.partial(_bwd_lin_kernel, KT),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, G, BT, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, G, BT, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, G, BT, 4 * H), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, G, B, 4 * H), ys.dtype),
        scratch_shapes=[pltpu.VMEM((G, BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * G * B * H * H3,
            bytes_accessed=(
                (6 * H + 4 * H) * T * G * B * ys.dtype.itemsize
                + T * G * B * H * 4
            ),
            transcendentals=0,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 or BT > 128 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(c4, ch, dyp, wh)
    out4 = out4[:T]
    dxp = out4[..., : 3 * H]  # (dr_pre, dz_pre, dn_pre) — a strided view
    # weight grads as trajectory GEMMs (an in-kernel VMEM accumulator was
    # measured slower — NOTES_ROUND2). dhproj = (dr_pre, dz_pre, dhn) is
    # never materialized: the rz and n column blocks feed separate sliced
    # einsums whose small [G, H, .] results concatenate for free
    hprev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    dwh_rz = jnp.einsum(
        "tgbh,tgbo->gho", hprev, out4[..., : 2 * H],
        preferred_element_type=jnp.float32,
    )
    dwh_n = jnp.einsum(
        "tgbh,tgbo->gho", hprev, out4[..., 3 * H:],
        preferred_element_type=jnp.float32,
    )
    dwh = jnp.concatenate([dwh_rz, dwh_n], axis=-1).astype(wh.dtype)
    dbh = jnp.concatenate(
        [out4[..., : 2 * H].sum(axis=(0, 2)),
         out4[..., 3 * H:].sum(axis=(0, 2))],
        axis=-1,
    ).astype(bh.dtype)
    return dxp.astype(ys.dtype), dwh, dbh, None


def _bwd_fused(res, dy, interpret):
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
    dxp, dhn = pl.pallas_call(
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
            pl.BlockSpec((KT, G, BT, H), lambda b, t: (ntt - 1 - t, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, G, B, H3), xproj.dtype),
            jax.ShapeDtypeStruct((Tp, G, B, H), xproj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((G, BT, H), jnp.float32)],
        # KT > 1 blocks exceed the 16 MB default scoped-VMEM budget;
        # only raise it then (requesting 100 MB unconditionally would
        # fail on pre-v5e parts whose physical VMEM is smaller)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 or BT > 128 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(xp, mask, hprev_p, wh, bh, dyp)
    dxp = dxp[:T]
    dhn = dhn[:T]
    # weight grads as large trajectory GEMMs (outside the kernel; an
    # in-kernel VMEM accumulator was measured slower — NOTES_ROUND2).
    # dhproj = (dr_pre, dz_pre, dhn) is never materialized: its rz
    # blocks are dxp's first 2H columns, so the einsums slice instead.
    dwh_rz = jnp.einsum(
        "tgbh,tgbo->gho", hprev, dxp[..., : 2 * H],
        preferred_element_type=jnp.float32,
    )
    dwh_n = jnp.einsum(
        "tgbh,tgbo->gho", hprev, dhn,
        preferred_element_type=jnp.float32,
    )
    dwh = jnp.concatenate([dwh_rz, dwh_n], axis=-1).astype(wh.dtype)
    dbh = jnp.concatenate(
        [dxp[..., : 2 * H].sum(axis=(0, 2)), dhn.sum(axis=(0, 2))],
        axis=-1,
    ).astype(bh.dtype)
    return dxp.astype(xproj.dtype), dwh, dbh, None


pallas_gru_scan.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Two-stream BiGRU kernel (round 3): per-direction inputs/outputs with
# FLIPPED BlockSpec index maps for the reversed stream, so the host-side
# stack/flip of the input and the moveaxis/flip/concat of the output all
# disappear — the DMA engine does the time reversal for free while
# streaming blocks. Layouts are time-major end to end ([T, B, .]), which
# is both the scan order and the natural GEMM batching.
#
# Conventions: "kernel time" u runs 0..T-1; the reversed stream's step u
# processes frame T-1-u. Frame-ordered arrays for the reversed stream are
# FRONT-padded to the tile grid (so the flipped index map ntt-1-t plus an
# in-tile row reversal lands exactly on frame T-1-u); kernel-time arrays
# are end-padded. tmask stays in kernel time for both streams, exactly as
# in the grouped kernel above.
# ---------------------------------------------------------------------------


def _pad_front(a, Tp):
    """Zero-pad axis 0 (time) to length Tp at the FRONT."""
    T = a.shape[0]
    if T == Tp:
        return a
    return jnp.pad(a, [(Tp - T, 0)] + [(0, 0)] * (a.ndim - 1))


def _fwd2_kernel(KT, p0_ref, p1_ref, mask_ref, wh_ref, bh_ref,
                 ys0_ref, ys1_ref, h_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    for k in range(KT):
        rr = KT - 1 - k  # in-tile row for the reversed (frame-ordered) refs
        # phase 1: both streams' recurrent dots first (MXU pipelining)
        h0 = h_scr[0]
        h1 = h_scr[1]
        hp0 = jnp.dot(h0.astype(wh_ref.dtype), wh_ref[0],
                      preferred_element_type=jnp.float32) + bh_ref[0][None, :]
        hp1 = jnp.dot(h1.astype(wh_ref.dtype), wh_ref[1],
                      preferred_element_type=jnp.float32) + bh_ref[1][None, :]
        # phase 2: VPU gate math + carry update
        for g, (xp, hp, h_prev, ys_ref, row) in enumerate([
            (p0_ref[k], hp0, h0, ys0_ref, k),
            (p1_ref[rr], hp1, h1, ys1_ref, rr),
        ]):
            mf = mask_ref[k, g][:, None]
            r, z, n, hn, h_cand = _gates_2d(xp, hp, h_prev)
            h_new = mf * h_cand + (1.0 - mf) * h_prev
            h_store = h_new.astype(ys_ref.dtype)
            ys_ref[row] = h_store
            h_scr[g] = h_store.astype(jnp.float32)


def _bwd2_kernel(KT, dy_fused, p0_ref, p1_ref, mask_ref, h0_ref, h1_ref,
                 wh_ref, bh_ref, dy0_ref, dy1_ref,
                 dxp0_ref, dxp1_ref, dhn0_ref, dhn1_ref, dh_scr):
    t_rev = pl.program_id(1)  # 0 = last kernel-time tile

    @pl.when(t_rev == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    H = dh_scr.shape[-1]
    B = dh_scr.shape[1]
    # Phase 1 — everything that does NOT depend on the carried gradient
    # runs BEFORE the sequential loop: the gate-recompute projection as
    # one tall [KT*B, H] x [H, 3H] GEMM per stream, then the gates
    # (2 sigmoids + tanh, the only transcendentals) reduced to per-step
    # linear coefficients. The GRU backward step is LINEAR in the carried
    # gradient d_t (see _bwd_lin_kernel's derivation), so the sequential
    # critical path in phase 2 shrinks to 5 multiplies + ONE dot per
    # step. Unlike the env-gated "linear" variant (coefficients emitted
    # by the FORWARD kernel: +4.5 MB/step HBM, measured net loss), the
    # coefficients here are computed from tile-local VMEM blocks — no
    # extra HBM traffic.
    c4s = {}  # (g, row) -> [B, 4H] = (c_r, c_z, c_n2, c_nh)
    chs = {}  # (g, row) -> [B, H] carry coefficient (1 - mf) + mf * z
    for g, (p_ref, href) in enumerate([(p0_ref, h0_ref), (p1_ref, h1_ref)]):
        hp_all = jnp.dot(
            href[...].reshape(KT * B, H), wh_ref[g],
            preferred_element_type=jnp.float32,
        ) + bh_ref[g][None, :]
        for k in range(KT):
            # stream 1's refs are frame-ordered: row rr holds kernel step k
            row = k if g == 0 else KT - 1 - k
            mf = mask_ref[k, g][:, None]
            h_prev = href[row].astype(jnp.float32)
            r, z, n, hn, _ = _gates_2d(
                p_ref[row], hp_all[row * B:(row + 1) * B], h_prev
            )
            c_n2 = mf * ((1.0 - z) * (1.0 - n * n))
            c4s[g, row] = jnp.concatenate(
                [c_n2 * (hn * (r * (1.0 - r))),          # c_r
                 mf * ((h_prev - n) * (z * (1.0 - z))),  # c_z
                 c_n2,
                 c_n2 * r],                              # c_nh
                axis=-1,
            )
            chs[g, row] = (1.0 - mf) + mf * z
    # Phase 2 — the sequential chain
    for k in reversed(range(KT)):
        rr = KT - 1 - k
        for g, (dy_ref, row, dxp_ref, dhn_ref) in enumerate([
            (dy0_ref, k, dxp0_ref, dhn0_ref),
            (dy1_ref, rr, dxp1_ref, dhn1_ref),
        ]):
            if dy_fused:  # dy refs are full-width [., B, 2H] views of dout
                dy = dy_ref[row][:, g * H:(g + 1) * H]
            else:
                dy = dy_ref[row]
            d = dh_scr[g] + dy
            e = c4s[g, row] * jnp.concatenate([d, d, d, d], axis=-1)
            # dxp = (dr_pre, dz_pre, dn_pre); dhproj = (dr_pre, dz_pre,
            # dhn) — first 2H columns shared, so only dhn (column block 3)
            # is emitted separately and dwh is reassembled outside from
            # sliced einsums (saves 2H of output DMA per stream per step)
            dxp_ref[row] = e[:, :3 * H].astype(dxp_ref.dtype)
            dhn_ref[row] = e[:, 3 * H:].astype(dhn_ref.dtype)
            dhproj = jnp.concatenate([e[:, :2 * H], e[:, 3 * H:]], axis=-1)
            dh_scr[g] = chs[g, row] * d + jnp.dot(
                dhproj.astype(wh_ref.dtype), wh_ref[g].T,
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pallas_bigru_scan(p0, p1, wh, bh, tmask, interpret=False):
    """Two-stream BiGRU recurrence, time-major.

    p0/p1: [T, B, 3H] input projections (bias added) for the forward and
    reversed direction — BOTH in natural frame order (the kernel's
    flipped index maps feed the reversed stream frames T-1-u at step u).
    wh: [2, H, 3H]; bh: [2, 3H]; tmask: [T, 2, B] in KERNEL time (group
    1's window is t >= T - len, as in the grouped kernel). Returns
    [T, B, 2H] = concat(forward states, reversed states in frame order).
    """
    ys0, ys1 = _fwd2(p0, p1, wh, bh, tmask, interpret)
    return jnp.concatenate([ys0, ys1], axis=-1)


def _fwd2(p0, p1, wh, bh, tmask, interpret):
    T, B, H3 = p0.shape
    H = H3 // 3
    BT = _batch_tile(B)
    KT = min(FWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    mask = _pad_time(tmask.astype(jnp.float32), Tp)  # [Tp, 2, B]
    p0p = _pad_time(p0, Tp)
    p1p = _pad_front(p1, Tp)
    ys0, ys1 = pl.pallas_call(
        functools.partial(_fwd2_kernel, KT),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, BT, H3), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H3), lambda b, t, n=ntt: (n - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 2, BT), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, BT, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H), lambda b, t, n=ntt: (n - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), p0.dtype),
            jax.ShapeDtypeStruct((Tp, B, H), p0.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * H * H3,
            bytes_accessed=(p0.size + p1.size + 2 * T * B * H)
            * p0.dtype.itemsize,
            transcendentals=3 * T * 2 * B * H,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 or BT > 128 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(p0p, p1p, mask, wh, bh)
    return ys0[:T], ys1[Tp - T:]


def _fwd2_rule(p0, p1, wh, bh, tmask, interpret):
    ys0, ys1 = _fwd2(p0, p1, wh, bh, tmask, interpret)
    return (jnp.concatenate([ys0, ys1], axis=-1),
            (p0, p1, wh, bh, tmask, ys0, ys1))


def _bwd2_rule(interpret, res, dout):
    p0, p1, wh, bh, tmask, ys0, ys1 = res
    T, B, H3 = p0.shape
    H = H3 // 3
    BT = _batch_tile(B)
    KT = min(BWD_TIME_TILE, T)
    Tp = -(-T // KT) * KT
    ntt = Tp // KT
    mask = _pad_time(tmask.astype(jnp.float32), Tp)
    p0p = _pad_time(p0, Tp)
    p1p = _pad_front(p1, Tp)
    # per-stream previous-state trajectories, frame-ordered:
    #   stream 0: h_prev at kernel step u (= frame u) is ys0[u-1]
    #   stream 1: h_prev at kernel step u is ys1 at frame T-u, i.e. the
    #   frame-ordered buffer shifted one frame LEFT (zero at the end)
    z1 = jnp.zeros_like(ys0[:1])
    h0 = jnp.concatenate([z1, ys0[:-1]], axis=0)
    h1 = jnp.concatenate([ys1[1:], z1], axis=0)
    h0p = _pad_time(h0, Tp)
    h1p = _pad_front(h1, Tp)
    dy_fused = Tp == T
    if dy_fused:
        dy0 = dy1 = dout  # full-width views; kernel slices its half
        W = 2 * H
    else:
        dy0 = _pad_time(dout[..., :H], Tp)
        dy1 = _pad_front(dout[..., H:], Tp)
        W = H
    rev = lambda b, t, n=ntt: (n - 1 - t, b, 0)  # noqa: E731
    fwdm = lambda b, t: (t, b, 0)  # noqa: E731
    dxp0, dxp1, dhn0, dhn1 = pl.pallas_call(
        functools.partial(_bwd2_kernel, KT, dy_fused),
        grid=(B // BT, ntt),
        in_specs=[
            pl.BlockSpec((KT, BT, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H3), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, 2, BT), lambda b, t, n=ntt: (n - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H3), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, W), fwdm, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KT, BT, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H3), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((KT, BT, H), fwdm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H3), p0.dtype),
            jax.ShapeDtypeStruct((Tp, B, H3), p0.dtype),
            jax.ShapeDtypeStruct((Tp, B, H), p0.dtype),
            jax.ShapeDtypeStruct((Tp, B, H), p0.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, BT, H), jnp.float32)],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if KT > 1 or BT > 128 else pltpu.CompilerParams()
        ),
        interpret=interpret,
    )(p0p, p1p, mask, h0p, h1p, wh, bh, dy0, dy1)
    dxp0 = dxp0[:T]
    dxp1 = dxp1[Tp - T:]
    dhn0 = dhn0[:T]
    dhn1 = dhn1[Tp - T:]
    # weight grads as whole-trajectory GEMMs; stream-1 pairs line up in
    # frame order (h1, dxp1, dhn1 are all kernel-time-flipped the same
    # way, and the sum over time is order-invariant). dhproj = (dr_pre,
    # dz_pre, dhn) is never materialized: its rz blocks are dxp's first
    # 2H columns, so the einsums slice instead (the kernel only emits
    # the H-wide dhn block).
    def _dwh(h, dxp, dhn):
        rz = jnp.einsum("tbh,tbo->ho", h, dxp[..., : 2 * H],
                        preferred_element_type=jnp.float32)
        nb = jnp.einsum("tbh,tbo->ho", h, dhn,
                        preferred_element_type=jnp.float32)
        return jnp.concatenate([rz, nb], axis=-1)

    dwh = jnp.stack(
        [_dwh(h0, dxp0, dhn0), _dwh(h1, dxp1, dhn1)]
    ).astype(wh.dtype)
    dbh = jnp.stack([
        jnp.concatenate(
            [dxp0[..., : 2 * H].sum(axis=(0, 1)), dhn0.sum(axis=(0, 1))]
        ),
        jnp.concatenate(
            [dxp1[..., : 2 * H].sum(axis=(0, 1)), dhn1.sum(axis=(0, 1))]
        ),
    ]).astype(bh.dtype)
    return (dxp0.astype(p0.dtype), dxp1.astype(p1.dtype), dwh, dbh, None)


pallas_bigru_scan.defvjp(_fwd2_rule, _bwd2_rule)
