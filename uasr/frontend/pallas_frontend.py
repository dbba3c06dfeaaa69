"""Fused Pallas TPU kernel for the log-mel frontend hot path.

One kernel fuses: framing -> windowing -> DFT (two MXU GEMMs against
cos/sin bases, the MelT GEMM-native NDFT pattern, PAPERS.md) -> power
spectrum -> mel filterbank GEMM -> log floor. The XLA reference path
materializes the frame matrix (2.5x the audio) and the power spectrum
(1.6x) in HBM between fusions; here both stay in VMEM.

Framing on a vector machine, without per-frame slices:
  frame starts are multiples of frame_shift (160), which are not lane-
  aligned (128). But GROUP = lcm(shift, 128)/shift (= 4) consecutive
  frames span exactly GROUP*shift (= 640 = 5*128) samples, so:
    1. host side: cut audio into chunk rows of [ROWS, 640]
       (one gather; +1.2% HBM for the overlap tails);
    2. in kernel: rows_cat = concat(rows[:-1], rows[1:]) -> [ROWS-1, 1280]
       so every frame lies inside one row;
    3. the whole frame matrix is GROUP static lane-slices
       rows_cat[:, r*shift : r*shift + frame_len], concatenated ->
       [GROUP * (ROWS-1), frame_len] in residue-grouped order.
  Group order is undone by a tiny transpose outside the kernel. This
  replaced a 128-way unrolled per-frame copy that Mosaic took minutes
  to compile.

Numerics match `uasr.frontend.features.log_mel_frontend` (and therefore
the numpy oracle to 1e-4): same constant bank, f32 GEMMs with HIGHEST
precision. Validated against the XLA path on real TPU hardware and in
interpreter mode on CPU (tests/test_pallas_frontend.py).

Pre-emphasis stays outside (one fused VPU op in XLA); everything after
log-mel (MFCC/deltas/CMVN/splice) is cheap and stays in the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uasr.config import FrontendConfig
from uasr.frontend.features import FrontendState, preemphasize

_LOG_FLOOR = float(np.finfo(np.float64).eps)
_HI = jax.lax.Precision.HIGHEST


def _dot_tier(a, b, precision):
    """In-kernel GEMM at the configured fidelity tier (see
    FrontendConfig.precision): "bfloat16" = native single-pass MXU,
    "high" = bf16x3 split (a = hi + lo; a@b ~ hi@bh + hi@bl + lo@bh —
    3 native passes, Mosaic has no HIGH lowering), else 6-pass f32
    emulation (oracle parity)."""
    if precision == "bfloat16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    if precision == "high":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            + jnp.dot(al, bh, preferred_element_type=jnp.float32)
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _log_mel_kernel(
    chunk_ref,  # VMEM block [1, ROWS, ROW_LEN]
    window_ref,  # VMEM [1, FL]
    cos_ref,  # VMEM [FL, NB]
    sin_ref,  # VMEM [FL, NB]
    mel_ref,  # VMEM [NB, M]
    out_ref,  # VMEM block [1, GROUP * (ROWS-1), M], residue-grouped rows
    frames,  # VMEM scratch [GROUP * (ROWS-1), FL]
    *,
    frame_len: int,
    frame_shift: int,
    group: int,
    n_fft: int,
    precision=_HI,
    want_energy: bool = False,
):
    rows = chunk_ref[0]  # [ROWS, ROW_LEN]
    row_len = rows.shape[1]
    # successor rows via roll (Mosaic cannot mix sublane offsets), so a
    # stripe spanning a row boundary reads its tail from rows_next
    rows_next = pltpu.roll(rows, shift=rows.shape[0] - 1, axis=0)
    n = rows.shape[0] - 1
    # write each residue-r stripe straight into the frames scratch
    # (stores relayout the unaligned lane offsets; no in-kernel concat)
    for r in range(group):
        lo = r * frame_shift
        hi = lo + frame_len
        if hi <= row_len:
            frames[r * n : (r + 1) * n, :] = rows[:-1, lo:hi]
        else:
            head = row_len - lo
            frames[r * n : (r + 1) * n, :head] = rows[:-1, lo:row_len]
            frames[r * n : (r + 1) * n, head:] = rows_next[
                :-1, : frame_len - head
            ]
    w = frames[:] * window_ref[0, :]
    re = _dot_tier(w, cos_ref[:], precision)
    im = _dot_tier(w, sin_ref[:], precision)
    power = (re * re + im * im) * (1.0 / n_fft)
    mel = _dot_tier(power, mel_ref[:], precision)
    if want_energy:
        # MFCC-with-energy: log total spectral power rides as an extra
        # output column (sliced off by the wrapper) — the raw power
        # spectrum never leaves VMEM
        M = mel.shape[1]
        out_ref[0, :, :M] = jnp.log(jnp.maximum(mel, _LOG_FLOOR))
        loge = jnp.log(jnp.maximum(jnp.sum(power, axis=1), _LOG_FLOOR))
        out_ref[0, :, M:] = loge[:, None]
    else:
        out_ref[0, :, :] = jnp.log(jnp.maximum(mel, _LOG_FLOOR))


def _log_mel_fused_kernel(
    chunk_ref,  # VMEM block [1, ROWS + 1, ROW_LEN] — RAW audio rows,
    #             one extra LEADING row so every frame can reach the
    #             sample just before its start (pre-emphasis boundary)
    cos_ref,  # VMEM [FL, NB] — window+preemph folded (state.pre_cos)
    sin_ref,  # VMEM [FL, NB] — state.pre_sin
    bvec_ref,  # VMEM [2, NB] — boundary coefficients (state.pre_bvec)
    mel_ref,  # VMEM [NB, M]
    out_ref,  # VMEM block [1, GROUP * (ROWS-1), M], residue-grouped rows
    frames,  # VMEM scratch [GROUP * (ROWS-1), FL]
    bcol,  # VMEM scratch [GROUP * (ROWS-1), 1] — x[s-1] per frame
    *,
    frame_len: int,
    frame_shift: int,
    group: int,
    n_fft: int,
    precision=_HI,
    want_energy: bool = False,
):
    """Pre-emphasis + window folded into the DFT GEMM (see
    FrontendState.pre_cos): consumes RAW audio rows, so the host-side
    preemphasize() pass (an unaligned 1-sample shift: ~1.4 ms of pure
    relayout at B=128 x 8 s) and the in-kernel window multiply both
    disappear. DFT_k = frame @ pre_cos[:, k] + x[s-1] * bvec[0, k]."""
    rows_all = chunk_ref[0]  # [ROWS + 1, ROW_LEN]
    row_len = rows_all.shape[1]
    rows = rows_all[1:]  # base rows — identical framing to the
    #                      legacy kernel from here down
    rows_next = pltpu.roll(rows, shift=rows.shape[0] - 1, axis=0)
    n = rows.shape[0] - 1
    for r in range(group):
        lo = r * frame_shift
        hi = lo + frame_len
        if hi <= row_len:
            frames[r * n : (r + 1) * n, :] = rows[:-1, lo:hi]
        else:
            head = row_len - lo
            frames[r * n : (r + 1) * n, :head] = rows[:-1, lo:row_len]
            frames[r * n : (r + 1) * n, head:] = rows_next[
                :-1, : frame_len - head
            ]
        # the sample just before each frame start: residue 0 reads the
        # previous row's last sample (rows_all[j] for base row j+1 —
        # the extra leading row makes j = 0 well-defined; the global
        # front zero-row gives the oracle's x[-1] = 0 convention)
        if lo == 0:
            bcol[r * n : (r + 1) * n, :] = rows_all[:n, row_len - 1 :]
        else:
            bcol[r * n : (r + 1) * n, :] = rows[:-1, lo - 1 : lo]
    w = frames[:]
    bc = bcol[:]  # [BF, 1]
    re = _dot_tier(w, cos_ref[:], precision) + bc * bvec_ref[0:1, :]
    im = _dot_tier(w, sin_ref[:], precision) + bc * bvec_ref[1:2, :]
    power = (re * re + im * im) * (1.0 / n_fft)
    mel = _dot_tier(power, mel_ref[:], precision)
    if want_energy:
        M = mel.shape[1]
        out_ref[0, :, :M] = jnp.log(jnp.maximum(mel, _LOG_FLOOR))
        loge = jnp.log(jnp.maximum(jnp.sum(power, axis=1), _LOG_FLOOR))
        out_ref[0, :, M:] = loge[:, None]
    else:
        out_ref[0, :, :] = jnp.log(jnp.maximum(mel, _LOG_FLOOR))


@functools.partial(
    jax.jit,
    static_argnames=("frame_len", "frame_shift", "n_fft", "block_frames",
                     "interpret", "precision", "want_energy", "fused"),
)
def _pallas_log_mel(
    audio: jax.Array,
    state: FrontendState,
    frame_len: int,
    frame_shift: int,
    n_fft: int,
    block_frames: int | None = None,
    interpret: bool = False,
    precision: str = "highest",
    want_energy: bool = False,
    fused: bool = False,
) -> jax.Array:
    """[B, L] audio -> [B, T, M] log-mel (M+1 with the log-energy
    column when want_energy). With fused=False the input must already
    be pre-emphasized (legacy/streaming path); with fused=True the
    input is RAW audio and pre-emphasis + window ride inside the DFT
    bases (state.pre_cos/pre_sin/pre_bvec)."""
    B, L = audio.shape
    FL, FS = frame_len, frame_shift
    T = max(1 + (L - FL) // FS, 1)
    M_mel = state.mel_fb.shape[1]
    M = M_mel + (1 if want_energy else 0)  # output cols (+1 = log-energy)
    NB = n_fft // 2 + 1

    group = 128 // math.gcd(FS, 128)  # frames per aligned stripe period
    row_len = group * FS
    assert row_len >= FL - FS, "frame overlap must fit within one row"
    if block_frames is None:
        # fat blocks, evenly loaded: few sequential grid steps with
        # minimal padding waste (round-1's fixed 128 ran a 7x longer
        # grid of M=128 GEMMs: measured ~2x slower at B=128 x 8 s; one
        # ~800-frame block per 8 s utterance beat two ~400-frame blocks
        # by ~25% in round 3 — fewer grid steps, no duplicated overlap
        # row, taller GEMMs). 1024 caps the f32 frames scratch at
        # 1024 x FL x 4 ≈ 1.6 MB, comfortably inside scoped VMEM.
        Tg = -(-T // group) * group
        n_b = max(1, -(-Tg // 1024))
        block_frames = -(-Tg // (n_b * group)) * group
    assert block_frames % group == 0
    rows_per_block = block_frames // group  # frames rows -> ROWS-1
    n_blocks = pl.cdiv(T, block_frames)

    # chunk rows: ROWS = rows_per_block + 1 (the +1 carries the overlap)
    ROWS = rows_per_block + 1
    n_rows_total = (n_blocks - 1) * rows_per_block + ROWS
    total = n_rows_total * row_len
    lead = row_len if fused else 0  # fused: one zero LEADING row so the
    #   pre-emphasis boundary sample x[s-1] exists for the first frame
    #   (row_len is a multiple of the 128-lane tile -> the front pad is
    #   relayout-free, unlike the 1-sample shift it replaces)
    # pad up or truncate down to the exact row grid (truncation is safe:
    # the last frame ends within the grid — (group+1)*FS >= FL)
    audio = audio[:, :total] if L > total else audio
    audio = jnp.pad(audio, ((0, 0), (lead, total - audio.shape[1])))
    # overlapping chunk assembly via reshape + static slices (an
    # advanced-indexing gather here cost ~0.5 ms at B=128 x 8 s)
    crows = ROWS + (1 if fused else 0)
    rows = audio.reshape(B, n_rows_total + (1 if fused else 0), row_len)
    chunks = jnp.stack(
        [rows[:, s : s + crows]
         for s in range(0, n_blocks * rows_per_block, rows_per_block)],
        axis=1,
    ).reshape(B * n_blocks, crows, row_len)

    kern = _log_mel_fused_kernel if fused else _log_mel_kernel
    if fused:
        ins = (chunks, state.pre_cos, state.pre_sin, state.pre_bvec,
               state.mel_fb)
        in_specs = [
            pl.BlockSpec((1, crows, row_len), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FL, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FL, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, M_mel), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((block_frames, FL), jnp.float32),
            pltpu.VMEM((block_frames, 1), jnp.float32),
        ]
    else:
        ins = (chunks, state.window.reshape(1, FL), state.cos_basis,
               state.sin_basis, state.mel_fb)
        in_specs = [
            pl.BlockSpec((1, crows, row_len), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FL), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FL, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FL, NB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, M_mel), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((block_frames, FL), jnp.float32)]

    out = pl.pallas_call(
        functools.partial(
            kern,
            frame_len=FL,
            frame_shift=FS,
            group=group,
            n_fft=n_fft,
            precision=precision,
            want_energy=want_energy,
        ),
        grid=(B * n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_frames, M), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B * n_blocks, block_frames, M), jnp.float32
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_blocks * block_frames * FL * (2 * NB)
            + 2 * B * n_blocks * block_frames * NB * M,
            bytes_accessed=chunks.size * 4 + B * n_blocks * block_frames * M * 4,
            transcendentals=B * n_blocks * block_frames * M,
        ),
        # grid steps are independent utterance blocks — let Mosaic
        # schedule them without sequential-dependence constraints
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(*ins)
    # undo the residue grouping: kernel row g = r * rows_per_block + k
    # corresponds to frame index k * group + r
    out = out.reshape(B, n_blocks, group, rows_per_block, M)
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, n_blocks * block_frames, M)
    return out[:, :T, :]


def pallas_log_mel_frontend(
    audio: jax.Array,
    state: FrontendState,
    cfg: FrontendConfig,
    block_frames: int | None = None,
    interpret: bool = False,
    precision: str = "highest",
    want_energy: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for features.log_mel_frontend.

    With want_energy, returns [B, T, M+1] whose last column is the log
    total spectral power per frame (MFCC use_energy, computed in-kernel).

    When the state carries the folded bases (any state built by
    make_frontend_state), raw audio goes straight into the kernel and
    pre-emphasis rides inside the DFT GEMM; states without them (e.g.
    legacy pickles) fall back to the explicit preemphasize() pass.
    """
    if state.pre_cos is not None:
        return _pallas_log_mel(
            audio, state, cfg.frame_length, cfg.frame_shift, cfg.n_fft,
            block_frames=block_frames, interpret=interpret,
            precision=precision, want_energy=want_energy, fused=True,
        )
    x = preemphasize(audio, cfg.preemph)
    return _pallas_log_mel(
        x, state, cfg.frame_length, cfg.frame_shift, cfg.n_fft,
        block_frames=block_frames, interpret=interpret, precision=precision,
        want_energy=want_energy,
    )
