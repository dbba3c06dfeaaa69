"""Building blocks: scan-based (Bi)GRU and strided conv front-end.

TPU-first GRU design (vs the reference's cuDNN-delegated Keras GRU,
SURVEY.md §2.1): the three input projections for ALL timesteps are one
large [B*T, D] x [D, 3H] GEMM hoisted out of the recurrence, so the
`lax.scan` body contains only the [B, H] x [H, 3H] recurrent matmul and
cheap VPU gate math. Gate formulas use the cuDNN/Keras "reset-after"
convention so weights are semantically interchangeable with the
reference's layers.

Padding-aware: the backward direction of the BiGRU reverses each
utterance within its own valid length, and hidden state stops updating
past the end of each utterance, so results are independent of batch
padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRULayer(nn.Module):
    """Unidirectional GRU over time-major input via lax.scan.

    Input [B, T, D] -> output [B, T, H]. `lengths` freezes the carried
    state past each utterance's end (output frames there are zeroed by
    callers if needed).
    """

    hidden: int
    reverse: bool = False
    unroll: int = 4
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # whole recurrence as one Pallas kernel

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        lengths: jax.Array,
        h0: jax.Array | None = None,
        return_final: bool = False,
    ):
        """h0 [B, H] (optional): initial hidden state — the streaming
        seam (UniGRUEncoder carries it across chunks; feeding chunks
        sequentially reproduces the full scan exactly). return_final:
        also return the PRE-masking state after the last step (frozen
        past each utterance's end), i.e. the carry for the next chunk.
        h0 is only supported for the scan path (forward direction)."""
        B, T, D = x.shape
        H = self.hidden
        wx = self.param("wx", nn.initializers.lecun_normal(), (D, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bx = self.param("bx", nn.initializers.zeros, (3 * H,))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))

        x = x.astype(self.dtype)
        wx = wx.astype(self.dtype)
        wh = wh.astype(self.dtype)

        if self.reverse:
            # reverse within each utterance's valid length
            idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
            idx = jnp.clip(idx, 0, T - 1)
            x = jnp.take_along_axis(x, idx[:, :, None], axis=1)

        # hoisted input projections: one big MXU GEMM for all timesteps
        xproj = (x.reshape(B * T, D) @ wx + bx.astype(self.dtype)).reshape(B, T, 3 * H)
        xproj = jnp.moveaxis(xproj, 1, 0)  # [T, B, 3H]

        tmask = jnp.arange(T)[:, None] < lengths[None, :]  # [T, B]

        def step(h, inp):
            xp, m = inp  # xp: [B, 3H], m: [B]
            hproj = h @ wh + bh.astype(self.dtype)
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hproj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)  # reset-after (cuDNN convention)
            h_new = (1.0 - z) * n + z * h
            h_new = jnp.where(m[:, None], h_new, h)
            return h_new, h_new

        if h0 is not None and self.reverse:
            raise ValueError(
                "GRULayer h0 carry is a forward-scan feature (streaming); "
                "unsupported with reverse=True"
            )
        if self.use_pallas and h0 is None:
            # (a given h0 means a streaming chunk step: tiny T, the
            # lax.scan below is the right tool — the Pallas kernel has
            # no initial-state input)
            # single-group (G=1) call into the grouped Pallas recurrence
            # used by BiGRU — the SSL context network's hot path on TPU
            from uasr.models.pallas_gru import pallas_gru_scan

            ys = pallas_gru_scan(
                xproj[:, None], wh[None].astype(self.dtype),
                bh[None].astype(self.dtype), tmask[:, None],
            )[:, 0]
            h_final = ys[-1]  # pre-mask emit = frozen state past ends
        else:
            h_init = (
                jnp.zeros((B, H), self.dtype)
                if h0 is None
                else h0.astype(self.dtype)
            )
            h_final, ys = jax.lax.scan(
                step, h_init, (xproj, tmask), unroll=self.unroll
            )
        ys = jnp.moveaxis(ys, 0, 1)  # [B, T, H]

        if self.reverse:
            idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
            idx = jnp.clip(idx, 0, T - 1)
            ys = jnp.take_along_axis(ys, idx[:, :, None], axis=1)
        # zero padding frames
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        out = jnp.where(valid, ys, 0.0).astype(jnp.float32)
        if return_final:
            return out, h_final
        return out


class BiGRU(nn.Module):
    """Bidirectional GRU: concat of forward and length-aware backward.

    Fused single-scan design: the backward direction is folded into the
    batch dimension (its input fully time-flipped, with a per-direction
    validity mask absorbing the padding prefix), so one `lax.scan` of T
    steps computes both directions — half the sequential steps of the
    naive two-scan formulation, and each step's recurrent matmul is a
    [2, B, H] x [2, H, 3H] batched GEMM that fills the MXU better. The
    recurrence is latency-bound on TPU, so halving step count is the
    single biggest BiGRU win (see BENCH history).
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 4
    remat: bool = False  # recompute gates in backward (HBM for FLOPs)
    use_pallas: bool = False  # whole recurrence as one Pallas kernel
    time_major: bool = False  # in/out [T, B, .] (the TPU-native layout)

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        if not self.time_major:
            x = jnp.swapaxes(x, 0, 1)
        T, B, D = x.shape
        H = self.hidden
        # parameters grouped [2, ...]: index 0 = forward, 1 = backward
        wx = self.param(
            "wx", lambda k, s: jnp.stack([
                nn.initializers.lecun_normal()(kk, s[1:])
                for kk in jax.random.split(k, 2)
            ]), (2, D, 3 * H),
        )
        wh = self.param(
            "wh", lambda k, s: jnp.stack([
                nn.initializers.orthogonal()(kk, s[1:])
                for kk in jax.random.split(k, 2)
            ]), (2, H, 3 * H),
        )
        bx = self.param("bx", nn.initializers.zeros, (2, 3 * H))
        bh = self.param("bh", nn.initializers.zeros, (2, 3 * H))

        x = x.astype(self.dtype)
        wxd = wx.astype(self.dtype)
        whd = wh.astype(self.dtype)
        bxd = bx.astype(self.dtype)
        bhd = bh.astype(self.dtype)

        tpos = jnp.arange(T)[:, None]
        tmask = jnp.stack(
            [tpos < lengths[None, :], tpos >= (T - lengths)[None, :]],
            axis=1,
        )  # [T, 2, B] in kernel time (the reversed stream's first
        #    T - len steps are its padding prefix)

        if self.use_pallas:
            # two-stream kernel: BOTH directions' input projections are
            # computed in natural frame order (one [T*B, D] x [D, 3H]
            # GEMM each) and the kernel's flipped BlockSpec index maps
            # deliver the reversed stream its frames backwards — the
            # host-side stack/flip of the input and the moveaxis/flip/
            # concat of the output (≈0.5 GB/step of pure relayout at
            # production shapes, round-3 probe) all disappear.
            from uasr.models.pallas_gru import pallas_bigru_scan

            p0 = (
                jnp.einsum("tbd,do->tbo", x, wxd[0],
                           preferred_element_type=self.dtype)
                + bxd[0]
            )
            p1 = (
                jnp.einsum("tbd,do->tbo", x, wxd[1],
                           preferred_element_type=self.dtype)
                + bxd[1]
            )
            out = pallas_bigru_scan(p0, p1, whd, bhd, tmask)  # [T, B, 2H]
        else:
            # scan fallback: reversed copy rides as an extra group. A
            # full jnp.flip (one cheap lax.rev) replaces round-1's
            # per-length take_along_axis: gathers cost ~4x a flip on
            # TPU and their transpose is a scatter-add in the backward
            # pass (measured 0.7 ms vs 0.2 ms fwd+bwd per use at B=128,
            # T=200, H=512).
            x2 = jnp.stack([x, jnp.flip(x, axis=0)], axis=1)  # [T, 2, B, D]
            xproj = (
                jnp.einsum("tgbd,gdo->tgbo", x2, wxd,
                           preferred_element_type=self.dtype)
                + bxd[:, None, :]
            )  # [T, 2, B, 3H]

            def step(h, inp):
                xp, m = inp  # xp: [2, B, 3H], m: [2, B]
                hproj = (
                    jnp.einsum("gbh,gho->gbo", h, whd,
                               preferred_element_type=self.dtype)
                    + bhd[:, None, :]
                )
                xr, xz, xn = jnp.split(xp, 3, axis=-1)
                hr, hz, hn = jnp.split(hproj, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)  # reset-after (cuDNN convention)
                h_new = (1.0 - z) * n + z * h
                h_new = jnp.where(m[:, :, None], h_new, h)
                return h_new, h_new

            h0 = jnp.zeros((2, B, H), self.dtype)
            body = jax.checkpoint(step) if self.remat else step
            _, ys = jax.lax.scan(body, h0, (xproj, tmask), unroll=self.unroll)
            # un-reverse: state at flipped step u belongs to frame T-1-u,
            # and the reversed stream's padding prefix is exactly zero
            out = jnp.concatenate(
                [ys[:, 0], jnp.flip(ys[:, 1], axis=0)], axis=-1
            )  # [T, B, 2H]
        valid = (jnp.arange(T)[:, None] < lengths[None, :])[..., None]
        # stay in the compute dtype: the f32 upcast between stacked
        # layers cost ~0.2 ms/layer of pure HBM traffic under bf16;
        # consumers (next BiGRU, f32 logits Dense) cast as they need
        out = jnp.where(valid, out, 0.0)
        if not self.time_major:
            out = jnp.swapaxes(out, 0, 1)
        return out


class ConvBlock(nn.Module):
    """Strided 2D conv over (time, freq) + LayerNorm + ReLU.

    The reference used Conv2D+BatchNorm blocks (SURVEY.md §2.2 "CTC
    encoder(s)"); LayerNorm is used here instead of BatchNorm — no
    running statistics to synchronize across the data mesh axis, and it
    fuses cleanly under jit.
    """

    channels: int
    kernel: int = 3
    time_stride: int = 2
    freq_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, F, C]
        x = nn.Conv(
            self.channels,
            (self.kernel, self.kernel),
            strides=(self.time_stride, self.freq_stride),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.relu(x)


def conv_out_length(lengths: jax.Array, stride: int, num_layers: int) -> jax.Array:
    for _ in range(num_layers):
        lengths = (lengths + stride - 1) // stride
    return lengths
