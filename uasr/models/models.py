"""Model families (SURVEY.md §2.2):

- ConvBiGRUEncoder: conv front-end (strided blocks) + N x BiGRU + dense
  logits incl. blank — the reference's supervised CTC acoustic model.
- CNNEncoder: pure-convolutional CTC encoder variant (reference had CNN
  variants; also the fastest path on the MXU — no sequential scan).
- PhoneClassifier: acoustic features -> per-frame phone posteriors; the
  GAN "generator" G and the EODM model (small conv-context + MLP).
- PhoneDiscriminator: phone-posterior / one-hot sequences -> scalar
  critic score; stacked 1-D convs + pooling, WGAN-GP critic (no
  normalization layers, per the GP requirement).

All modules take (features [B, T, D], lengths [B]) and return logits
plus the (possibly subsampled) lengths, so losses/decoders are uniform
across families.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from uasr.config import ModelConfig
from uasr.models.layers import BiGRU, ConvBlock, GRULayer, conv_out_length


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _int8_kwargs(cfg: ModelConfig):
    """(dense_kwargs, conv_kwargs) injecting the int8-MXU GEMM path
    into flax layers when model.int8_compute is set (serving)."""
    if not cfg.int8_compute:
        return {}, {}
    from uasr.ops.quantize import (
        int8_conv_general_dilated, int8_dot_general,
    )

    return ({"dot_general": int8_dot_general},
            {"conv_general_dilated": int8_conv_general_dilated})


def _length_mask(x: jax.Array, lengths: jax.Array) -> jax.Array:
    T = x.shape[1]
    return (jnp.arange(T)[None, :] < lengths[:, None])[..., None]


class PatchFront(nn.Module):
    """TPU-first subsampling front-end: non-overlapping patches of
    `patch` frames -> one GEMM embed -> k-wide context conv1d, both at
    MXU-aligned widths (vs the conv2d path's 32-wide channel minor dim,
    which pads to the 128-lane tile and quadruples HBM traffic — the
    round-3 backward decomposition measured the conv2d stack at 3.9 ms
    fwd+bwd of the 18.4 ms step for only ~11 GFLOP)."""

    patch: int
    hidden: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array):
        B, T, D = x.shape
        P = self.patch
        x = x.astype(self.dtype)
        x = x * _length_mask(x, lengths)
        if T % P:
            x = jnp.pad(x, ((0, 0), (0, P - T % P), (0, 0)))
        x = x.reshape(B, x.shape[1] // P, P * D)
        lengths = (lengths + P - 1) // P
        x = nn.Dense(self.hidden, dtype=self.dtype, name="embed")(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = x * _length_mask(x, lengths)
        y = nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                    dtype=self.dtype, name="context")(x)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        x = x + nn.relu(y)  # residual context block
        x = x * _length_mask(x, lengths)
        return x, lengths


def _subsample_front(cfg: ModelConfig, feats: jax.Array,
                     lengths: jax.Array, dt):
    """Shared subsampling front: reference-parity strided Conv2D blocks
    (`conv_front: conv2d`) or the MXU-aligned patch embed (`patch`).
    Both emit [B, T/stride**layers, width] with width =
    conv_channels * ceil(D / 2**layers), so encoders are agnostic."""
    B, T, D = feats.shape
    if cfg.conv_front == "patch":
        width = cfg.conv_channels * (
            (D + 2 ** cfg.num_conv_layers - 1) // 2 ** cfg.num_conv_layers
        )
        return PatchFront(
            patch=cfg.conv_time_stride ** cfg.num_conv_layers,
            hidden=width, kernel=cfg.conv_kernel, dtype=dt, name="patch",
        )(feats, lengths)
    if cfg.conv_front != "conv2d":
        raise ValueError(f"unknown conv_front {cfg.conv_front!r}")
    x = feats[..., None].astype(dt)  # [B, T, D, 1]
    for i in range(cfg.num_conv_layers):
        x = ConvBlock(
            cfg.conv_channels,
            kernel=cfg.conv_kernel,
            time_stride=cfg.conv_time_stride,
            freq_stride=2,
            dtype=dt,
            name=f"conv{i}",
        )(x)
        lengths = jnp.minimum(
            conv_out_length(lengths, cfg.conv_time_stride, 1), x.shape[1]
        )
        # re-mask each block: bias/LayerNorm make padding frames
        # nonzero and the next strided conv would leak them inward
        x = x * _length_mask(x, lengths)[..., None]
    B, T2, F2, C = x.shape
    return x.reshape(B, T2, F2 * C), lengths


class ConvBiGRUEncoder(nn.Module):
    """conv x N (strided) -> BiGRU x M -> dense logits (V incl. blank)."""

    cfg: ModelConfig
    vocab_size: int

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        dt = _dtype(cfg)
        x, lengths = _subsample_front(cfg, feats, lengths, dt)
        # time-major trunk: one transpose in, one out — the BiGRU stack
        # and the logits GEMM all run in the scan-native [T, B, .]
        # layout (no per-layer relayout)
        x = jnp.swapaxes(x, 0, 1)
        for i in range(cfg.num_gru_layers):
            x = BiGRU(cfg.hidden_size, dtype=dt, unroll=cfg.gru_unroll,
                      remat=cfg.gru_remat, use_pallas=cfg.gru_pallas,
                      time_major=True, name=f"bigru{i}")(x, lengths)
            if cfg.dropout > 0:
                x = nn.Dropout(cfg.dropout, deterministic=not self.has_rng("dropout"))(x)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="logits")(x)
        return jnp.swapaxes(logits, 0, 1), lengths


def _seq_shard(x: jax.Array, cfg: ModelConfig, mesh) -> jax.Array:
    """Sequence-parallel seam (cfg.sequence_shard): constrain the time
    axis onto the model mesh axis. GSPMD then runs everything
    elementwise-over-time (LayerNorm, residual adds, FFN pointwise)
    sequence-sharded and inserts the collective pair around each
    attention/GEMM that needs the full sequence."""
    if not cfg.sequence_shard or mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "model", None))
    )


def _sinusoidal_positions(T: int, D: int) -> jax.Array:
    """Standard fixed sin/cos position table [T, D] (static shapes —
    computed at trace time, folded into the compiled program)."""
    pos = jnp.arange(T)[:, None].astype(jnp.float32)
    div = jnp.exp(
        jnp.arange(0, D, 2).astype(jnp.float32) * (-jnp.log(10000.0) / D)
    )
    pe = jnp.zeros((T, D), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: D // 2]))
    return pe


class TransformerEncoder(nn.Module):
    """conv subsampling -> N pre-LN transformer blocks -> dense logits.

    Beyond the reference's model zoo (conv/GRU only — SURVEY.md §2.2):
    the attention encoder exercises the mesh's model-parallel seam
    (SURVEY.md §5 "if the wav2vec-U stretch adds transformers"): QKV /
    FFN weight matrices are column-sharded by the generic
    parallel.mesh.param_shardings rule, and attention is a batch of
    MXU GEMMs with a static [B, 1, 1, T] key padding mask — no dynamic
    shapes, XLA fuses softmax into the score GEMMs."""

    cfg: ModelConfig
    vocab_size: int
    mesh: object = None  # for the sequence_shard constraint only

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        dt = _dtype(cfg)
        x, lengths = _subsample_front(cfg, feats, lengths, dt)
        B, T2, _ = x.shape
        x = nn.Dense(cfg.hidden_size, dtype=dt, name="in_proj")(x)
        x = x + _sinusoidal_positions(T2, cfg.hidden_size).astype(dt)
        x = x * _length_mask(x, lengths)
        x = _seq_shard(x, cfg, self.mesh)
        key_mask = (jnp.arange(T2)[None, :] < lengths[:, None])
        attn_mask = key_mask[:, None, None, :]  # [B, 1, 1(q), T(k)]
        ffn = cfg.ffn_dim or 4 * cfg.hidden_size
        deterministic = not self.has_rng("dropout")
        attn_fn = nn.dot_product_attention
        if cfg.attn_pallas:
            # fused Pallas MHSA (ops/pallas_attention.py): scores stay
            # in VMEM; internally falls back to flax on CPU or when
            # attention dropout is active
            from uasr.ops.pallas_attention import fused_dot_product_attention
            attn_fn = fused_dot_product_attention
        for i in range(cfg.transformer_layers):
            h = nn.LayerNorm(dtype=dt, name=f"ln_a{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads,
                dtype=dt,
                dropout_rate=cfg.dropout,
                deterministic=deterministic,
                attention_fn=attn_fn,
                name=f"mha{i}",
            )(h, h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(dtype=dt, name=f"ln_f{i}")(x)
            h = nn.Dense(ffn, dtype=dt, name=f"ffn_in{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.hidden_size, dtype=dt, name=f"ffn_out{i}")(h)
            if cfg.dropout > 0:
                h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            x = x + h
            # bias/LN terms make padding rows nonzero; the attention
            # mask already guards keys, so this only keeps the padding
            # region of the output clean for downstream consumers
            x = x * _length_mask(x, lengths)
            x = _seq_shard(x, cfg, self.mesh)
        x = nn.LayerNorm(dtype=dt, name="ln_out")(x)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="logits")(x)
        logits = logits * _length_mask(logits, lengths)
        return logits, lengths


class ConformerConvModule(nn.Module):
    """Conformer convolution module: pointwise GLU -> masked depthwise
    conv -> LayerNorm (BatchNorm-free: no mutable state under jit, and
    LN is the standard TPU-friendly substitution) -> swish -> pointwise."""

    hidden: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array) -> jax.Array:
        x = nn.Dense(2 * self.hidden, dtype=self.dtype, name="pw_in")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        # zero padding frames so the depthwise window never reads them
        x = x * _length_mask(x, lengths)
        x = nn.Conv(
            self.hidden, (self.kernel,), feature_group_count=self.hidden,
            padding="SAME", dtype=self.dtype, name="depthwise",
        )(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.swish(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="pw_out")(x)


class ConformerEncoder(nn.Module):
    """conv subsampling -> N conformer blocks -> dense logits.

    Beyond the reference model zoo (conv/GRU only — SURVEY.md §2.2):
    the conv-augmented attention encoder (Gulati et al. 2020) with
    macaron half-FFNs, MHSA carrying a learned clipped relative-
    position bias (T5/Shaw-style [heads, 2R+1] table indexed by a
    static Toeplitz map — T is static under jit, so the bias build is
    trace-time gather + add, no dynamic shapes), and a masked depthwise
    conv module. Projections reuse flax MHA's DenseGeneral weights, so
    the generic model-axis TP sharding rule applies unchanged."""

    cfg: ModelConfig
    vocab_size: int
    mesh: object = None  # for the sequence_shard constraint only

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        dt = _dtype(cfg)
        x, lengths = _subsample_front(cfg, feats, lengths, dt)
        B, T, _ = x.shape
        x = nn.Dense(cfg.hidden_size, dtype=dt, name="in_proj")(x)
        x = x * _length_mask(x, lengths)
        x = _seq_shard(x, cfg, self.mesh)
        key_mask = (jnp.arange(T)[None, :] < lengths[:, None])
        attn_mask = key_mask[:, None, None, :]  # [B, 1, 1(q), T(k)]
        ffn = cfg.ffn_dim or 4 * cfg.hidden_size
        deterministic = not self.has_rng("dropout")
        R = cfg.conformer_rel_clip
        # static Toeplitz index of clipped relative distance (j - i)
        rel_idx = jnp.clip(
            jnp.arange(T)[None, :] - jnp.arange(T)[:, None], -R, R
        ) + R  # [T, T] in [0, 2R]
        for i in range(cfg.transformer_layers):
            # macaron half-FFN
            h = nn.LayerNorm(dtype=dt, name=f"ln_f1_{i}")(x)
            h = nn.Dense(ffn, dtype=dt, name=f"ffn1_in{i}")(h)
            h = nn.swish(h)
            h = nn.Dense(cfg.hidden_size, dtype=dt, name=f"ffn1_out{i}")(h)
            x = x + 0.5 * h
            # MHSA with relative-position bias
            table = self.param(
                f"rel_bias{i}", nn.initializers.zeros,
                (cfg.num_heads, 2 * R + 1), jnp.float32,
            )
            bias = table[:, rel_idx][None]  # [1, H, T, T]
            base_attn = nn.dot_product_attention
            if cfg.attn_pallas:
                # fused Pallas MHSA with the rel-pos bias added (and
                # its gradient accumulated) in-kernel
                from uasr.ops.pallas_attention import (
                    fused_dot_product_attention,
                )
                base_attn = fused_dot_product_attention
            h = nn.LayerNorm(dtype=dt, name=f"ln_a{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads,
                dtype=dt,
                dropout_rate=cfg.dropout,
                deterministic=deterministic,
                attention_fn=functools.partial(
                    base_attn, bias=bias.astype(dt)
                ),
                name=f"mha{i}",
            )(h, h, mask=attn_mask)
            x = x + h
            x = x * _length_mask(x, lengths)
            # conv module
            h = nn.LayerNorm(dtype=dt, name=f"ln_c{i}")(x)
            h = ConformerConvModule(
                hidden=cfg.hidden_size, kernel=cfg.conformer_kernel,
                dtype=dt, name=f"cfm_conv{i}",
            )(h, lengths)
            x = x + h
            # second half-FFN
            h = nn.LayerNorm(dtype=dt, name=f"ln_f2_{i}")(x)
            h = nn.Dense(ffn, dtype=dt, name=f"ffn2_in{i}")(h)
            h = nn.swish(h)
            h = nn.Dense(cfg.hidden_size, dtype=dt, name=f"ffn2_out{i}")(h)
            x = x + 0.5 * h
            x = nn.LayerNorm(dtype=dt, name=f"ln_post{i}")(x)
            x = x * _length_mask(x, lengths)
            x = _seq_shard(x, cfg, self.mesh)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="logits")(x)
        logits = logits * _length_mask(logits, lengths)
        return logits, lengths


class UniGRUEncoder(nn.Module):
    """Causal streaming CTC encoder (``model.encoder: uni_gru``):
    non-overlapping patch embed -> causal context conv1d -> N x
    unidirectional GRU -> dense logits.

    Every op is causal at patch granularity, so online serving carries
    only a small recurrent state — the conv tail (kernel-1 patch
    embeddings) and one hidden vector per GRU layer — and emits tokens
    with ZERO right-context latency, unlike the window-replay path the
    finite-RF encoders use (one-chunk latency). The offline ``__call__``
    IS one streaming ``step`` from the zero state, so chunked serving
    reproduces offline inference by construction (token parity tested
    in tests/test_serve.py). The reference had no streaming or serving
    at all (SURVEY.md §3.4: offline batch decode only); its closest
    model is the conv+BiGRU — this is the online-capable sibling, with
    the BiGRU flagship remaining the offline-accuracy model.
    """

    cfg: ModelConfig
    vocab_size: int

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        self.patch = cfg.conv_time_stride ** cfg.num_conv_layers
        self.kernel = cfg.conv_kernel
        self.embed = nn.Dense(cfg.hidden_size, dtype=dt, name="embed")
        self.embed_ln = nn.LayerNorm(dtype=dt, name="embed_ln")
        # causality via an explicit carried tail + VALID conv: offline
        # and streaming share the exact same op (the zero-init tail IS
        # the causal left pad)
        self.ctx = nn.Conv(cfg.hidden_size, (self.kernel,),
                           padding="VALID", dtype=dt, name="context")
        self.ctx_ln = nn.LayerNorm(dtype=dt, name="context_ln")
        self.grus = [
            GRULayer(cfg.hidden_size, dtype=dt, unroll=cfg.gru_unroll,
                     use_pallas=cfg.gru_pallas, name=f"gru{i}")
            for i in range(cfg.num_gru_layers)
        ]
        self.out = nn.Dense(self.vocab_size, dtype=jnp.float32,
                            name="logits")

    def _trunk(self, feats, frame_valid, carry):
        """Shared offline/streaming body. feats [B, C, D] with C a
        multiple of the patch size; frame_valid [B] = valid frames of
        this span per stream; carry None (offline: zero state, Pallas
        recurrence allowed) or (ctx_tail, h)."""
        cfg = self.cfg
        dt = _dtype(cfg)
        B, C, D = feats.shape
        P = self.patch
        x = feats.astype(dt)
        x = x * _length_mask(x, frame_valid)
        if C % P:  # offline callers may pass any T; chunks are aligned
            x = jnp.pad(x, ((0, 0), (0, P - C % P), (0, 0)))
        x = x.reshape(B, x.shape[1] // P, P * D)
        pvalid = (frame_valid + P - 1) // P
        e = nn.relu(self.embed_ln(self.embed(x)))
        tail = (
            jnp.zeros((B, self.kernel - 1, cfg.hidden_size), dt)
            if carry is None
            else carry[0].astype(dt)
        )
        cat = jnp.concatenate([tail, e], axis=1)
        y = nn.relu(self.ctx_ln(self.ctx(cat)))
        x = e + y  # residual context block (causal)
        new_tail = cat[:, cat.shape[1] - (self.kernel - 1):]
        hs = []
        for i, gru in enumerate(self.grus):
            if carry is None:
                x = gru(x, pvalid)
            else:
                x, h_i = gru(x, pvalid, h0=carry[1][i], return_final=True)
                hs.append(h_i)
        logits = self.out(x)
        logits = logits * _length_mask(logits, pvalid)
        new_carry = None if carry is None else (new_tail, jnp.stack(hs))
        return logits, pvalid, new_carry

    def __call__(self, feats: jax.Array, lengths: jax.Array):
        logits, plens, _ = self._trunk(feats, lengths, None)
        return logits, plens

    def step(self, feats: jax.Array, frame_valid: jax.Array, carry):
        """One streaming chunk: feats [B, C, D] (C % patch == 0),
        frame_valid [B] in [0, C], carry from initial_carry / a prior
        step. Returns (logits [B, C/patch, V], new_carry). Streams past
        their utterance end have frame_valid 0: the GRU state freezes
        and emitted logits rows are zeroed/masked by the caller."""
        logits, _, new_carry = self._trunk(feats, frame_valid, carry)
        return logits, new_carry


class LCBiGRUEncoder(nn.Module):
    """Latency-controlled BiGRU (``model.encoder: lc_bigru``): the
    exactly-streamable flagship-class encoder (round 5, VERDICT round-4
    missing #3 / next #6).

    Architecture: causal patch front (non-overlapping patch embed +
    carried-tail VALID context conv, as UniGRUEncoder) -> N layers of
    [forward GRU ‖ window-bounded backward GRU] -> dense logits. The
    forward direction scans the whole utterance (streaming carries its
    hidden state, like uni_gru). The backward direction is restricted
    AT TRAINING TIME to fixed windows: for the chunk starting at patch
    c*Nc, the backward GRU runs right-to-left over
    [c*Nc, c*Nc + Nc + Nr) from a zero state (LC-BLSTM; Nc =
    ``lc_chunk``, Nr = ``lc_lookahead`` in logits frames). Offline and
    streaming therefore compute the SAME function — no approximation,
    unlike the window-replay path the unbounded BiGRU needs.

    TPU-first bonus: the backward windows fold into the batch axis
    ([B*n_chunks, Nc+Nr] sequences), so the backward recurrence's
    sequential chain is Nc+Nr steps instead of T — shorter critical
    path than the full BiGRU's backward scan, with n_chunks x more MXU
    parallelism per step.

    Streaming (`step`): layer l emits chunk k-1-l when chunk k arrives
    (its lookahead needs the next chunk at its own rate), so the
    emitted logits lag input by num_gru_layers chunks; `finish` flushes
    the tail. Total algorithmic latency = num_gru_layers * lc_chunk
    logits frames.
    """

    cfg: ModelConfig
    vocab_size: int

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        if cfg.lc_lookahead > cfg.lc_chunk:
            raise ValueError(
                "lc_lookahead must be <= lc_chunk (each backward "
                "window's lookahead comes from the single next chunk): "
                f"got {cfg.lc_lookahead} > {cfg.lc_chunk}"
            )
        self.patch = cfg.conv_time_stride ** cfg.num_conv_layers
        self.kernel = cfg.conv_kernel
        self.embed = nn.Dense(cfg.hidden_size, dtype=dt, name="embed")
        self.embed_ln = nn.LayerNorm(dtype=dt, name="embed_ln")
        self.ctx = nn.Conv(cfg.hidden_size, (self.kernel,),
                           padding="VALID", dtype=dt, name="context")
        self.ctx_ln = nn.LayerNorm(dtype=dt, name="context_ln")
        self.fwd_grus = [
            GRULayer(cfg.hidden_size, dtype=dt, unroll=cfg.gru_unroll,
                     use_pallas=cfg.gru_pallas, name=f"fwd{i}")
            for i in range(cfg.num_gru_layers)
        ]
        self.bwd_grus = [
            GRULayer(cfg.hidden_size, reverse=True, dtype=dt,
                     unroll=cfg.gru_unroll, use_pallas=cfg.gru_pallas,
                     name=f"bwd{i}")
            for i in range(cfg.num_gru_layers)
        ]
        self.out = nn.Dense(self.vocab_size, dtype=jnp.float32,
                            name="logits")

    def _front(self, feats, frame_valid, tail):
        """Causal patch front shared by offline and streaming: patch
        embed + carried-tail VALID context conv. Returns
        (e [B, Tp, H], pvalid, new_tail)."""
        cfg = self.cfg
        dt = _dtype(cfg)
        B, C, D = feats.shape
        P = self.patch
        x = feats.astype(dt)
        x = x * _length_mask(x, frame_valid)
        if C % P:
            x = jnp.pad(x, ((0, 0), (0, P - C % P), (0, 0)))
        x = x.reshape(B, x.shape[1] // P, P * D)
        pvalid = (frame_valid + P - 1) // P
        e = nn.relu(self.embed_ln(self.embed(x)))
        cat = jnp.concatenate([tail.astype(dt), e], axis=1)
        y = nn.relu(self.ctx_ln(self.ctx(cat)))
        e = e + y  # residual causal context block
        new_tail = cat[:, cat.shape[1] - (self.kernel - 1):]
        return e, pvalid, new_tail

    def _lc_backward(self, gru, x, pvalid):
        """Window-bounded backward GRU: chunk windows [c*Nc, c*Nc+Nc+Nr)
        folded into the batch axis, zero initial state per window."""
        cfg = self.cfg
        B, T, D = x.shape
        Nc, Nr = cfg.lc_chunk, cfg.lc_lookahead
        n = -(-T // Nc)
        Tp = n * Nc
        W = Nc + Nr
        xp = jnp.pad(x, ((0, 0), (0, Tp + Nr - T), (0, 0)))
        idx = (jnp.arange(n) * Nc)[:, None] + jnp.arange(W)[None, :]
        xw = xp[:, idx]  # [B, n, W, D]
        xw = xw.reshape(B * n, W, D)
        lw = jnp.clip(
            pvalid[:, None] - (jnp.arange(n) * Nc)[None, :], 0, W
        ).reshape(B * n)
        yw = gru(xw, lw)  # [B*n, W, H]
        H = yw.shape[-1]
        y = yw[:, :Nc].reshape(B, Tp, H)[:, :T]
        return y

    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        B = feats.shape[0]
        tail = jnp.zeros(
            (B, self.kernel - 1, cfg.hidden_size), _dtype(cfg)
        )
        x, pvalid, _ = self._front(feats, lengths, tail)
        for i in range(cfg.num_gru_layers):
            f = self.fwd_grus[i](x, pvalid)
            b = self._lc_backward(self.bwd_grus[i], x, pvalid)
            x = jnp.concatenate([f, b], axis=-1)
        logits = self.out(x)
        logits = logits * _length_mask(logits, pvalid)
        return logits, pvalid

    def step(self, feats: jax.Array, abs_start: jax.Array,
             valid_frames: jax.Array, carry):
        """One streaming chunk of C = lc_chunk * patch feature frames.

        feats [B, C, D]; abs_start [B] absolute feature-frame index of
        this chunk's first frame (multiples of C per slot); valid_frames
        [B] the stream's total valid feature frames (huge = open-ended —
        re-read every step so late length stamps apply retroactively);
        carry from `lc_initial_carry`. Returns (logits [B, Nc, V] for
        the chunk num_gru_layers chunks BACK — all-masked until the
        pipeline fills — and the new carry)."""
        cfg = self.cfg
        Nc, Nr = cfg.lc_chunk, cfg.lc_lookahead
        P = self.patch
        C = Nc * P
        tail, bufs, hfs = carry
        k = abs_start // C  # [B] arriving chunk index per slot
        fv = jnp.clip(valid_frames - abs_start, 0, C)
        x_new, _, new_tail = self._front(feats, fv, tail)
        tvp = jnp.minimum(
            (valid_frames + P - 1) // P, jnp.int32(1 << 30)
        )  # total valid patches (cap keeps int32 arithmetic safe)
        new_bufs, new_hfs = [], []
        for i in range(cfg.num_gru_layers):
            kb = k - 1 - i  # buffered chunk index at this layer
            buf = bufs[i]
            win = jnp.concatenate([buf, x_new[:, :Nr]], axis=1)
            base = jnp.where(kb >= 0, kb * Nc, jnp.int32(1 << 30))
            lw = jnp.clip(tvp - base, 0, Nc + Nr)
            bwd = self.bwd_grus[i](win, lw)[:, :Nc]
            lf = jnp.clip(tvp - base, 0, Nc)
            fwd, h_end = self.fwd_grus[i](
                buf, lf, h0=hfs[i], return_final=True
            )
            new_bufs.append(x_new.astype(jnp.float32))
            new_hfs.append(h_end)
            x_new = jnp.concatenate([fwd, bwd], axis=-1)
        logits = self.out(x_new)
        ke = k - cfg.num_gru_layers  # emitted chunk index
        base_e = jnp.where(ke >= 0, ke * Nc, jnp.int32(1 << 30))
        ve = jnp.clip(tvp - base_e, 0, Nc)
        logits = logits * _length_mask(logits, ve)
        return logits, (new_tail, tuple(new_bufs), tuple(new_hfs))


def lc_initial_carry(cfg: ModelConfig, batch: int):
    """Zero streaming state for LCBiGRUEncoder.step: (ctx_tail
    [B, kernel-1, H], per-layer input-chunk buffers, per-layer forward
    hidden states). Layer 0's buffer holds front activations [B, Nc, H];
    layers >= 1 hold the previous layer's [B, Nc, 2H] outputs."""
    dt = _dtype(cfg)
    H, Nc, L = cfg.hidden_size, cfg.lc_chunk, cfg.num_gru_layers
    bufs = tuple(
        jnp.zeros((batch, Nc, H if i == 0 else 2 * H), jnp.float32)
        for i in range(L)
    )
    hfs = tuple(jnp.zeros((batch, H), dt) for _ in range(L))
    return (
        jnp.zeros((batch, cfg.conv_kernel - 1, H), dt),
        bufs,
        hfs,
    )


def uni_gru_initial_carry(cfg: ModelConfig, batch: int):
    """Zero streaming state for UniGRUEncoder.step:
    (ctx_tail [B, kernel-1, H], h [num_gru_layers, B, H]). The zero
    tail IS the causal left pad, so step-from-zero == offline call."""
    dt = _dtype(cfg)
    return (
        jnp.zeros((batch, cfg.conv_kernel - 1, cfg.hidden_size), dt),
        jnp.zeros((cfg.num_gru_layers, batch, cfg.hidden_size), dt),
    )


class CNNEncoder(nn.Module):
    """Pure-CNN CTC encoder: stacked 1-D convs over time (dilated stack
    for receptive field), one strided layer for subsampling. No
    recurrence -> everything is MXU GEMMs; the throughput champion."""

    cfg: ModelConfig
    vocab_size: int

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        dt = _dtype(cfg)
        dkw, ckw = _int8_kwargs(cfg)
        x = feats.astype(dt)
        x = x * _length_mask(x, lengths)
        stride_done = False
        for i in range(max(cfg.num_conv_layers, 1)):
            stride = cfg.conv_time_stride if not stride_done else 1
            stride_done = True
            x = nn.Conv(
                cfg.hidden_size,
                (cfg.conv_kernel,),
                strides=(stride,),
                padding="SAME",
                dtype=dt,
                name=f"conv{i}",
                **ckw,
            )(x)
            x = nn.LayerNorm(dtype=dt)(x)
            x = nn.relu(x)
            if stride > 1:
                lengths = jnp.minimum(
                    conv_out_length(lengths, stride, 1), x.shape[1]
                )
            x = x * _length_mask(x, lengths)  # keep padding frames zero
        for i in range(2):
            y = nn.Conv(
                cfg.hidden_size,
                (cfg.conv_kernel,),
                kernel_dilation=(2**(i + 1),),
                padding="SAME",
                dtype=dt,
                name=f"dil{i}",
                **ckw,
            )(x)
            y = nn.LayerNorm(dtype=dt)(y)
            x = x + nn.relu(y)  # residual dilated stack
            x = x * _length_mask(x, lengths)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          name="logits", **dkw)(x)
        logits = logits * _length_mask(logits, lengths)
        return logits, lengths


class PhoneClassifier(nn.Module):
    """Per-frame phone posterior model (GAN generator / EODM model).

    A conv layer provides +-context (reference spliced frames and used
    FC stacks / small convs), then an MLP head. Output: logits [B,T,V];
    use jax.nn.softmax for the differentiable posteriors D consumes.
    """

    cfg: ModelConfig
    vocab_size: int

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array):
        cfg = self.cfg
        dt = _dtype(cfg)
        dkw, ckw = _int8_kwargs(cfg)
        x = feats.astype(dt)
        x = x * _length_mask(x, lengths)
        x = nn.Conv(
            cfg.classifier_hidden,
            (2 * cfg.classifier_context + 1,),
            padding="SAME",
            dtype=dt,
            name="context_conv",
            **ckw,
        )(x)
        x = nn.LayerNorm(dtype=dt)(x)
        x = nn.relu(x)
        for i in range(cfg.classifier_layers - 1):
            x = nn.Dense(cfg.classifier_hidden, dtype=dt,
                         name=f"fc{i}", **dkw)(x)
            x = nn.LayerNorm(dtype=dt)(x)
            x = nn.relu(x)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          name="logits", **dkw)(x)
        logits = logits * _length_mask(logits, lengths)
        return logits, lengths


class PhoneDiscriminator(nn.Module):
    """WGAN-GP critic over phone-distribution sequences [B, T, V].

    Stacked strided 1-D convs + masked mean/max pooling + dense scalar.
    No normalization layers (the gradient penalty is defined on the
    un-normalized critic). Consumes *distributions* (softmax posteriors
    or one-hot text), keeping G differentiable (SURVEY.md §3.2).

    Always computes in float32 regardless of cfg.dtype: the WGAN-GP
    double-backward overflows bfloat16 within a couple of critic steps
    (measured on v5e: NaN at step 1 in bf16, stable in f32). The critic
    is a tiny fraction of step time, so this costs nothing.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, probs: jax.Array, lengths: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = jnp.float32
        x = probs.astype(dt)
        x = x * _length_mask(x, lengths)
        for i in range(cfg.disc_layers):
            x = nn.Conv(
                cfg.disc_channels,
                (cfg.disc_kernel,),
                strides=(2,),
                padding="SAME",
                dtype=dt,
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
            lengths = (lengths + 1) // 2
            lengths = jnp.minimum(lengths, x.shape[1])
            # re-mask: the conv bias makes frames past `lengths` nonzero,
            # and the next strided conv would mix them into valid frames
            x = x * _length_mask(x, lengths)
        mask = _length_mask(x, lengths)
        n = jnp.maximum(lengths, 1).astype(x.dtype)[:, None]
        mean_pool = x.sum(axis=1) / n
        max_pool = jnp.where(mask, x, -1e30).max(axis=1)
        h = jnp.concatenate([mean_pool, max_pool], axis=-1)
        h = nn.Dense(cfg.disc_channels, dtype=dt, name="fc")(h)
        h = nn.leaky_relu(h, 0.2)
        score = nn.Dense(1, dtype=jnp.float32, name="score")(h)
        return score[:, 0]


def encoder_time_subsample(cfg: ModelConfig) -> int:
    """Total time-axis subsampling factor of an encoder (logits frames
    per input feature frame) — used to downsample forced-alignment
    label tracks for frame-CE training (reference `ASR_align_DataSet`
    consumers, SURVEY.md §2.2)."""
    if cfg.encoder == "classifier":
        return 1
    if cfg.encoder == "cnn":
        return cfg.conv_time_stride  # single strided layer
    if cfg.encoder in ("conv_bigru", "lc_bigru", "transformer",
                       "conformer", "uni_gru"):
        return cfg.conv_time_stride ** cfg.num_conv_layers
    raise ValueError(f"unknown encoder {cfg.encoder!r}")


def build_model(cfg: ModelConfig, vocab_size: int, mesh=None) -> nn.Module:
    if cfg.sequence_shard and cfg.encoder not in ("transformer", "conformer"):
        raise ValueError(
            "model.sequence_shard applies to the attention encoders "
            f"(transformer/conformer), not {cfg.encoder!r}"
        )
    if cfg.encoder == "conv_bigru":
        return ConvBiGRUEncoder(cfg, vocab_size)
    if cfg.encoder == "lc_bigru":
        return LCBiGRUEncoder(cfg, vocab_size)
    if cfg.encoder == "uni_gru":
        return UniGRUEncoder(cfg, vocab_size)
    if cfg.encoder == "cnn":
        return CNNEncoder(cfg, vocab_size)
    if cfg.encoder == "classifier":
        return PhoneClassifier(cfg, vocab_size)
    if cfg.encoder == "transformer":
        return TransformerEncoder(cfg, vocab_size, mesh=mesh)
    if cfg.encoder == "conformer":
        return ConformerEncoder(cfg, vocab_size, mesh=mesh)
    raise ValueError(f"unknown encoder {cfg.encoder!r}")
