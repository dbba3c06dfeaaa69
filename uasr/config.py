"""Typed configuration tree, YAML-loadable.

Replaces the reference's global AttrDict ``args`` singleton
(SURVEY.md L1: ``utils/arguments.py`` loads YAML into a module-level
``args`` that every module imports). Here configs are explicit, typed
dataclasses plumbed through call signatures — no globals — but the YAML
field names stay close to the reference recipes so they port by renaming
paths only (BASELINE.json: "recipes run with a one-line backend switch").

Derived quantities the reference computed at load time (``dim_input`` =
feat dim x splice window, ``dim_output`` = vocab size incl. blank) are
computed by properties here.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any

import yaml


def _build(cls, data: dict[str, Any]):
    """Recursively construct a dataclass from a plain dict, erroring on
    unknown keys so recipe typos fail loudly."""
    if data is None:
        data = {}
    import typing

    hints = typing.get_type_hints(cls)  # resolves string annotations
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for name in fields:
        if name not in data:
            continue
        val = data[name]
        ftype = hints.get(name)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[name] = _build(ftype, val)
        else:
            kwargs[name] = val
    return cls(**kwargs)


@dataclass
class FrontendConfig:
    """Acoustic frontend parameters.

    Defaults follow the python_speech_features / Kaldi-compatible
    conventions the reference's feature prep used (SURVEY.md §2.2
    "Acoustic frontend": pre-emphasis 0.97, 25 ms / 10 ms framing,
    Hamming window, mel filterbank, log, optional DCT->MFCC,
    delta + delta-delta, CMVN, then splice + downsample x3).
    """

    sample_rate: int = 16000
    feature_type: str = "fbank"  # fbank | mfcc
    preemph: float = 0.97
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    window: str = "hamming"  # hamming | hann | povey | rect
    n_fft: int = 512
    num_mel_bins: int = 80
    low_freq: float = 0.0
    high_freq: float | None = None  # None -> sample_rate / 2
    num_ceps: int = 13  # MFCC only
    cep_lifter: float = 22.0  # MFCC only
    use_energy: bool = False  # MFCC: replace c0 with log energy
    add_deltas: bool = False  # append delta + delta-delta
    delta_window: int = 2
    cmvn: str = "utterance"  # none | utterance | global | streaming
    cmvn_stats_path: str | None = None  # for cmvn == "global"
    splice_left: int = 0  # frames of left context to splice
    splice_right: int = 0
    downsample: int = 1  # keep every k-th frame after splicing
    # SpecAugment (training-time only)
    specaug_freq_mask: int = 0  # F: max width of each freq mask
    specaug_freq_masks: int = 0
    specaug_time_mask: int = 0  # T: max width of each time mask
    specaug_time_masks: int = 0
    # implementation selection
    use_pallas: bool = True  # fused Pallas kernel on TPU, jnp elsewhere
    # GEMM precision of the DFT/mel matmuls: "highest" reproduces the
    # float64 oracle to 1e-4 (6-pass f32 emulation on the MXU);
    # "bfloat16" runs native single-pass MXU (~4x faster frontend,
    # features shift ~1e-2 after CMVN — below SpecAugment noise)
    precision: str = "highest"  # highest | high | bfloat16
    # streaming (AISHELL streaming-CMVN config)
    streaming_chunk_frames: int = 0  # >0 -> chunked streaming frontend

    @property
    def frame_length(self) -> int:
        return int(round(self.sample_rate * self.frame_length_ms / 1000.0))

    @property
    def frame_shift(self) -> int:
        return int(round(self.sample_rate * self.frame_shift_ms / 1000.0))

    @property
    def base_dim(self) -> int:
        d = self.num_ceps if self.feature_type == "mfcc" else self.num_mel_bins
        if self.add_deltas:
            d *= 3
        return d

    @property
    def dim_input(self) -> int:
        """Model input dim after splicing (reference: `dim_input`)."""
        return self.base_dim * (self.splice_left + 1 + self.splice_right)


@dataclass
class ModelConfig:
    """Encoder / classifier / discriminator hyperparameters.

    Mirrors the reference model zoo (SURVEY.md §2.2): conv front-end +
    BiGRU CTC encoder, pure-CNN encoder variant, small PhoneClassifier
    generator, and a conv PhoneDiscriminator critic.
    """

    # conv_bigru | lc_bigru | uni_gru | cnn | classifier | transformer
    # | conformer
    # (uni_gru = causal patch embed + context conv + unidirectional GRU
    # stack: the online-streamable sibling of conv_bigru — serving
    # carries its recurrent state across chunks with zero right-context
    # latency, uasr/serve.py. lc_bigru = latency-controlled BiGRU:
    # forward GRU carried exactly, backward GRU restricted to
    # chunk+lookahead windows AT TRAINING TIME, so offline and
    # streaming decodes coincide by construction — the round-5 exactly-
    # streamable flagship-class encoder.)
    encoder: str = "conv_bigru"
    # lc_bigru window geometry, in LOGITS frames (post conv stride):
    # chunk size and right-context lookahead per backward window.
    # Streaming latency = num_gru_layers chunks; exact-parity serving
    # requires chunk_frames == lc_chunk * stride and
    # lc_lookahead <= lc_chunk.
    lc_chunk: int = 16
    lc_lookahead: int = 8
    hidden_size: int = 256
    num_gru_layers: int = 2
    gru_unroll: int = 4  # lax.scan unroll of the recurrent body
    gru_remat: bool = False  # recompute GRU gates in backward (saves HBM)
    gru_pallas: bool = False  # whole GRU recurrence as one Pallas kernel
    # fused Pallas MHSA for the attention encoders (scores stay in
    # VMEM; falls back to flax on CPU / with attention dropout)
    attn_pallas: bool = False
    conv_channels: int = 64
    num_conv_layers: int = 2
    conv_kernel: int = 3
    conv_time_stride: int = 2  # per conv layer; total downsample = stride**layers
    # Subsampling front-end flavor for conv_bigru/transformer:
    #   conv2d — strided 3x3 Conv2D blocks over (time, freq), the
    #            reference-parity architecture (SURVEY.md §2.2).
    #   patch  — TPU-first redesign: non-overlapping frame patches ->
    #            one GEMM embed + a k=3 context conv1d, all at
    #            MXU-aligned widths. The conv2d path keeps a 32-wide
    #            channel minor dim that pads to the 128-lane tile (4x
    #            wasted HBM traffic); measured fwd+bwd 3.9 ms vs ~1
    #            ms for the same receptive field as GEMMs (round-3
    #            backward decomposition, B=128 x 8 s).
    conv_front: str = "conv2d"  # conv2d | patch
    dropout: float = 0.0
    # Transformer encoder (encoder: transformer) — beyond the reference
    # model zoo; exercises the mesh's model/sequence seam (SURVEY.md §5)
    transformer_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 0  # 0 -> 4 * hidden_size
    # Conformer encoder (encoder: conformer) — shares the transformer
    # depth/heads/ffn fields; adds the conv-module kernel and the
    # relative-position bias clip radius
    conformer_kernel: int = 15
    conformer_rel_clip: int = 64
    # Sequence parallelism for the attention encoders (SURVEY.md §5
    # "sequence sharding can ride the same mesh axis"): between blocks,
    # activations' TIME axis is sharding-constrained over the model
    # mesh axis, so LayerNorm/FFN elementwise work runs sequence-
    # sharded and GSPMD inserts the all-gather/reduce-scatter pair
    # around each attention/GEMM (Megatron-SP). No-op on a model=1 mesh.
    sequence_shard: bool = False
    # PhoneClassifier (GAN generator / EODM model)
    classifier_hidden: int = 512
    classifier_layers: int = 2
    classifier_context: int = 4  # conv receptive-field half-width
    # PhoneDiscriminator (WGAN-GP critic)
    disc_channels: int = 256
    disc_layers: int = 3
    disc_kernel: int = 5
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # serving: run Dense/Conv GEMMs on the int8 MXU (394 TF/s on v5e,
    # 2x bf16) — dynamic per-token activation quantization + symmetric
    # per-channel weights, int32 accumulation, f32 rescale epilogue
    # (ops/quantize.py::int8_dot_general). cnn / classifier families;
    # exported via `uasr-export --quantize int8-compute`.
    int8_compute: bool = False


@dataclass
class CTCConfig:
    blank_id: int = 0
    beam_width: int = 8
    use_beam: bool = False
    use_pallas: bool = False  # Pallas forward-backward kernels (TPU)
    # shallow-fusion phoneme LM for beam decoding (uasr/ops/lm.py;
    # built by `prepare lm` from the unpaired text corpus)
    lm_path: str | None = None
    lm_weight: float = 0.5
    lm_bonus: float = 0.0  # per-token bonus countering LM length penalty
    # HMM Viterbi decode: CTC-topology HMM (phone + blank-hold states)
    # with bigram-LM transitions (uasr/ops/viterbi.py — the GAN→HMM
    # refinement lineage's decoder). Needs a bigram lm_path; takes
    # precedence over use_beam at infer time.
    use_viterbi: bool = False
    viterbi_self_loop: float = 0.75  # P(hold the current HMM state)
    viterbi_blank_prob: float = 0.1  # P(phone state -> its blank hold)
    # calibrate the two rates above from a greedy pass over a few probe
    # batches (ops/viterbi.py::resolve_viterbi_rates). Essential for
    # SEGMENT-level streams (gan.merge_repeats generators): their dwell
    # is ~1 step/token and the frame-rate defaults above delete tokens
    # (the round-3 self-training regression). Calibration only applies
    # when the two rates above are at their defaults — explicitly tuned
    # values are never silently replaced (ADVICE round 4).
    viterbi_auto_rates: bool = True
    # score `--mode infer` in the folded TIMIT 61->39 phone space too
    # (reference folds before PER, SURVEY.md §3.4); reports per_folded
    # alongside the raw PER. Vocab tokens must be TIMIT phone names.
    fold_timit: bool = False


@dataclass
class GANConfig:
    """WGAN-GP adversarial objective (SURVEY.md §3.2)."""

    # wgan-gp = reference's Wasserstein critic; bce = wav2vec-U's
    # non-saturating GAN objective (bounded — no critic runaway)
    objective: str = "wgan-gp"  # wgan-gp | bce
    lambda_gp: float = 10.0
    disc_steps: int = 3  # D updates per G update
    g_lr: float = 1e-4
    d_lr: float = 4e-4
    # smooth the real one-hot text toward uniform (wav2vec-U trick):
    # without it the critic separates real/fake by peakedness alone and
    # the Wasserstein estimate runs away
    real_label_smooth: float = 0.0
    adam_b1: float = 0.5  # low momentum for both GAN opts (WGAN-GP paper)
    # apply train.lr_schedule's SHAPE (warmup/decay) to g_lr/d_lr: GAN
    # phone discovery finds the right permutation early and then drifts
    # off it if the lr stays high (measured on the synthetic Markov
    # corpus: dev PER 0.30 at step 600 -> 0.64 at 1500 without decay)
    use_lr_schedule: bool = False
    # push G's posteriors toward one-hot (removes the peakedness tell;
    # wav2vec-U's entropy penalty)
    entropy_weight: float = 0.0
    # maximize entropy of the batch-mean posterior (wav2vec-U's phoneme
    # diversity loss; prevents collapse to a constant output)
    diversity_weight: float = 0.0
    # penalize ||p_t - p_{t+1}||^2 on the PRE-merge frame posteriors
    # (wav2vec-U's smoothness penalty): without it the generator
    # flickers between phones, over-segments the merged stream, and
    # distribution matching drives PER up instead of down
    smoothness_weight: float = 0.0
    # label-free checkpoint selection (train.UnsupSelector): LM score +
    # usage-KL of dev transcriptions; best kept in model_dir/best_ckpt
    select_lm_path: str | None = None  # lm.npz from `prepare lm`
    select_kl_weight: float = 1.0
    # weight of the bigram coverage KL (text joint || hyp usage — the
    # EODM matching direction): rejects permuted-but-consistent phone
    # mappings that the two-term score barely separates (round-4);
    # bigram selection tables only
    select_coverage_weight: float = 1.0
    d_weight_decay: float = 0.0  # bounds critic scale growth
    supervised_weight: float = 0.0  # semi-supervised CTC mix-in
    # wav2vec-U-style segmental preprocessing (uasr/ops/segment.py)
    segmenter: str = "none"  # none | kmeans
    kmeans_clusters: int = 64
    centroids_path: str | None = None  # npz with 'centroids' [K, D]
    max_segments: int = 0  # 0 -> frame count (no cap)
    segment_mode_radius: int = 0  # >0: majority-vote de-flicker window
    # merge consecutive same-argmax generator outputs before D / EODM
    # (wav2vec-U: over-segmented outputs would otherwise contain repeat
    # bigrams that real text never has, making the match impossible)
    merge_repeats: bool = False
    # quantize on the raw (pre-CMVN) feature view; per-utterance CMVN
    # amplifies silent bins to unit variance and drowns k-means distances
    segment_on_raw: bool = False


@dataclass
class EODMConfig:
    """Empirical output-distribution matching (SURVEY.md §3.3)."""

    ngram_orders: tuple = (2, 3)
    top_k: int = 1000  # top-K n-grams per order
    weight: float = 1.0
    ngram_path: str | None = None  # precomputed table; else built from text
    # chunk the top-K axis inside the loss: peak memory is B*Tp*k_chunk
    # instead of B*Tp*K (the stretch recipe's K=4000 would need ~3.3 GB
    # per order unchunked at B=256, T~800)
    k_chunk: int = 1024


@dataclass
class SSLConfig:
    """Self-supervised (CPC / wav2vec-style contrastive) pretraining.

    Beyond the reference (which consumed externally-produced SSL
    features for its wav2vec-U-style stretch, BASELINE config #5): this
    makes the framework self-contained — raw audio -> contrastive
    pretraining (`train.mode: ssl`) -> feature dump
    (`uasr.tools.featurize`) -> unsupervised GAN/EODM training from the
    feature cache. Defaults give 16 kHz -> 100 Hz latents (10 ms hop,
    matching the fbank frontend's frame rate).
    """

    # what the encoder consumes: "waveform" = wav2vec-style strided
    # convs over raw samples; "fbank" = the fused Pallas log-mel
    # frontend's 100 Hz features (cfg.frontend) with light frame-rate
    # convs on top — ~20x cheaper per audio-second on TPU (the
    # waveform-rate conv stack dominates the step; BASELINE.md round 3)
    input_type: str = "waveform"  # waveform | fbank
    # waveform front: "conv" = wav2vec-style overlapping strided conv
    # as layer 0; "patch" = non-overlapping patch_size-sample GEMM
    # embed to conv_channels[0], then the conv stack at patch rate.
    # The patch front removes the enormous stride-5 first intermediate
    # ([B, L/5, C] — 840 MB at bench shapes) that made the step
    # bandwidth-bound (round-4 SSL attribution, BASELINE.md): same
    # trick as the CTC flagship's model.conv_front=patch.
    front: str = "conv"  # conv | patch
    patch_size: int = 20  # samples per patch (front=patch)
    # rematerialize the conv encoder in the backward pass (trade
    # recompute for stored-activation bandwidth — the SSL step is
    # bandwidth-bound; measure per shape)
    remat_encoder: bool = False
    conv_channels: tuple = (256, 256, 256, 256, 512)
    conv_kernels: tuple = (10, 8, 4, 4, 2)
    conv_strides: tuple = (5, 4, 2, 2, 2)  # product = total downsample
    # frame-rate conv stack for input_type=fbank (strides usually 1)
    fbank_conv_channels: tuple = (512, 512)
    fbank_conv_kernels: tuple = (3, 3)
    fbank_conv_strides: tuple = (1, 1)
    context_hidden: int = 512  # causal GRU context network
    context_pallas: bool = False  # context GRU as one Pallas kernel (TPU)
    predict_steps: int = 8  # InfoNCE horizon K (predict z_{t+1..t+K})
    temperature: float = 0.1  # cosine-similarity softmax temperature
    # in-utterance negatives per (t, k): 0 = exact softmax over every
    # valid position (tests / short utterances; the [B,T,K,T] score
    # tensor is quadratic in T), >0 = N sampled positions (production)
    num_negatives: int = 100
    # what uasr.tools.featurize dumps: the causal context vectors or the
    # raw conv latents (wav2vec-U used intermediate representations)
    feature_layer: str = "context"  # context | latents
    # fold the K prediction heads INTO a time-chunked InfoNCE loss
    # (ops/infonce.py::info_nce_loss_fused): the [B, T, K, C]
    # prediction tensor — 420 MB bf16 at bench shapes, the round-4
    # bandwidth bottleneck — never exists in HBM; each lax.scan chunk
    # computes its preds from c in VMEM-resident GEMMs and is
    # rematerialized in the backward. Sampled negatives only.
    fused_loss: bool = False
    loss_chunk: int = 128  # time frames per fused-loss chunk


@dataclass
class DataConfig:
    train_list: str | None = None  # csv/scp of (utt_id, wav_path, transcript)
    dev_list: str | None = None
    test_list: str | None = None
    # precomputed-feature sources (wav2vec-U stretch: external SSL
    # features imported with `prepare import-features`); when set for a
    # split, batches carry [B, T, D] features and the frontend is
    # bypassed (uasr/data/cache.py)
    feature_cache: str | None = None
    dev_feature_cache: str | None = None
    test_feature_cache: str | None = None
    # semi-supervised CTC mix-in (gan.supervised_weight > 0): a SMALL
    # paired split feeding the supervised term, so the main train split
    # stays genuinely unlabeled (the reference mixes a tiny labeled set
    # into the GAN generator loss — SURVEY.md §3.2). Synthetic recipes
    # take the first synthetic_labeled_utts train utterances instead.
    labeled_list: str | None = None
    labeled_feature_cache: str | None = None
    synthetic_labeled_utts: int = 16
    max_frames: int = 1024  # frame cap for precomputed-feature batches
    text_path: str | None = None  # unpaired phone text (GAN / EODM)
    vocab_path: str | None = None
    batch_size: int = 16
    max_audio_seconds: float = 16.0
    max_label_len: int = 256
    bucket_boundaries: tuple = ()  # seconds; empty -> single bucket
    shuffle_buffer: int = 4096  # window shuffle size of the streaming loader
    streaming: bool = True  # stream + decode wavs per batch (flat RSS);
    # False materializes the decoded corpus in RAM (small sets only)
    loader_threads: int = 0  # native decoder threads; 0 = hardware default
    # feature-cache training: keep the whole padded corpus resident on
    # the accelerator and gather batches on device (one upload total,
    # ~128 B of indices per step) instead of shipping each padded batch
    # through the host->device link (~32 MB/s through the axon tunnel =
    # ~2 s/step at V=39 shapes — BASELINE.md round 5). Auto-disabled on
    # CPU/multi-device runtimes.
    device_cache: bool = True
    synthetic: bool = False  # generate synthetic data (tests / benches)
    synthetic_num_utts: int = 128
    # dev/test split size; None = synthetic_num_utts (TIMIT-scale runs
    # want a large train corpus but a modest held-out split)
    synthetic_dev_utts: int | None = None
    # tone = one pure tone per phone (easy); formant = narrowband-noise
    # formants + speaker/channel variation (the hard stand-in corpus)
    synthetic_style: str = "tone"
    # iid = Zipf unigrams; markov = fixed sparse phonotactics — REQUIRED
    # for unsupervised identifiability (see dataset.synthetic_phonotactics)
    synthetic_syntax: str = "iid"
    synthetic_min_len: int = 3
    synthetic_max_len: int = 10
    num_epochs: int | None = None  # None = cycle until train.total_steps


@dataclass
class TrainConfig:
    # ctc | gan | eodm | gan+eodm | ssl | frame_ce (alignment-supervised
    # per-frame CE, the reference's ASR_align_DataSet pathway)
    mode: str = "ctc"
    total_steps: int = 1000
    lr: float = 1e-3
    warmup_steps: int = 100
    lr_schedule: str = "warmup_exp_decay"  # constant | warmup_exp_decay | warmup_rsqrt
    decay_rate: float = 0.96
    decay_steps: int = 1000
    grad_clip: float = 5.0
    # accumulate k micro-batch gradients into one optimizer update
    # (effective batch = k x data.batch_size); exact for mean-reduced
    # losses over equal micro-batches
    grad_accum: int = 1
    eval_every: int = 200
    save_every: int = 500
    log_every: int = 50
    keep_checkpoints: int = 5  # reference: CheckpointManager(max_to_keep)
    seed: int = 0
    dev_eval_batches: int = 50  # cap on periodic dev-eval batches
    # size the dev split's batching caps (max_frames/max_audio_seconds/
    # max_label_len, bucket boundaries) to the split's real maxima so
    # dev eval NEVER truncates: a training-window cap like
    # data.max_frames=24 otherwise clips the utterances being dev-
    # scored — inflating PER with pure deletion errors, corrupting
    # keep_best, and (round-4 TPU pipeline run) making the label-free
    # selector pick a 0.17-PER basin over a 0.06 one. False restores
    # the old truncated-eval behavior.
    dev_full_length: bool = True
    tensorboard: bool = False  # also export scalars via tf.summary
    # supervised loops (ctc / frame_ce): keep the best-dev-PER
    # checkpoint under model_dir/best_ckpt (reference semantics: infer
    # restores latest or best — SURVEY.md §5 "Checkpoint / resume")
    keep_best: bool = False
    # infer restores model_dir/best_ckpt (written by the unsupervised
    # LM selector, gan.select_lm_path) instead of the latest checkpoint
    restore_best: bool = False
    # infer/export average the float leaves of the newest N retained
    # checkpoints (classic ASR checkpoint averaging; 1 = plain latest).
    # Bounded by keep_checkpoints — only retained steps can be averaged
    average_checkpoints: int = 1


@dataclass
class ParallelConfig:
    """Mesh axes. Reference had no distribution (SURVEY.md §2.3);
    here DP over ICI is first-class and a model axis seam is kept for
    the wav2vec-U stretch config."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1  # size of the model axis


@dataclass
class Config:
    name: str = "default"
    model_dir: str = "exp/default"
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    ctc: CTCConfig = field(default_factory=CTCConfig)
    gan: GANConfig = field(default_factory=GANConfig)
    eodm: EODMConfig = field(default_factory=EODMConfig)
    ssl: SSLConfig = field(default_factory=SSLConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    vocab_size: int | None = None  # derived from vocab file if None

    @property
    def dim_output(self) -> int:
        """Vocab size including blank (reference: `dim_output`)."""
        if self.vocab_size is None:
            raise ValueError("vocab_size not set; load a vocab first")
        return self.vocab_size

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(path: str) -> Config:
    """Load a YAML recipe into a typed Config tree."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _build(Config, raw)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
