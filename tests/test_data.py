"""Data layer: bucketing, padding, text batching, prefetch, CMVN stats,
list/wav IO round trips."""

import itertools

import numpy as np

from uasr.config import FrontendConfig
from uasr.data.dataset import (
    batch_iterator,
    compute_cmvn_stats,
    make_synthetic_dataset,
    prefetch,
    text_batch_iterator,
)
from uasr.data.io import read_utterance_list, read_wav, write_wav
from uasr.frontend import oracle


def test_bucketing_static_shapes():
    examples, _ = make_synthetic_dataset(num_utts=64, num_phones=6,
                                         min_len=2, max_len=12, seed=2)
    boundaries = (8000, 16000, 32000)
    shapes = set()
    for b in itertools.islice(
        batch_iterator(examples, 4, 32000, 16,
                       bucket_boundaries=boundaries), 20
    ):
        shapes.add(b.audio.shape)
        assert b.audio.shape[1] in boundaries
        # every utterance fits its bucket
        assert (b.audio_lengths <= b.audio.shape[1]).all()
        # padding is zero
        for i in range(4):
            assert np.all(b.audio[i, b.audio_lengths[i]:] == 0)
    assert len(shapes) > 1  # multiple buckets actually used


def test_label_clipping_and_padding():
    examples, _ = make_synthetic_dataset(num_utts=8, num_phones=6,
                                         min_len=9, max_len=10, seed=3)
    b = next(iter(batch_iterator(examples, 8, 40000, max_label_len=4)))
    assert b.labels.shape[1] == 4
    assert (b.label_lengths <= 4).all()


def test_text_batch_iterator():
    seqs = [[1, 2, 3], [4, 5], [6]] * 4
    batches = list(itertools.islice(
        text_batch_iterator(seqs, batch_size=4, max_len=5), 3))
    for tb in batches:
        assert tb.ids.shape == (4, 5)
        for i in range(4):
            assert np.all(tb.ids[i, tb.lengths[i]:] == 0)


def test_prefetch_preserves_order_and_count():
    it = prefetch(iter(range(17)), depth=3)
    assert list(it) == list(range(17))


def test_cmvn_stats_match_oracle():
    cfg = FrontendConfig(num_mel_bins=24, cmvn="none")
    examples, _ = make_synthetic_dataset(num_utts=4, num_phones=5, seed=4)
    mean, std = compute_cmvn_stats(examples, cfg)
    feats = np.concatenate(
        [oracle.oracle_fbank(a, cfg) for a, _ in examples], axis=0
    )
    np.testing.assert_allclose(mean, feats.mean(0), rtol=1e-4)
    np.testing.assert_allclose(std, feats.std(0), rtol=1e-3)


def test_wav_and_list_io(tmp_path):
    sig = (np.random.RandomState(0).rand(3000).astype(np.float32) - 0.5)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, 16000)
    audio, sr = read_wav(p)
    assert sr == 16000 and len(audio) == 3000
    np.testing.assert_allclose(audio, sig, atol=1.5 / 32768)

    lst = tmp_path / "list.tsv"
    lst.write_text(f"utt1\t{p}\tp1 p2 p3\nutt2\t{p}\n")
    utts = read_utterance_list(str(lst))
    assert utts[0].tokens == ["p1", "p2", "p3"]
    assert utts[1].tokens == []


def test_aligned_dataset_and_batching(tmp_path):
    from uasr.data.dataset import ASRAlignDataset, aligned_batch_iterator
    from uasr.vocab import make_vocab

    sig = (np.random.RandomState(1).rand(2000).astype(np.float32) - 0.5)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, 16000)
    lst = tmp_path / "list.tsv"
    lst.write_text(
        f"u1\t{p}\tp1 p2\tp1 p1 p1 p2 p2\n"
        f"u2\t{p}\tp2\tp2 p2\n"
    )
    vocab = make_vocab(["p1", "p2"])
    ds = ASRAlignDataset.from_file(str(lst), vocab)
    audio, ids, align = ds.example_with_alignment(0)
    assert len(align) == 5 and align[0] == ids[0]

    exs = [ds.example_with_alignment(i) for i in range(2)]
    b = next(iter(aligned_batch_iterator(exs, 2, 4000, 4, max_frames=8)))
    assert b.frame_labels.shape == (2, 8)
    # padding frames are -1
    row = b.frame_labels[list(b.label_lengths).index(1)]
    assert (row[2:] == -1).all()


def test_prefetch_propagates_worker_errors():
    def gen():
        yield 1
        raise ValueError("bad wav")

    it = prefetch(gen())
    assert next(it) == 1
    try:
        next(it)
    except ValueError as e:
        assert "bad wav" in str(e)
    else:
        raise AssertionError("worker exception was swallowed")


def test_global_cmvn_wiring(tmp_path):
    """prepare-cmvn artifact -> frontend_state_from_config -> cmvn='global'
    features are normalized by the dataset stats (VERDICT round-1 item 2)."""
    import jax.numpy as jnp

    from uasr.frontend.features import (
        compute_features,
        frontend_state_from_config,
    )

    examples, _ = make_synthetic_dataset(num_utts=6, num_phones=4, seed=5)
    cfg = FrontendConfig(num_mel_bins=20, cmvn="global")
    mean, std = compute_cmvn_stats(examples, cfg)
    path = str(tmp_path / "cmvn.npz")
    np.savez(path, mean=mean, std=std)

    # missing path fails loudly
    try:
        frontend_state_from_config(cfg)
    except ValueError as e:
        assert "cmvn_stats_path" in str(e)
    else:
        raise AssertionError("missing stats path did not raise")

    cfg2 = FrontendConfig(
        num_mel_bins=20, cmvn="global", cmvn_stats_path=path
    )
    state = frontend_state_from_config(cfg2)
    audio = examples[0][0][None, :]
    lengths = np.array([audio.shape[1]], np.int32)
    feats, flen = compute_features(
        jnp.asarray(audio), jnp.asarray(lengths), state, cfg2
    )
    # un-normalizing with the same stats reproduces the raw oracle fbank
    raw = oracle.oracle_fbank(examples[0][0], cfg2)
    T = int(flen[0])
    undone = np.asarray(feats[0, :T]) * (std + 1e-8) + mean
    np.testing.assert_allclose(undone, raw[:T], atol=2e-3)


def test_aligned_iterator_keeps_remainder_for_eval():
    """drop_remainder=False yields the final partial batch — frame_ce
    dev/test evaluation must score every utterance (with the default
    drop it could evaluate NOTHING when dev < batch_size and log a
    perfect 0.0 PER)."""
    from uasr.data.dataset import aligned_batch_iterator, make_synthetic_dataset

    examples, _ = make_synthetic_dataset(
        num_utts=5, num_phones=4, with_alignments=True, seed=0
    )
    full = list(aligned_batch_iterator(
        examples, 8, 4000, 8, max_frames=16, num_epochs=1,
        drop_remainder=False,
    ))
    assert len(full) == 1 and full[0].audio.shape[0] == 5
    dropped = list(aligned_batch_iterator(
        examples, 8, 4000, 8, max_frames=16, num_epochs=1,
    ))
    assert dropped == []
    # mixed: full batches plus the remainder
    both = list(aligned_batch_iterator(
        examples, 2, 4000, 8, max_frames=16, num_epochs=1,
        drop_remainder=False,
    ))
    assert [b.audio.shape[0] for b in both] == [2, 2, 1]


def test_formant_synthesis_contract():
    """The hard stand-in corpus (round-4): formant-style synthesis must
    (a) be spectrally phone-separable, (b) carry NO deterministic phase
    (narrowband noise, unlike the tone corpus), (c) vary per utterance
    (speaker factor), (d) keep the alignment contract."""
    import numpy as np

    from uasr.data.dataset import make_synthetic_dataset, synth_formant_audio

    P = 6
    rng = np.random.RandomState(0)
    # (a) the same phone twice vs two different phones: average
    # log-spectra of same-phone segments must be closer
    def spec(audio):
        n = (len(audio) // 400) * 400
        frames = audio[:n].reshape(-1, 400) * np.hanning(400)
        return np.log(np.abs(np.fft.rfft(frames, axis=1)).mean(0) + 1e-6)

    draws = 6
    specs = np.stack([
        np.stack([
            spec(synth_formant_audio(
                [p] * 6, P, rng=np.random.RandomState(100 * p + d)))
            for d in range(draws)
        ]) for p in range(1, P + 1)
    ])  # [P, draws, F]
    centers = specs.mean(1)
    within = np.mean([
        np.abs(specs[p] - centers[p]).mean() for p in range(P)
    ])
    between = np.mean([
        np.abs(centers[p] - centers[q]).mean()
        for p in range(P) for q in range(P) if p != q
    ])
    # speaker/channel variation is REAL (that is the point of the hard
    # corpus) but phone identity must still dominate on average
    assert between > 1.5 * within, (within, between)

    # (b) no deterministic phase: two draws of the same phone string
    # must be UNCORRELATED sample-by-sample (tones were identical up to
    # a phase offset)
    a1 = synth_formant_audio([1] * 6, P, rng=np.random.RandomState(1))
    a1b = synth_formant_audio([1] * 6, P, rng=np.random.RandomState(2))
    n = min(len(a1), len(a1b))
    corr = np.corrcoef(a1[:n], a1b[:n])[0, 1]
    assert abs(corr) < 0.2, corr

    # (c) per-utterance speaker variation is present
    assert within > 0.01

    # (d) alignment contract matches the tone synth's
    audio, align = synth_formant_audio(
        [1, 3, 2], P, rng=np.random.RandomState(4), return_align=True
    )
    T = max(1 + (len(audio) - 400) // 160, 1)
    assert len(align) == T
    assert set(align) <= {1, 2, 3}
    assert align[0] == 1 and align[-1] == 2

    # dataset plumbing: style flows through make_synthetic_dataset
    exs, vocab = make_synthetic_dataset(
        num_utts=4, num_phones=P, seed=0, syntax="markov", style="formant"
    )
    assert len(exs) == 4 and all(len(a) > 1000 for a, _ in exs)
