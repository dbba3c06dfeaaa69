"""Native host runtime (C++ via ctypes): builds, matches the Python/JAX
references, and survives error paths."""

import numpy as np
import pytest

from uasr import native
from uasr.data.io import write_wav


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_edit_distance_matches_python(lib):
    rng = np.random.RandomState(0)
    B, N, M = 16, 20, 24
    refs = rng.randint(1, 7, size=(B, N)).astype(np.int32)
    hyps = rng.randint(1, 7, size=(B, M)).astype(np.int32)
    ref_lens = rng.randint(0, N + 1, size=B).astype(np.int32)
    hyp_lens = rng.randint(0, M + 1, size=B).astype(np.int32)
    got = native.batch_edit_distance_native(refs, ref_lens, hyps, hyp_lens)
    for b in range(B):
        ref = native._py_lev(
            refs[b, : ref_lens[b]].tolist(), hyps[b, : hyp_lens[b]].tolist()
        )
        assert got[b] == ref


def test_wav_roundtrip(lib, tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    sigs = []
    for i in range(4):
        n = rng.randint(1000, 5000)
        sig = (rng.rand(n).astype(np.float32) - 0.5) * 0.8
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, sig, 16000)
        paths.append(p)
        sigs.append(sig)
    audio, lengths, rates = native.batch_read_wavs_native(paths, 6000)
    for i, sig in enumerate(sigs):
        assert lengths[i] == len(sig)
        assert rates[i] == 16000
        # 0.5 LSB quantization + the 32767-write/32768-read scale skew
        np.testing.assert_allclose(
            audio[i, : len(sig)], sig, atol=1.5 / 32768
        )
        assert np.all(audio[i, len(sig):] == 0)


def test_wav_error_path(lib, tmp_path):
    bad = str(tmp_path / "nope.wav")
    audio, lengths, rates = native.batch_read_wavs_native([bad], 1000)
    assert lengths[0] == -1


def test_wav_truncation(lib, tmp_path):
    sig = np.ones(5000, np.float32) * 0.5
    p = str(tmp_path / "long.wav")
    write_wav(p, sig, 16000)
    audio, lengths, _ = native.batch_read_wavs_native([p], 1000)
    assert lengths[0] == 1000
