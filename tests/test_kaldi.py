"""Kaldi ark/scp table IO (uasr/data/kaldi.py).

The byte layout is pinned by hand-constructed golden blobs (no Kaldi
binary exists in this image) implementing the published serialization
(kaldi/src/matrix/kaldi-matrix.cc, compressed-matrix.cc): binary FM/DM,
compressed CM/CM2/CM3, text matrices, and token-less int32 vectors.
"""

import struct

import numpy as np
import pytest

from uasr.data import kaldi


def _fm_record(utt: str, mat: np.ndarray) -> bytes:
    """Independent (test-local) encoder for a binary FM ark record."""
    mat = np.asarray(mat, np.float32)
    return (
        utt.encode() + b" " + b"\x00BFM "
        + b"\x04" + struct.pack("<i", mat.shape[0])
        + b"\x04" + struct.pack("<i", mat.shape[1])
        + mat.tobytes()
    )


# ---------------------------------------------------------------------------
# golden byte layouts


def test_fm_golden_bytes(tmp_path):
    mat = np.arange(6, dtype=np.float32).reshape(2, 3)
    ark = tmp_path / "g.ark"
    ark.write_bytes(_fm_record("u1", mat) + _fm_record("u2", mat * 2))
    got = dict(kaldi.iter_feats_ark(str(ark)))
    assert set(got) == {"u1", "u2"}
    np.testing.assert_array_equal(got["u1"], mat)
    np.testing.assert_array_equal(got["u2"], mat * 2)


def test_dm_double_matrix(tmp_path):
    mat = np.linspace(-1, 1, 8).reshape(4, 2)
    rec = (
        b"utt \x00BDM "
        + b"\x04" + struct.pack("<i", 4)
        + b"\x04" + struct.pack("<i", 2)
        + mat.astype("<f8").tobytes()
    )
    ark = tmp_path / "d.ark"
    ark.write_bytes(rec)
    (utt, got), = list(kaldi.iter_feats_ark(str(ark)))
    assert utt == "utt" and got.dtype == np.float32
    np.testing.assert_allclose(got, mat, atol=1e-6)


def test_text_matrix(tmp_path):
    ark = tmp_path / "t.ark"
    ark.write_text("a  [\n  1 2 3\n  4 5 6 ]\nb  [\n  7 8 ]\n")
    got = dict(kaldi.iter_feats_ark(str(ark)))
    np.testing.assert_array_equal(got["a"], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(got["b"], [[7, 8]])


def test_int_vector_ali(tmp_path):
    ids = np.array([3, 1, 1, 2, 0, 5], "<i4")
    rec = b"spk1_utt0 \x00B\x04" + struct.pack("<i", ids.size) + ids.tobytes()
    ark = tmp_path / "ali.ark"
    ark.write_bytes(rec)
    (utt, got), = list(kaldi.iter_ali(str(ark)))
    assert utt == "spk1_utt0"
    np.testing.assert_array_equal(got, ids)


# ---------------------------------------------------------------------------
# compressed matrices


def _uint16_of(v, mn, rng):
    return np.clip((v - mn) / rng * 65535.0, 0, 65535).astype("<u2")


def test_cm1_decode(tmp_path):
    """Format 1: per-column percentile headers + uint8 column-major data.
    The expected values recompute Kaldi's CharToFloat piecewise map
    independently of the library code."""
    rng_ = np.random.RandomState(0)
    rows, cols = 7, 3
    mn, rg = -2.0, 4.0
    # strictly increasing per-column percentiles inside [mn, mn+rg]
    perc = np.sort(
        rng_.uniform(0, 65535, size=(cols, 4)).astype("<u2"), axis=1
    )
    perc += np.arange(4, dtype="<u2") * 3  # break ties
    data = rng_.randint(0, 256, size=(cols, rows)).astype(np.uint8)

    blob = (
        b"cm1utt \x00BCM "
        + struct.pack("<ff", mn, rg)
        + struct.pack("<ii", rows, cols)
        + perc.tobytes()
        + data.tobytes()
    )
    ark = tmp_path / "cm.ark"
    ark.write_bytes(blob)
    (_, got), = list(kaldi.iter_feats_ark(str(ark)))
    assert got.shape == (rows, cols)

    pf = mn + rg * perc.astype(np.float64) / 65535.0  # [cols, 4]
    expected = np.zeros((rows, cols))
    for c in range(cols):
        p0, p25, p75, p100 = pf[c]
        for r in range(rows):
            v = float(data[c, r])
            if v <= 64:
                e = p0 + (p25 - p0) * v / 64.0
            elif v <= 192:
                e = p25 + (p75 - p25) * (v - 64) / 128.0
            else:
                e = p75 + (p100 - p75) * (v - 192) / 63.0
            expected[r, c] = e
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("tok,dtype,denom", [("CM2", "<u2", 65535.0),
                                             ("CM3", np.uint8, 255.0)])
def test_cm23_decode(tmp_path, tok, dtype, denom):
    rows, cols, mn, rg = 5, 4, -1.5, 3.0
    rng_ = np.random.RandomState(1)
    q = rng_.randint(0, int(denom) + 1, size=(rows, cols)).astype(dtype)
    blob = (
        b"u " + b"\x00B" + tok.encode() + b" "
        + struct.pack("<ff", mn, rg)
        + struct.pack("<ii", rows, cols)
        + np.ascontiguousarray(q).tobytes()
    )
    ark = tmp_path / "cm23.ark"
    ark.write_bytes(blob)
    (_, got), = list(kaldi.iter_feats_ark(str(ark)))
    np.testing.assert_allclose(
        got, mn + rg * q.astype(np.float64) / denom, atol=1e-4
    )


# ---------------------------------------------------------------------------
# write path + scp


def test_write_roundtrip_scp_and_ark(tmp_path):
    utts = {
        "u_a": np.random.RandomState(2).randn(11, 5).astype(np.float32),
        "u_b": np.random.RandomState(3).randn(4, 5).astype(np.float32),
    }
    ark, scp = kaldi.write_feats_ark(str(tmp_path / "feats"), utts.items())
    via_scp = dict(kaldi.iter_feats_scp(scp))
    via_ark = dict(kaldi.iter_feats_ark(ark))
    for u, f in utts.items():
        np.testing.assert_array_equal(via_scp[u], f)
        np.testing.assert_array_equal(via_ark[u], f)


def test_scp_random_access_order(tmp_path):
    """scp offsets allow reading in any order — reverse the entries."""
    utts = [(f"u{i}", np.full((2 + i, 3), i, np.float32)) for i in range(4)]
    _, scp = kaldi.write_feats_ark(str(tmp_path / "f"), utts)
    lines = open(scp).read().splitlines()
    rev = tmp_path / "rev.scp"
    rev.write_text("\n".join(reversed(lines)) + "\n")
    got = list(kaldi.iter_feats_scp(str(rev)))
    assert [u for u, _ in got] == [f"u{i}" for i in reversed(range(4))]
    np.testing.assert_array_equal(got[0][1], utts[3][1])


def test_offsetless_scp_sequential_seek(tmp_path):
    utts = [("x1", np.ones((2, 2), np.float32)),
            ("x2", np.full((3, 2), 2.0, np.float32))]
    ark, _ = kaldi.write_feats_ark(str(tmp_path / "f"), utts)
    scp = tmp_path / "noout.scp"
    scp.write_text(f"x2 {ark}\nx1 {ark}\n")
    got = dict(kaldi.iter_feats_scp(str(scp)))
    np.testing.assert_array_equal(got["x2"], utts[1][1])
    np.testing.assert_array_equal(got["x1"], utts[0][1])


def test_ali_write_roundtrip(tmp_path):
    pairs = [("a", [1, 2, 2, 3]), ("b", [0, 0, 5])]
    ark, scp = kaldi.write_ali_ark(str(tmp_path / "ali"), pairs)
    got = dict(kaldi.iter_ali(ark))
    for u, ids in pairs:
        np.testing.assert_array_equal(got[u], ids)
    got_scp = dict(kaldi.iter_ali(scp))
    np.testing.assert_array_equal(got_scp["b"], [0, 0, 5])


# ---------------------------------------------------------------------------
# prepare-tool integration


def test_import_features_from_kaldi_scp(tmp_path):
    from uasr.data.cache import FeatureCache
    from uasr.tools.prepare import main

    feats = {
        "utt0": np.random.RandomState(4).randn(9, 6).astype(np.float32),
        "utt1": np.random.RandomState(5).randn(7, 6).astype(np.float32),
    }
    _, scp = kaldi.write_feats_ark(str(tmp_path / "feats"), feats.items())
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("aa\nbb\n")
    lst = tmp_path / "train.tsv"
    lst.write_text("utt0\t-\taa bb\nutt1\t-\tbb\n")
    out = tmp_path / "cache"
    main(["import-features", "--features", scp, "--list", str(lst),
          "--vocab", str(vocab), "--out", str(out)])
    cache = FeatureCache(str(out))
    got = {u: (f, ids) for u, f, ids in cache}
    np.testing.assert_allclose(got["utt0"][0], feats["utt0"], atol=1e-6)
    assert got["utt0"][1] == [1, 2]  # blank prepended at id 0
    assert got["utt1"][1] == [2]


def test_import_features_kaldi_missing_utt_fails(tmp_path):
    from uasr.tools.prepare import main

    _, scp = kaldi.write_feats_ark(
        str(tmp_path / "feats"),
        [("utt0", np.zeros((3, 2), np.float32))],
    )
    lst = tmp_path / "train.tsv"
    lst.write_text("utt0\t-\ta\nmissing\t-\tb\n")
    with pytest.raises(SystemExit, match="absent"):
        main(["import-features", "--features", scp, "--list", str(lst),
              "--out", str(tmp_path / "cache")])


def test_import_ali_merges_fourth_column(tmp_path):
    from uasr.data.io import read_utterance_list
    from uasr.tools.prepare import main

    # kaldi phone ids 10/11 map to symbols via phones.txt
    ark, _ = kaldi.write_ali_ark(
        str(tmp_path / "ali"),
        [("utt0", [10, 10, 11]), ("utt1", [11, 10])],
    )
    (tmp_path / "phones.txt").write_text("aa 10\nbb 11\n")
    (tmp_path / "vocab.txt").write_text("aa\nbb\n")
    lst = tmp_path / "train.tsv"
    lst.write_text("utt0\twav0\taa bb\nutt1\twav1\tbb aa\n")
    out = tmp_path / "aligned.tsv"
    main(["import-ali", "--ali", ark, "--list", str(lst),
          "--vocab", str(tmp_path / "vocab.txt"),
          "--phone-map", str(tmp_path / "phones.txt"), "--out", str(out)])
    utts = read_utterance_list(str(out))
    assert utts[0].align_tokens == ["aa", "aa", "bb"]
    assert utts[1].align_tokens == ["bb", "aa"]


def test_export_kaldi_roundtrip(tmp_path):
    from uasr.data.cache import write_cache
    from uasr.tools.prepare import main

    ex = [("u0", np.random.RandomState(6).randn(5, 4).astype(np.float32),
           [1, 2]),
          ("u1", np.random.RandomState(7).randn(3, 4).astype(np.float32),
           [2])]
    cache_dir = tmp_path / "cache"
    write_cache(str(cache_dir), iter(ex))
    out = tmp_path / "export" / "feats"
    main(["export-kaldi", "--feature-cache", str(cache_dir),
          "--out", str(out)])
    got = dict(kaldi.iter_feats_scp(str(out) + ".scp"))
    for u, f, _ in ex:
        np.testing.assert_allclose(got[u], f, atol=1e-6)
