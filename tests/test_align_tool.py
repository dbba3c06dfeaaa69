"""Forced-alignment tool: CTC teacher -> per-frame labels -> frame-CE
student, with no external aligner (reference consumed Kaldi alignments;
SURVEY.md §2.2 `ASR_align_DataSet`)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(mod, args, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["UASR_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_align_tool_roundtrip_and_frame_ce(tmp_path):
    data = str(tmp_path / "data")
    r = _run("uasr.tools.prepare",
             ["synth", "--out-dir", data, "--num-utts", "24",
              "--num-phones", "8"])
    assert r.returncode == 0, r.stderr[-2000:]

    model_dir = str(tmp_path / "exp")
    overrides = [
        "--set", f"model_dir={model_dir}",
        "--set", "data.synthetic=false",
        "--set", "data.streaming=false",
        "--set", f"data.train_list={os.path.join(data, 'train.tsv')}",
        "--set", f"data.dev_list={os.path.join(data, 'dev.tsv')}",
        "--set", f"data.vocab_path={os.path.join(data, 'vocab.txt')}",
        "--set", "data.batch_size=8",
        "--set", "data.max_audio_seconds=2.0",
        "--set", "data.max_label_len=16",
    ]
    r = _run("uasr.cli",
             ["-c", "configs/synthetic_smoke.yaml", "--mode", "train",
              *overrides,
              "--set", "train.total_steps=30",
              "--set", "train.save_every=30",
              "--set", "train.eval_every=1000"])
    assert r.returncode == 0, r.stderr[-3000:]

    aligned = str(tmp_path / "train_aligned.tsv")
    r = _run("uasr.tools.align",
             ["-c", "configs/synthetic_smoke.yaml", "--split", "train",
              "--out", aligned, *overrides])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mean path logp/frame" in r.stderr

    # ---- the forced-alignment invariant: collapsing the frame track
    # (at the logits rate) reproduces the transcript EXACTLY, for every
    # utterance, regardless of model quality
    from uasr.config import load_config
    from uasr.data.dataset import ASRAlignDataset
    from uasr.models.models import encoder_time_subsample
    from uasr.vocab import load_vocab

    cfg = load_config(os.path.join(REPO, "configs", "synthetic_smoke.yaml"))
    total = cfg.frontend.downsample * encoder_time_subsample(cfg.model)
    vocab = load_vocab(os.path.join(data, "vocab.txt"))
    ds = ASRAlignDataset.from_file(aligned, vocab, 16000)
    assert len(ds) == 21  # 24 utts - 3 dev
    blank = 0
    for i in range(len(ds)):
        _audio, ids, frame_ids = ds.example_with_alignment(i)
        logit_rate = frame_ids[::total]
        collapsed = []
        prev = -1
        for t in logit_rate:
            if t != prev and t != blank:
                collapsed.append(t)
            prev = t
        assert collapsed == ids, (i, collapsed, ids)
        # track upsampled by exactly `total`
        assert len(frame_ids) % total == 0

    # ---- a frame-CE student trains from the written list
    student_dir = str(tmp_path / "student")
    r = _run("uasr.cli",
             ["-c", "configs/synthetic_smoke.yaml", "--mode", "train",
              *overrides,
              "--set", f"model_dir={student_dir}",
              "--set", f"data.train_list={aligned}",
              "--set", f"data.dev_list={aligned}",
              "--set", "train.mode=frame_ce",
              "--set", "train.total_steps=8",
              "--set", "train.save_every=8",
              "--set", "train.eval_every=1000",
              "--set", "train.log_every=4"])
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(student_dir, "metrics.jsonl")) as f:
        recs = [json.loads(ln) for ln in f]
    accs = [rec["frame_acc"] for rec in recs
            if rec["tag"] == "train" and "frame_acc" in rec]
    assert accs and all(0.0 <= a <= 1.0 for a in accs), recs
