"""Multi-seed unsupervised training sweep with label-free selection.

Adversarial phone mapping is BASIN-SENSITIVE: identical features and
hyperparameters land at very different PERs depending on the training
seed (measured in this repo: seeds {0..3} on the same SSL features
reached held-out PER {0.55, 0.31, 0.26, 0.51} — BASELINE.md round-3
session 8). The standard protocol (wav2vec-U, and the GAN lineage the
reference implements — SURVEY.md §3.2) is therefore: train several
seeds, select the winner WITHOUT labels. This tool runs that protocol
end to end:

    uasr-sweep -c recipe.yaml --seeds 4 [--set k=v ...]

Each seed trains into ``<model_dir>/seed<N>`` (resumable per seed —
finished seeds are skipped on rerun via their final checkpoint). The
recipe must set ``gan.select_lm_path`` (built by ``prepare lm`` /
``prepare import-arpa`` from unpaired text) and a dev split: each run's
UnsupSelector then maintains ``seed<N>/best_ckpt`` + ``score.json``
(mean LM token log-prob − usage-KL of dev transcriptions, computed with
zero transcripts). The sweep reads those scores, writes
``<model_dir>/sweep.json``, and prints the winner; decode it with

    uasr-cli -c recipe.yaml --mode infer \
        --set model_dir=<winner> --set train.restore_best=true
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser("uasr-sweep", description=__doc__)
    p.add_argument("-c", "--config", required=True, help="YAML recipe "
                   "(train.mode gan or gan+eodm, gan.select_lm_path set)")
    p.add_argument("--seeds", type=int, default=3,
                   help="number of seeds (train.seed = 0..N-1)")
    p.add_argument("--set", action="append", default=[],
                   help="config override, e.g. --set train.total_steps=2000")
    args = p.parse_args(argv)

    from uasr.cli import _load_source, _train_gan, apply_overrides
    from uasr.config import load_config

    cfg = load_config(args.config)
    apply_overrides(cfg, args.set)
    if cfg.train.mode not in ("gan", "gan+eodm"):
        raise SystemExit(
            f"uasr-sweep is the unsupervised multi-seed protocol "
            f"(train.mode gan/gan+eodm), got {cfg.train.mode!r}"
        )
    if not cfg.gan.select_lm_path:
        raise SystemExit(
            "uasr-sweep selects WITHOUT labels via gan.select_lm_path — "
            "build one with `uasr-prepare lm` (or import-arpa) from the "
            "unpaired text and set it in the recipe"
        )
    source, vocab = _load_source(cfg, "train")
    if cfg.vocab_size is None:
        cfg = cfg.replace(vocab_size=len(vocab))
    print(f"devices: {__import__('jax').devices()}", file=sys.stderr)

    root = cfg.model_dir
    results = []
    for seed in range(args.seeds):
        seed_dir = os.path.join(root, f"seed{seed}")
        cfg_s = dataclasses.replace(
            cfg,
            model_dir=seed_dir,
            train=dataclasses.replace(cfg.train, seed=seed),
        )
        score_path = os.path.join(seed_dir, "best_ckpt", "score.json")
        print(f"[sweep] seed {seed} -> {seed_dir}", file=sys.stderr)
        # run_gan_training restores-latest, so finished seeds fall
        # through their train loop immediately (cheap rerun/resume)
        _train_gan(cfg_s, source, vocab,
                   with_eodm="+eodm" in cfg.train.mode)
        if not os.path.exists(score_path):
            raise SystemExit(
                f"seed {seed} finished without {score_path} — did the "
                "run ever reach train.eval_every with a dev split?"
            )
        with open(score_path) as f:
            rec = json.load(f)
        results.append({"seed": seed, "model_dir": seed_dir,
                        "score": rec["score"], "step": rec["step"]})
        print(f"[sweep] seed {seed}: unsup_score {rec['score']:.4f} "
              f"at step {rec['step']}", file=sys.stderr)

    results.sort(key=lambda r: r["score"], reverse=True)
    out = {"winner": results[0], "ranking": results,
           "selection": "label-free (mean LM token log-prob - usage-KL)"}
    sweep_path = os.path.join(root, "sweep.json")
    os.makedirs(root, exist_ok=True)
    with open(sweep_path, "w") as f:
        json.dump(out, f, indent=1)
    w = results[0]
    print(f"[sweep] winner: seed {w['seed']} "
          f"(score {w['score']:.4f}, step {w['step']}) — decode with "
          f"--set model_dir={w['model_dir']} "
          f"--set train.restore_best=true", file=sys.stderr)
    print(json.dumps(out["winner"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
