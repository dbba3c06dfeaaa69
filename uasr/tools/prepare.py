"""Data preparation CLI (reference: prep scripts + `get_dataset_ngram`,
SURVEY.md §3.5):

  python -m uasr.tools.prepare vocab   --text phones.txt --out vocab.txt
  python -m uasr.tools.prepare lists   --wav-scp wav.scp --text text --out train.tsv
  python -m uasr.tools.prepare cmvn    --list train.tsv --vocab vocab.txt \
                                       --config recipe.yaml --out cmvn.npz
  python -m uasr.tools.prepare ngrams  --text phones.txt --vocab vocab.txt \
                                       --orders 2,3 --top-k 1000 --out ngrams.npz
  python -m uasr.tools.prepare lm      --text phones.txt --vocab vocab.txt \
                                       --out lm.npz   # shallow-fusion bigram
  python -m uasr.tools.prepare synth   --out-dir data/synth --num-utts 128
  python -m uasr.tools.prepare import-features --features w2v/ \
                                       --list train.tsv --vocab vocab.txt \
                                       --out cache/   # SSL feature cache
  python -m uasr.tools.prepare scan-lengths --list train.tsv  # .lens cache

`lists` joins Kaldi-style wav.scp (utt_id wav_path) and text
(utt_id tokens...) into the TSV utterance lists the datasets read.
`synth` materializes the synthetic tone-language corpus to disk (wavs +
lists + vocab) so every recipe can be smoke-run with real file IO.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def cmd_vocab(args):
    from uasr.vocab import BLK, UNK

    counts: dict[str, int] = {}
    with open(args.text) as f:
        for ln in f:
            toks = ln.split()
            if args.has_utt_ids:
                toks = toks[1:]
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
    tokens = [BLK] + sorted(counts, key=lambda t: (-counts[t], t)) + [UNK]
    with open(args.out, "w") as f:
        f.write("\n".join(tokens) + "\n")
    print(f"wrote {len(tokens)} tokens -> {args.out}")


def cmd_lists(args):
    wavs: dict[str, str] = {}
    with open(args.wav_scp) as f:
        for ln in f:
            parts = ln.split(maxsplit=1)
            if len(parts) == 2:
                wavs[parts[0]] = parts[1].strip()
    texts: dict[str, str] = {}
    if args.text:
        with open(args.text) as f:
            for ln in f:
                parts = ln.split(maxsplit=1)
                texts[parts[0]] = parts[1].strip() if len(parts) == 2 else ""
    n = 0
    with open(args.out, "w") as f:
        for utt, wav in sorted(wavs.items()):
            f.write(f"{utt}\t{wav}\t{texts.get(utt, '')}\n")
            n += 1
    print(f"wrote {n} utterances -> {args.out}")
    if not args.no_lens:
        from uasr.data.loader import write_length_sidecar

        side = write_length_sidecar(args.out)
        print(f"wrote length cache -> {side}")


def cmd_scan_lengths(args):
    """Build the `<list>.lens` length cache for an existing utterance
    list: one header scan now, zero file opens at every later training
    startup (streaming loader)."""
    from uasr.data.loader import write_length_sidecar

    side = write_length_sidecar(args.list, scan_threads=args.threads)
    print(f"wrote length cache -> {side}")


def cmd_cmvn(args):
    from uasr.config import load_config
    from uasr.data.dataset import ASRDataset, compute_cmvn_stats
    from uasr.vocab import load_vocab

    cfg = load_config(args.config)
    vocab = load_vocab(args.vocab)
    ds = ASRDataset.from_file(args.list, vocab, cfg.frontend.sample_rate)
    examples = [ds.example(i) for i in range(len(ds))]
    mean, std = compute_cmvn_stats(examples, cfg.frontend)
    np.savez(args.out, mean=mean, std=std)
    print(f"wrote CMVN stats ({mean.shape[0]} dims) -> {args.out}")


def cmd_ngrams(args):
    from uasr.data.dataset import TextDataset
    from uasr.ops.eodm import build_ngram_table
    from uasr.vocab import load_vocab

    vocab = load_vocab(args.vocab)
    seqs = TextDataset.from_file(args.text, vocab).sequences
    payload = {}
    for order in (int(o) for o in args.orders.split(",")):
        tab = build_ngram_table(seqs, order, args.top_k)
        payload[f"ids_{order}"] = tab.ids
        payload[f"probs_{order}"] = tab.probs
        print(f"order {order}: kept {len(tab.ids)} n-grams")
    np.savez(args.out, **payload)
    print(f"wrote n-gram tables -> {args.out}")


def cmd_lm(args):
    """Shallow-fusion n-gram LM (order 2 or 3) from the unpaired text
    corpus (`ctc.lm_path` + `ctc.use_beam` consume it at decode time;
    `gan.select_lm_path` for unsupervised model selection)."""
    from uasr.data.dataset import TextDataset
    from uasr.ops.lm import (
        build_bigram_lm, build_trigram_lm, build_unigram, save_lm,
    )
    from uasr.vocab import BLK, load_vocab

    vocab = load_vocab(args.vocab)
    seqs = TextDataset.from_file(args.text, vocab).sequences
    blank = vocab.tokens.index(BLK) if BLK in vocab.tokens else 0
    build = {2: build_bigram_lm, 3: build_trigram_lm}[args.order]
    logp = build(seqs, len(vocab), add_k=args.add_k, exclude=(blank,))
    uni = build_unigram(seqs, len(vocab), add_k=args.add_k, exclude=(blank,))
    save_lm(args.out, logp, unigram=uni)
    print(f"wrote {args.order}-gram LM {list(logp.shape)} + unigram "
          f"-> {args.out}")


def cmd_import_arpa(args):
    """ARPA-format n-gram LM (KenLM/SRILM — what the wav2vec-U lineage
    ships) -> the dense decode-table npz `ctc.lm_path` /
    `gan.select_lm_path` consume. The Katz backoff chain is evaluated
    into every (history, token) cell at import time; row V = '<s>'."""
    from uasr.ops.lm import load_arpa, save_lm
    from uasr.vocab import BLK, load_vocab

    vocab = load_vocab(args.vocab)
    blank = vocab.tokens.index(BLK) if BLK in vocab.tokens else 0
    logp, uni = load_arpa(
        args.arpa, vocab.tokens, order=args.order, exclude=(blank,)
    )
    save_lm(args.out, logp, unigram=uni)
    print(f"imported ARPA {args.arpa} -> {list(logp.shape)} decode "
          f"table + unigram -> {args.out}")


def cmd_kmeans(args):
    """Fit segmenter centroids in the SAME feature space the trainer
    quantizes in (the runtime chain via compute_features; raw pre-CMVN
    view when gan.segment_on_raw) — fitting on a different view than the
    quantizer sees silently breaks segmentation."""
    import dataclasses

    import jax.numpy as jnp

    from uasr.config import load_config
    from uasr.data.dataset import ASRDataset
    from uasr.frontend.features import compute_features, frontend_state_from_config
    from uasr.ops.segment import kmeans_fit
    from uasr.vocab import load_vocab

    cfg = load_config(args.config)
    # --clusters overrides the recipe's gan.kmeans_clusters
    clusters = args.clusters or cfg.gan.kmeans_clusters
    if args.feature_cache:
        # SSL-feature recipes: fit in the cache's feature space — the
        # exact arrays the trainer quantizes (`data.feature_cache`)
        from uasr.data.cache import FeatureCache

        cache = FeatureCache(args.feature_cache)
        frames = [cache.example(i)[1]
                  for i in range(min(len(cache), args.max_utts))]
        feats = np.concatenate(frames, axis=0).astype(np.float32)
        cents = kmeans_fit(feats, clusters, iters=args.iters, seed=args.seed)
        np.savez(args.out, centroids=cents)
        print(f"fit {clusters} centroids on {len(feats)} cached frames "
              f"-> {args.out}")
        return
    if not args.list or not args.vocab:
        raise SystemExit("kmeans needs --list and --vocab "
                         "(or --feature-cache)")
    vocab = load_vocab(args.vocab)
    ds = ASRDataset.from_file(args.list, vocab, cfg.frontend.sample_rate)
    fcfg = cfg.frontend
    if cfg.gan.segment_on_raw:
        fcfg = dataclasses.replace(fcfg, cmvn="none")
    if args.cmvn_stats:  # point at a freshly-written `prepare cmvn` artifact
        fcfg = dataclasses.replace(fcfg, cmvn_stats_path=args.cmvn_stats)
    fe = frontend_state_from_config(fcfg)
    frames = []
    for i in range(min(len(ds), args.max_utts)):
        audio, _ = ds.example(i)
        f, fl = compute_features(
            jnp.asarray(audio[None, :]),
            jnp.asarray([len(audio)]),
            fe, fcfg,
        )
        frames.append(np.asarray(f[0, : int(fl[0])]))
    feats = np.concatenate(frames, axis=0).astype(np.float32)
    cents = kmeans_fit(feats, clusters, iters=args.iters, seed=args.seed)
    np.savez(args.out, centroids=cents)
    print(f"fit {clusters} centroids on {len(feats)} frames -> {args.out}")


def cmd_import_features(args):
    """Import externally-computed features (SSL/wav2vec representations
    — wav2vec-U's actual input, BASELINE config #5) into the uasr
    feature cache consumed by `data.feature_cache`. Accepts a directory
    of per-utterance `<utt_id>.npy` [T, D] arrays, one `.npz` keyed by
    utterance id, or a Kaldi table (`feats.scp` / `.ark`, incl.
    compressed matrices); labels (for scoring only) come from the TSV
    list's transcript column."""
    from uasr.data.cache import write_cache
    from uasr.vocab import load_vocab

    vocab = load_vocab(args.vocab) if args.vocab else None
    utts: list[tuple[str, str]] = []
    with open(args.list) as f:
        for ln in f:
            parts = ln.rstrip("\n").split("\t")
            if parts and parts[0]:
                utts.append((parts[0], parts[2] if len(parts) > 2 else ""))

    if args.features.endswith((".scp", ".ark")):
        from uasr.data import kaldi

        text = dict(utts)
        it = (kaldi.iter_feats_scp(args.features)
              if args.features.endswith(".scp")
              else kaldi.iter_feats_ark(args.features))

        def gen_kaldi():
            seen = set()
            for utt, feat in it:
                if utt not in text:
                    continue  # table may cover more splits than the list
                seen.add(utt)
                ids = (vocab.encode(text[utt].split())
                       if (vocab and text[utt]) else [])
                yield utt, feat, ids
            missing = [u for u, _ in utts if u not in seen]
            if missing:
                raise SystemExit(
                    f"{len(missing)} list utterances absent from "
                    f"{args.features} (first: {missing[0]!r})"
                )

        write_cache(args.out, gen_kaldi(), shard_size=args.shard_size)
        print(f"imported kaldi features for {len(utts)} utterances "
              f"-> {args.out}")
        return

    npz = np.load(args.features) if os.path.isfile(args.features) else None

    def gen():
        for utt, text in utts:
            if npz is not None:
                if utt not in npz.files:
                    raise SystemExit(
                        f"--features npz has no array for utterance {utt!r}"
                    )
                feat = npz[utt]
            else:
                path = os.path.join(args.features, f"{utt}.npy")
                if not os.path.exists(path):
                    raise SystemExit(f"missing feature file {path}")
                feat = np.load(path)
            if feat.ndim != 2:
                raise SystemExit(
                    f"features for {utt!r} must be [T, D], got {feat.shape}"
                )
            ids = vocab.encode(text.split()) if (vocab and text) else []
            yield utt, feat, ids

    write_cache(args.out, gen(), shard_size=args.shard_size)
    print(f"imported features for {len(utts)} utterances -> {args.out}")


def cmd_export_kaldi(args):
    """Export a uasr feature cache as a Kaldi feats table (binary FM
    ark + scp) so features computed here (SSL latents, fused-frontend
    fbank) can feed an existing Kaldi pipeline."""
    from uasr.data.cache import FeatureCache
    from uasr.data.kaldi import write_feats_ark

    cache = FeatureCache(args.feature_cache)
    ark, scp = write_feats_ark(
        args.out, ((utt, feat) for utt, feat, _ in cache)
    )
    print(f"wrote {len(cache)} utterances -> {ark} / {scp}")


def cmd_import_ali(args):
    """Merge Kaldi per-frame alignments (`ali-to-phones --per-frame`
    output, ark or scp) into a uasr list as the 4th column consumed by
    `train.mode: frame_ce` (reference `ASR_align_DataSet` pathway).

    Frame ids map to vocab symbols via --phone-map (Kaldi phones.txt,
    '<symbol> <id>' lines); without it, ids index the --vocab table
    directly."""
    from uasr.data.kaldi import iter_ali
    from uasr.vocab import load_vocab

    vocab = load_vocab(args.vocab)
    id2sym: dict[int, str]
    if args.phone_map:
        id2sym = {}
        with open(args.phone_map) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    id2sym[int(parts[1])] = parts[0]
    else:
        id2sym = dict(enumerate(vocab.tokens))

    ali = {}
    for utt, ids in iter_ali(args.ali):
        try:
            ali[utt] = " ".join(id2sym[int(i)] for i in ids)
        except KeyError as e:
            raise SystemExit(
                f"{utt}: alignment id {e.args[0]} has no symbol "
                "(wrong --phone-map? alignments must be per-frame "
                "phone ids, not transition-ids)"
            )

    out_lines = []
    with open(args.list) as f:
        for ln in f:
            parts = ln.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            utt = parts[0]
            if utt not in ali:
                raise SystemExit(f"no alignment for list utterance {utt!r}")
            out_lines.append("\t".join(parts[:3]) + "\t" + ali[utt])
    with open(args.out, "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"wrote {len(out_lines)} aligned utterances -> {args.out}")


def cmd_synth(args):
    from uasr.data.dataset import make_synthetic_dataset
    from uasr.data.io import write_wav

    examples, vocab = make_synthetic_dataset(
        num_utts=args.num_utts, num_phones=args.num_phones, seed=args.seed,
        with_alignments=args.align, syntax=args.syntax, style=args.style,
        min_len=args.min_len, max_len=args.max_len,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    wav_dir = os.path.join(args.out_dir, "wav")
    lines = []
    for i, ex in enumerate(examples):
        audio, ids = ex[0], ex[1]
        path = os.path.join(wav_dir, f"utt{i:05d}.wav")
        write_wav(path, audio, 16000)
        toks = " ".join(vocab.tokens[j] for j in ids)
        line = f"utt{i:05d}\t{path}\t{toks}"
        if args.align:  # 4th column: per-10ms-frame phone labels
            line += "\t" + " ".join(vocab.tokens[j] for j in ex[2])
        lines.append(line)
    n_dev = max(args.num_utts // 8, 1)
    with open(os.path.join(args.out_dir, "train.tsv"), "w") as f:
        f.write("\n".join(lines[n_dev:]) + "\n")
    with open(os.path.join(args.out_dir, "dev.tsv"), "w") as f:
        f.write("\n".join(lines[:n_dev]) + "\n")
    from uasr.data.loader import write_length_sidecar

    for split in ("train.tsv", "dev.tsv"):
        write_length_sidecar(os.path.join(args.out_dir, split))
    with open(os.path.join(args.out_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab.tokens) + "\n")
    with open(os.path.join(args.out_dir, "text.txt"), "w") as f:
        f.write("\n".join(" ".join(vocab.tokens[j] for j in ex[1])
                          for ex in examples) + "\n")
    print(f"wrote {args.num_utts} wavs + lists + vocab -> {args.out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser("uasr.tools.prepare", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("vocab")
    v.add_argument("--text", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--has-utt-ids", action="store_true")
    v.set_defaults(fn=cmd_vocab)

    ls = sub.add_parser("lists")
    ls.add_argument("--wav-scp", required=True)
    ls.add_argument("--text")
    ls.add_argument("--out", required=True)
    ls.add_argument("--no-lens", action="store_true",
                    help="skip writing the <out>.lens length cache")
    ls.set_defaults(fn=cmd_lists)

    sl = sub.add_parser("scan-lengths")
    sl.add_argument("--list", required=True)
    sl.add_argument("--threads", type=int, default=16)
    sl.set_defaults(fn=cmd_scan_lengths)

    c = sub.add_parser("cmvn")
    c.add_argument("--list", required=True)
    c.add_argument("--vocab", required=True)
    c.add_argument("--config", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_cmvn)

    n = sub.add_parser("ngrams")
    n.add_argument("--text", required=True)
    n.add_argument("--vocab", required=True)
    n.add_argument("--orders", default="2,3")
    n.add_argument("--top-k", type=int, default=1000)
    n.add_argument("--out", required=True)
    n.set_defaults(fn=cmd_ngrams)

    lm = sub.add_parser("lm")
    lm.add_argument("--text", required=True)
    lm.add_argument("--vocab", required=True)
    lm.add_argument("--order", type=int, default=2, choices=[2, 3])
    lm.add_argument("--add-k", type=float, default=0.5)
    lm.add_argument("--out", required=True)
    lm.set_defaults(fn=cmd_lm)

    ia2 = sub.add_parser(
        "import-arpa",
        help="ARPA n-gram LM (KenLM/SRILM) -> dense decode table npz",
    )
    ia2.add_argument("--arpa", required=True)
    ia2.add_argument("--vocab", required=True)
    ia2.add_argument("--order", type=int, default=None, choices=[2, 3],
                     help="default: highest available order, capped at 3")
    ia2.add_argument("--out", required=True)
    ia2.set_defaults(fn=cmd_import_arpa)

    km = sub.add_parser("kmeans")
    km.add_argument("--list")
    km.add_argument("--vocab")
    km.add_argument("--feature-cache", default=None,
                    help="fit on cached SSL features instead of the "
                         "frontend chain (--list/--vocab unused)")
    km.add_argument("--config", required=True)
    km.add_argument("--clusters", type=int, default=0,
                    help="0 -> recipe's gan.kmeans_clusters")
    km.add_argument("--iters", type=int, default=25)
    km.add_argument("--max-utts", type=int, default=500)
    km.add_argument("--seed", type=int, default=0)
    km.add_argument("--cmvn-stats", default=None,
                    help="override frontend.cmvn_stats_path (for cmvn=global)")
    km.add_argument("--out", required=True)
    km.set_defaults(fn=cmd_kmeans)

    imp = sub.add_parser("import-features")
    imp.add_argument("--features", required=True,
                     help="directory of <utt_id>.npy [T, D] files, one "
                          ".npz keyed by utterance id, or a Kaldi "
                          "feats.scp/.ark table")
    imp.add_argument("--list", required=True,
                     help="TSV utterance list (utt_id\\twav\\ttranscript)")
    imp.add_argument("--vocab", default=None,
                     help="token table for encoding transcripts "
                          "(omit for fully-unsupervised caches)")
    imp.add_argument("--shard-size", type=int, default=512)
    imp.add_argument("--out", required=True)
    imp.set_defaults(fn=cmd_import_features)

    ek = sub.add_parser("export-kaldi")
    ek.add_argument("--feature-cache", required=True)
    ek.add_argument("--out", required=True,
                    help="output base path (writes <out>.ark + <out>.scp)")
    ek.set_defaults(fn=cmd_export_kaldi)

    ia = sub.add_parser("import-ali")
    ia.add_argument("--ali", required=True,
                    help="Kaldi per-frame phone alignments (.ark or .scp)")
    ia.add_argument("--list", required=True,
                    help="TSV utterance list to merge the 4th column into")
    ia.add_argument("--vocab", required=True)
    ia.add_argument("--phone-map", default=None,
                    help="Kaldi phones.txt mapping '<symbol> <id>'")
    ia.add_argument("--out", required=True)
    ia.set_defaults(fn=cmd_import_ali)

    s = sub.add_parser("synth")
    s.add_argument("--out-dir", required=True)
    s.add_argument("--num-utts", type=int, default=128)
    s.add_argument("--num-phones", type=int, default=16)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--align", action="store_true",
                   help="write a 4th column of per-frame phone labels "
                        "(forced-alignment track for train.mode=frame_ce)")
    s.add_argument("--syntax", choices=["iid", "markov"], default="iid",
                   help="markov = phonotactic grammar (required for "
                        "unsupervised identifiability)")
    s.add_argument("--style", choices=["tone", "formant"], default="tone",
                   help="formant = narrowband-noise formants + speaker/"
                        "channel variation (the hard stand-in corpus)")
    s.add_argument("--min-len", type=int, default=3,
                   help="min phones per utterance (TIMIT-scale: ~20)")
    s.add_argument("--max-len", type=int, default=10,
                   help="max phones per utterance (TIMIT-scale: ~45)")
    s.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
