"""Token n-gram language model for shallow-fusion decoding.

The unsupervised lineage the reference implements decodes / selects
models with a phoneme LM trained on the unpaired text corpus (EODM's
n-gram statistics, wav2vec-U's KenLM shallow fusion); the reference's
host-side `tf.nn.ctc_beam_search_decoder` had no LM hook (SURVEY.md
§3.4). Here the LM is a dense [V + 1, V] log-probability table that
lives on device and is gathered per beam step by
`uasr.ops.decode.ctc_beam_search_decode(lm_logp=...)` — at phoneme
vocabulary sizes a dense bigram is a few hundred KB, so there is
nothing to prune or back off.

Row `h` (0 <= h < V) is log P(next | prev = h); row V is the
start-of-sequence distribution (used for the first emitted token).
Smoothing is add-k over the vocabulary, which keeps every transition
finite — an unseen transition must stay decodable, just penalized.
"""

from __future__ import annotations

import numpy as np


def build_bigram_lm(
    sequences,
    vocab_size: int,
    add_k: float = 0.5,
    exclude: tuple[int, ...] = (),
) -> np.ndarray:
    """Count-based add-k bigram LM -> [V + 1, V] float32 log-probs.

    sequences: iterable of int token id sequences (text corpus).
    exclude: token ids never emitted by the decoder (e.g. the CTC
    blank) — their COLUMNS get probability ~0 so smoothing mass is not
    wasted on them; their rows stay uniform (never consulted).
    """
    V = vocab_size
    counts = np.zeros((V + 1, V), np.float64)
    for seq in sequences:
        prev = V  # start-of-sequence row
        for tok in seq:
            t = int(tok)
            if not (0 <= t < V):
                continue
            counts[prev, t] += 1.0
            prev = t
    counts += add_k
    keep = np.ones(V, bool)
    for e in exclude:
        if 0 <= e < V:
            keep[e] = False
    counts[:, ~keep] = 1e-20
    logp = np.log(counts) - np.log(counts.sum(axis=1, keepdims=True))
    return logp.astype(np.float32)


def save_lm(path: str, logp: np.ndarray) -> None:
    np.savez(path, logp=logp)


def load_lm(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["logp"].astype(np.float32)


def sequence_logprob(logp: np.ndarray, seq) -> float:
    """Host-side log P_lm(seq) (tests / model selection scoring)."""
    V = logp.shape[1]
    total, prev = 0.0, V
    for tok in seq:
        total += float(logp[prev, int(tok)])
        prev = int(tok)
    return total
