"""tpu-uasr: TPU-native unsupervised / semi-supervised ASR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
eastonYi/Unsupervised-ASR (a TF2 research codebase for supervised CTC,
GAN-adversarial, and EODM unsupervised phoneme recognition):

- Acoustic frontend (pre-emphasis, framing, STFT, mel, MFCC, deltas, CMVN,
  SpecAugment) as on-device JAX + fused Pallas kernels
  (ref: SURVEY.md L2b; reference computed features on host with numpy).
- Conv / BiGRU CTC encoders, phone classifier (generator) and phone-sequence
  discriminator as Flax modules (ref: SURVEY.md L3, `models/`).
- CTC forward-backward loss as a log-semiring `lax.scan`
  (ref: reference delegated to `tf.nn.ctc_loss`).
- On-device greedy + beam CTC decode (ref: reference used host-side
  `tf.nn.ctc_beam_search_decoder`).
- GAN (WGAN-GP) and EODM training objectives in pure JAX.
- Data parallelism via `jax.sharding.Mesh` + jit shardings over ICI
  (reference was single-GPU, no distribution).

See SURVEY.md for the full blueprint and provenance notes (the reference
mount was empty; BASELINE.json is the binding spec).
"""

__version__ = "0.1.0"


def _maybe_force_cpu() -> None:
    """Pin jax to CPU when the caller asked for it via env.

    ``JAX_PLATFORMS=cpu`` alone is NOT reliable in images whose
    sitecustomize registers a TPU plugin and re-forces the platform
    after env parsing; ``jax.config.update`` wins because it runs
    later. Centralized here so every entry point (cli, tools.prepare,
    tools.selftrain, tests' subprocesses) gets the same behavior.
    """
    import os

    if (
        os.environ.get("UASR_FORCE_CPU", "0") not in ("", "0")
        or os.environ.get("JAX_PLATFORMS") == "cpu"
    ):
        import jax

        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()

__all__ = [
    "Config",
    "load_config",
    "CTCTrainer",
    "GANTrainer",
    "EODMTrainer",
]


def __getattr__(name):  # lazy, so `import uasr` stays lightweight
    if name in ("Config", "load_config"):
        from uasr import config as _c

        return getattr(_c, name)
    if name in ("CTCTrainer", "GANTrainer", "EODMTrainer"):
        from uasr import train as _t

        return getattr(_t, name)
    raise AttributeError(name)
