"""Acoustic frontend: numpy oracle (executable spec), JAX implementation,
and fused Pallas TPU kernels.

The reference computed features on the host in a one-time data-prep pass
(SURVEY.md §3.5) with python_speech_features/Kaldi-style numpy code; here
the whole chain runs on device per batch, with the numpy oracle kept as the
bit-faithfulness target (BASELINE.json: features match to 1e-4).
"""

from uasr.frontend.features import (  # noqa: F401
    FrontendState,
    apply_cmvn,
    compute_features,
    dft_matrices,
    log_mel_frontend,
    splice_and_downsample,
)
from uasr.frontend.oracle import (  # noqa: F401
    oracle_fbank,
    oracle_features,
    oracle_mfcc,
)
