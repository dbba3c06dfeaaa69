"""Core compute ops: CTC loss, on-device decode, EODM, WGAN-GP, metrics.

These replace the native kernels the reference delegated to TensorFlow
(SURVEY.md §2.1): tf.nn.ctc_loss (C++ CTCLoss op) -> log-semiring
`lax.scan`; tf.nn.ctc_beam_search_decoder (host C++ op) -> on-device
vectorized prefix beam search; host `editdistance` C extension ->
wavefront DP in JAX (plus a C++ host version in uasr/native for bulk
eval scoring).
"""

from uasr.ops.ctc import ctc_loss  # noqa: F401
from uasr.ops.decode import ctc_beam_search_decode, ctc_greedy_decode  # noqa: F401
from uasr.ops.edit_distance import batch_edit_distance, error_rate  # noqa: F401
