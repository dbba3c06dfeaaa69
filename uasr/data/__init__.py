"""Host-side data pipeline.

The reference's data layer (SURVEY.md L2a: dataset classes + TFRecord
writer/reader with bucketing and padded batching, features precomputed
on the host) becomes a thin host pipeline here: it only reads audio and
text, buckets, pads, and prefetches — feature extraction happens on
device (uasr.frontend). Padded shapes are drawn from a small static set
(bucket boundaries) so jit compiles once per bucket.
"""

from uasr.data.dataset import (  # noqa: F401
    ASRDataset,
    Batch,
    TextBatch,
    TextDataset,
    batch_iterator,
    compute_cmvn_stats,
    make_synthetic_dataset,
    text_batch_iterator,
)
from uasr.data.io import read_utterance_list, read_wav, write_wav  # noqa: F401
