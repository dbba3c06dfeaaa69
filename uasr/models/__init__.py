"""Model zoo: CTC encoders (conv+BiGRU, pure-CNN), the GAN phone
classifier (generator) and phone-sequence discriminator (critic).

Replaces the reference's Keras model classes (SURVEY.md §2.2 `models/`):
cuDNN GRU -> time-major `lax.scan` with input projections hoisted into
one large pre-scan GEMM (MXU-friendly); Conv2D+BN blocks -> strided
convs with LayerNorm (jit/SPMD-friendly, no running stats to sync).
"""

from uasr.models.models import (  # noqa: F401
    CNNEncoder,
    ConvBiGRUEncoder,
    PhoneClassifier,
    PhoneDiscriminator,
    UniGRUEncoder,
    build_model,
)
