"""FaCodec (NaturalSpeech3) frozen codec — JAX inference implementation.

Weights are converted from the PyTorch release (HF repo
amphion/naturalspeech3_facodec) with tools/convert_torch_ckpt.py.
"""

from flamed_tts_tpu.models.facodec.encoder import (  # noqa: F401
    encoder_forward,
    encoder_hop_length,
    init_encoder_params,
)
from flamed_tts_tpu.models.facodec.decoder import (  # noqa: F401
    analyze,
    init_decoder_params,
    synthesize,
    vq2emb,
)
