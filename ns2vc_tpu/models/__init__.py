from ns2vc_tpu.models.encoders import (
    PhoneEncoder,
    PromptEncoder,
    F0Predictor,
    TextTimeEmbedding,
    AttentionPooling,
)
from ns2vc_tpu.models.unet import UNet1DConditionModel
from ns2vc_tpu.models.diffusion import (
    NaturalSpeech2,
    PreModel,
    DiffusionEncoder,
    generate_mel,
    make_x0_fn,
)

__all__ = [
    "PhoneEncoder",
    "PromptEncoder",
    "F0Predictor",
    "TextTimeEmbedding",
    "AttentionPooling",
    "UNet1DConditionModel",
    "NaturalSpeech2",
    "PreModel",
    "DiffusionEncoder",
    "generate_mel",
    "make_x0_fn",
]
