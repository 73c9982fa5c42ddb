from ns2vc_tpu.models.encoders import (
    PhoneEncoder,
    PromptEncoder,
    F0Predictor,
    TextTimeEmbedding,
    AttentionPooling,
)

__all__ = [
    "PhoneEncoder",
    "PromptEncoder",
    "F0Predictor",
    "TextTimeEmbedding",
    "AttentionPooling",
]
