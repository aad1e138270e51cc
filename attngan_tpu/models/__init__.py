from attngan_tpu.models.discriminators import Discriminator
from attngan_tpu.models.generator import (
    CondAugment,
    Generator,
    InitialStage,
    MakeImage,
    NextStage,
)
from attngan_tpu.models.rnn_encoder import BiLSTMEncoder

__all__ = [
    "BiLSTMEncoder", "CondAugment", "Discriminator", "Generator",
    "InitialStage", "MakeImage", "NextStage",
]
