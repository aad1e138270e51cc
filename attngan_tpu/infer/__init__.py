from attngan_tpu.infer.sampler import Sampler, denormalize

__all__ = ["Sampler", "denormalize"]
