from attngan_tpu.infer.sampler import Sampler, denormalize
from attngan_tpu.infer.export import (
    ExportedSampler,
    export_sampler,
    save_exported_sampler,
)

__all__ = ["Sampler", "denormalize", "ExportedSampler", "export_sampler",
           "save_exported_sampler"]
