"""Configuration surface (reference config.py:3-5, generalized).

The reference's config.py held two hardcoded Windows dataset paths; every
other knob lived as UPPERCASE constants inside the entry scripts. Here the
canonical configs are dataclasses in attngan_tpu.core.config, re-exported
for convenience, plus overridable default paths used by the CLI shims.
"""

import os

from attngan_tpu.core.config import (  # noqa: F401
    DamsmConfig,
    DataConfig,
    GanConfig,
    RunConfig,
    replace,
)


class Config:
    """Default filesystem layout (override via CLI flags or env vars)."""

    DATA_ROOT = os.environ.get("ATTNGAN_DATA_ROOT", "data/images")
    CAPTIONS_JSON = os.environ.get(
        "ATTNGAN_CAPTIONS", "data/captionsAndClassIDs.json")
    CHECKPOINT_DIR = os.environ.get("ATTNGAN_CKPT_DIR", "checkpoints")
    IMAGE_DIR = os.environ.get("ATTNGAN_IMAGE_DIR", "generated_images")
