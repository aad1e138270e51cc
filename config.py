"""Configuration surface (reference config.py:3-5, generalized) — shim.

The reference's config.py held two hardcoded Windows dataset paths; every
other knob lived as UPPERCASE constants inside the entry scripts. Here the
canonical configs are dataclasses in attngan_tpu.core.config (re-exported
for convenience), plus the `Config` class of env-var-overridable default
paths used by the CLI entry points.
"""

from attngan_tpu.core.config import (  # noqa: F401
    Config,
    DamsmConfig,
    DataConfig,
    GanConfig,
    RunConfig,
    replace,
)
