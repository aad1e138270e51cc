#!/usr/bin/env python
"""Adversarial (GAN) training entry point — thin shim over the packaged CLI.

The implementation lives in attngan_tpu/cli/train.py (installed as the
`attngan-train` console script); this file keeps the reference's
`python train.py` invocation working from a source checkout.
"""

from attngan_tpu.cli.train import load_damsm_encoders, main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
