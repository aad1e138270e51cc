#!/usr/bin/env python
"""DAMSM pretraining entry point — thin shim over the packaged CLI.

The implementation lives in attngan_tpu/cli/pretrain.py (installed as the
`attngan-pretrain` console script); this file keeps the reference's
`python pretrain_damsm.py` invocation working from a source checkout
(reference pretrain_damsm.py is a notebook-cell script; BASELINE.json
requires the entry-point surface to stay).
"""

from attngan_tpu.cli.pretrain import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
