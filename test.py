#!/usr/bin/env python
"""Text -> image inference entry point — thin shim over the packaged CLI.

The implementation lives in attngan_tpu/cli/infer.py (installed as the
`attngan-test` console script); this file keeps the reference's
`python test.py` invocation working from a source checkout.
"""

from attngan_tpu.cli.infer import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
