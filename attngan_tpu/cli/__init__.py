"""CLI entry points (console scripts: attngan-pretrain / attngan-train /
attngan-test; source-checkout shims: pretrain_damsm.py / train.py / test.py).

Each module keeps argument parsing at import time cheap (jax and the model
stack are imported inside main()) so `--help` stays fast.
"""

from attngan_tpu.cli import infer, pretrain, train  # noqa: F401
