"""CLI surface smoke tests: the entry points must parse args and fail fast
with clean messages (BASELINE.json requires pretrain_damsm.py / train.py /
test.py / config.py to keep a CLI surface)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv):
    return subprocess.run([sys.executable, *argv], cwd=REPO,
                          capture_output=True, text=True, timeout=120)


def test_help_screens():
    for script in ("pretrain_damsm.py", "train.py", "test.py"):
        proc = _run(script, "--help")
        assert proc.returncode == 0, proc.stderr[-500:]
        assert "usage:" in proc.stdout


def test_invalid_choice_fails_fast():
    proc = _run("pretrain_damsm.py", "--image-encoder", "nope")
    assert proc.returncode == 2
    assert "invalid choice" in proc.stderr


def test_test_py_requires_action():
    proc = _run("test.py", "--captions-path", "/nonexistent.json")
    assert proc.returncode != 0
    assert "image-names" in (proc.stderr + proc.stdout)


def test_config_module_exposes_dataclasses():
    proc = _run("-c",
                "import config; "
                "assert config.DamsmConfig().emb_dim == 256; "
                "assert config.GanConfig().gf_dim == 32; "
                "print(config.Config.CHECKPOINT_DIR)")
    assert proc.returncode == 0, proc.stderr[-500:]
