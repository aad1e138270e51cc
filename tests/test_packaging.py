"""Packaging surface: the framework must be pip-installable (pyproject.toml)
with working console scripts and the native C++ source shipped as package
data — a capability the reference lacks entirely (it is a bag of notebook
scripts with no package structure, SURVEY.md §1)."""

import os
import subprocess
import sys
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve_to_real_callables():
    import importlib

    scripts = _pyproject()["project"]["scripts"]
    assert set(scripts) == {"attngan-pretrain", "attngan-train",
                            "attngan-test"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


def test_native_source_is_package_data():
    pkg_data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "native/*.cpp" in pkg_data["attngan_tpu"]
    assert os.path.exists(
        os.path.join(REPO, "attngan_tpu", "native", "jpeg_loader.cpp"))


def test_root_shims_delegate_to_package():
    """The reference-parity root scripts stay, but as thin shims: their
    parse_args/main must be the packaged CLI functions."""
    import importlib.util

    from attngan_tpu.cli import infer, pretrain, train

    for script, cli_mod in (("pretrain_damsm.py", pretrain),
                            ("train.py", train), ("test.py", infer)):
        spec = importlib.util.spec_from_file_location(
            f"shim_{script}", os.path.join(REPO, script))
        shim = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(shim)
        assert shim.main is cli_mod.main
        assert shim.parse_args is cli_mod.parse_args


def test_build_dir_falls_back_to_cache_when_readonly(monkeypatch):
    """A pip-installed site-packages may be read-only: the native loader
    must build into ~/.cache instead of dying."""
    from attngan_tpu.data import native_loader

    monkeypatch.setattr(os, "access", lambda path, mode: False)
    d = native_loader._build_dir()
    assert "attngan-tpu" in d and not d.startswith(
        os.path.join(REPO, "attngan_tpu"))

    monkeypatch.setattr(os, "access", lambda path, mode: True)
    assert native_loader._build_dir().endswith(
        os.path.join("native", "build"))


@pytest.mark.slow
def test_pip_install_target_ships_working_package(tmp_path):
    """Full install round-trip: pip install into a clean --target dir, then
    import the package and run a console script FROM there (cwd outside the
    repo so the source tree cannot leak in)."""
    target = tmp_path / "site"
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", str(target), REPO],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (target / "attngan_tpu" / "native" / "jpeg_loader.cpp").exists()
    assert (target / "bin" / "attngan-test").exists()

    env = dict(os.environ)
    env["PYTHONPATH"] = str(target)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    check = (
        "import attngan_tpu, os, sys\n"
        f"assert attngan_tpu.__file__.startswith({str(target)!r}), "
        "attngan_tpu.__file__\n"
        "from attngan_tpu.cli.infer import parse_args\n"
        "sys.argv = ['attngan-test', '--gf-dim', '8']\n"
        "assert parse_args().gf_dim == 8\n"
        "print('installed-package ok')\n")
    proc2 = subprocess.run([sys.executable, "-c", check], cwd=str(tmp_path),
                           env=env, capture_output=True, text=True,
                           timeout=120)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "installed-package ok" in proc2.stdout

    proc3 = subprocess.run(
        [sys.executable, str(target / "bin" / "attngan-pretrain"), "--help"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=120)
    assert proc3.returncode == 0, proc3.stderr[-2000:]
    assert "usage:" in proc3.stdout
