"""CLI surface smoke tests: the entry points must parse args and fail fast
with clean messages (BASELINE.json requires pretrain_damsm.py / train.py /
test.py / config.py to keep a CLI surface)."""

import os
import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv, timeout=120):
    # Subprocesses inherit the session env, which may preset a real-TPU
    # platform (JAX_PLATFORMS=axon). CLI tests must run hermetically on the
    # same forced 8-device CPU mesh as the in-process suite (conftest.py).
    env = dict(os.environ)
    # The session's sitecustomize eagerly registers+initializes the remote
    # TPU backend, which wins over JAX_PLATFORMS=cpu; dropping its trigger
    # env var keeps the subprocess off the tunnel entirely.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    return subprocess.run([sys.executable, *argv], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


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


@pytest.mark.slow
def test_test_py_benchmark_shards_over_mesh(tmp_path):
    """North-star config 5: `test.py --benchmark` must run the sampler
    data-parallel over the device mesh — asserted via the actual output
    array's sharding, reported in the benchmark JSON."""
    import json

    caps = {f"img_{i}.jpg": [[f"k2c{i % 2}", f"k4c{i % 4}"], i % 4]
            for i in range(4)}
    caps_path = tmp_path / "caps.json"
    caps_path.write_text(json.dumps(caps))

    proc = _run("test.py", "--captions-path", str(caps_path),
                "--checkpoint", str(tmp_path / "nonexistent"),
                "--benchmark", "--batch-size", "16", "--num-stages", "1",
                "--gf-dim", "4", "--df-dim", "4", "--emb-dim", "16",
                "--image-encoder", "tiny", "--compute-dtype", "",
                timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["devices"] == 8, proc.stdout
    assert result["output_sharded_over"] == 8, proc.stdout
    assert "data-parallel inference over 8 devices" in proc.stdout


def _caps_file(tmp_path):
    import json

    caps = {f"img_{i}.jpg": [[f"k2c{i % 2}", f"k4c{i % 4}"], i % 4]
            for i in range(4)}
    caps_path = tmp_path / "caps.json"
    caps_path.write_text(json.dumps(caps))
    return caps_path


def _sidecar_ckpt(tmp_path):
    """Checkpoint dir with only the config sidecar (no step dirs): test.py
    warns about random weights but still applies the recorded model shape."""
    import json

    ck = tmp_path / "ckpt"
    ck.mkdir()
    (ck / "config.json").write_text(json.dumps({
        "num_stages": 1, "gf_dim": 4, "df_dim": 4, "emb_dim": 16,
        "seq_len": 4, "image_encoder": "tiny"}))
    return ck


@pytest.mark.slow
def test_test_py_sidecar_fills_unpassed_flags(tmp_path):
    """No shape flags passed: the sidecar's dims drive the model (the run
    succeeds at tiny dims only because the sidecar was honored)."""
    import json

    proc = _run("test.py", "--captions-path", str(_caps_file(tmp_path)),
                "--checkpoint", str(_sidecar_ckpt(tmp_path)),
                "--benchmark", "--batch-size", "8", "--compute-dtype", "",
                timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] > 0


@pytest.mark.slow
def test_test_py_sidecar_only_dir_with_progress_falls_back(tmp_path):
    """A checkpoint dir holding ONLY sidecars (config.json + progress.json,
    step dirs deleted to reclaim disk) must fall back to random weights
    with a warning — not hand orbax a sidecar-only dir and crash."""
    import json

    ck = _sidecar_ckpt(tmp_path)
    (ck / "progress.json").write_text(json.dumps({"epoch": 3, "step": 42}))
    proc = _run("test.py", "--captions-path", str(_caps_file(tmp_path)),
                "--checkpoint", str(ck),
                "--benchmark", "--batch-size", "8", "--compute-dtype", "",
                timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "no checkpoint found" in proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] > 0


def test_test_py_explicit_flag_sidecar_mismatch_fails_loudly(tmp_path):
    """An explicitly-passed dim contradicting the sidecar must fail with a
    message naming BOTH values (VERDICT r3 Weak #6), not silently prefer
    the sidecar or die in orbax with a raw shape error."""
    proc = _run("test.py", "--captions-path", str(_caps_file(tmp_path)),
                "--checkpoint", str(_sidecar_ckpt(tmp_path)),
                "--benchmark", "--gf-dim", "8", "--compute-dtype", "",
                timeout=420)
    assert proc.returncode != 0
    err = proc.stderr + proc.stdout
    assert "contradicts" in err
    assert "gf_dim=4" in err and "--gf-dim 8" in err


def test_config_module_exposes_dataclasses():
    proc = _run("-c",
                "import config; "
                "assert config.DamsmConfig().emb_dim == 256; "
                "assert config.GanConfig().gf_dim == 32; "
                "print(config.Config.CHECKPOINT_DIR)")
    assert proc.returncode == 0, proc.stderr[-500:]


@pytest.mark.slow
def test_test_py_int8_benchmark(tmp_path):
    """--int8 must calibrate and serve the quantized sampler end to end."""
    import json

    caps = {f"img_{i}.jpg": [[f"k2c{i % 2}", f"k4c{i % 4}"], i % 4]
            for i in range(4)}
    caps_path = tmp_path / "caps.json"
    caps_path.write_text(json.dumps(caps))

    proc = _run("test.py", "--captions-path", str(caps_path),
                "--checkpoint", str(tmp_path / "nonexistent"),
                "--benchmark", "--int8", "--batch-size", "8",
                "--num-stages", "1", "--gf-dim", "4", "--df-dim", "4",
                "--emb-dim", "16", "--image-encoder", "tiny",
                "--compute-dtype", "", timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["int8"] is True
    assert result["value"] > 0


def test_fused_upsample_flag_parsing(monkeypatch):
    """--fused-upsample mode surface (ops/layers.py UpBlock routing):
    absent -> False (measured default, the dilated conv), bare flag ->
    'pallas' (the original HBM-block kernel), explicit 'packed'/'packed64'
    select the lane-packed redesign, anything else is rejected at parse
    time."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "attngan_test_entry", os.path.join(REPO, "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def parse(*extra):
        monkeypatch.setattr(_sys, "argv", ["test.py", *extra])
        return mod.parse_args()

    assert parse().fused_upsample is False
    assert parse("--fused-upsample").fused_upsample == "pallas"
    assert parse("--fused-upsample", "packed").fused_upsample == "packed"
    assert parse("--fused-upsample", "packed64").fused_upsample == "packed64"
    with pytest.raises(SystemExit):
        parse("--fused-upsample", "bogus")


def test_test_py_export_rejects_runtime_tiers(tmp_path):
    """--export + --fused-* must fail fast at parse time (the artifact
    lowers the XLA path; the Pallas kernels are runtime tiers), BEFORE
    any model construction or checkpoint restore. (--int8 is allowed —
    it exports the calibrated quantized program.)"""
    proc = _run("test.py", "--export", str(tmp_path / "a.bin"),
                "--fused-upsample", timeout=60)
    assert proc.returncode != 0
    assert "--export lowers the XLA serving path" in (
        proc.stderr + proc.stdout)


@pytest.mark.slow
def test_test_py_export_writes_servable_artifact(tmp_path):
    """`test.py --export` end to end: write a CPU artifact at tiny dims,
    then serve it from a fresh process via ExportedSampler — no model
    code, config sidecar, or checkpoint at the call site."""
    art = tmp_path / "sampler.stablehlo"
    proc = _run("test.py", "--captions-path", str(_caps_file(tmp_path)),
                "--checkpoint", str(tmp_path / "nonexistent"),
                "--export", str(art), "--export-platforms", "cpu",
                "--num-stages", "1", "--gf-dim", "4", "--df-dim", "4",
                "--emb-dim", "16", "--image-encoder", "tiny",
                "--compute-dtype", "", timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "wrote" in proc.stdout and art.exists()

    serve = (
        "import numpy as np\n"
        "from attngan_tpu.infer.export import ExportedSampler\n"
        f"s = ExportedSampler({str(art)!r})\n"
        "tok = np.ones((2, 5), np.int32); ln = np.full((2,), 5, np.int32)\n"
        "out = s(tok, ln, seed=3)\n"
        "assert out.shape == (2, 64, 64, 3), out.shape\n"
        "assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0\n"
        "print('served', out.shape)\n")
    proc2 = _run("-c", serve, timeout=300)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "served" in proc2.stdout
