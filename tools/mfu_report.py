#!/usr/bin/env python
"""MFU report for the three flagship paths (VERDICT r4 Weak #2).

For each of the serving sampler, the DAMSM pretrain step, and the full
3-stage GAN step — all at reference dims — compile the program, take XLA's
model-FLOP estimate from the compiled module's cost analysis, measure
wall-clock over >= 3 independent windows (accumulator-fenced timing,
BENCH.md "Methodology"), and print achieved TFLOP/s + %-of-peak as one JSON
line per path. Results are recorded in BENCH.md and the BASELINE.md
scoreboard.

Usage: python tools/mfu_report.py [sampler] [damsm] [gan]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _report(name, compiled, run_window, unit_per_call, windows=3):
    """run_window() executes one timed window and returns (calls, seconds)."""
    import numpy as np

    from attngan_tpu.utils.mfu import compiled_flops, mfu_report

    secs_per_call = []
    for _ in range(windows):
        calls, dt = run_window()
        secs_per_call.append(dt / calls)
    sec = _median(secs_per_call)
    flops = compiled_flops(compiled)
    out = {
        "path": name,
        "sec_per_call": round(sec, 6),
        "unit_per_call": unit_per_call,
        "windows_ms": [round(1e3 * s, 3) for s in secs_per_call],
        "model_gflops_per_call": round(flops / 1e9, 2) if flops else None,
        **mfu_report(flops, sec),
    }
    print(json.dumps(out))
    return out


def bench_sampler():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.infer.sampler import Sampler
    from attngan_tpu.train.gan_trainer import GanTrainer

    vocab, batch = 1000, 512
    cfg = GanConfig(compute_dtype="bfloat16")
    trainer = GanTrainer(cfg, vocab_size=vocab)
    with jax.default_device(jax.devices("cpu")[0]):
        state = trainer.init_state(seed=0)
    # init_state ran CPU-committed (eager flax init through the remote
    # tunnel is pathological); device_put with NO target is a no-op for
    # committed arrays, so pin the default (accelerator) device explicitly.
    state = jax.device_put(state, jax.devices()[0])
    sampler = Sampler(trainer, state)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, vocab, (batch, cfg.seq_len)),
                         jnp.int32)
    lengths = jnp.full((batch,), cfg.seq_len, jnp.int32)
    compiled = sampler._sample_fn.lower(
        sampler.state, tokens, lengths, jax.random.key(0)).compile()
    imgs = sampler.generate_from_tokens(tokens, lengths, jax.random.key(0))
    assert float(jnp.sum(imgs)) >= 0.0  # warmup + fence

    def window(iters=20):
        acc = jnp.zeros(())
        start = time.perf_counter()
        for i in range(iters):
            imgs = sampler.generate_from_tokens(tokens, lengths,
                                                jax.random.key(i))
            acc = acc + jnp.sum(imgs)
        assert np.isfinite(float(acc))
        return iters, time.perf_counter() - start

    return _report(f"sampler_b{batch}_bf16", compiled, window,
                   f"one {batch}-image 256px sampling call")


def bench_damsm():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import DamsmConfig
    from attngan_tpu.train.damsm_trainer import DamsmTrainer

    vocab, L = 1000, 7
    cfg = DamsmConfig(compute_dtype="bfloat16")
    trainer = DamsmTrainer(cfg, vocab_size=vocab, seq_len=L)
    with jax.default_device(jax.devices("cpu")[0]):
        state = trainer.init_state(seed=0)
    # init_state ran CPU-committed (eager flax init through the remote
    # tunnel is pathological); device_put with NO target is a no-op for
    # committed arrays, so pin the default (accelerator) device explicitly.
    state = jax.device_put(state, jax.devices()[0])
    rng = np.random.default_rng(0)
    b = cfg.batch_size
    batch = {
        "tokens": jnp.asarray(rng.integers(0, vocab, (b, L)), jnp.int32),
        "lengths": jnp.asarray(rng.integers(2, L + 1, (b,)), jnp.int32),
        "class_ids": jnp.asarray(np.arange(b), jnp.int32),
        "img256": jnp.asarray(np.tanh(rng.standard_normal((b, 256, 256, 3))),
                              jnp.float32),
    }
    trainer.trunk_module()
    compiled = trainer._step_fn.lower(None, state, batch).compile()
    state, metrics = trainer.train_step(state, batch)  # warmup
    assert np.isfinite(float(metrics["loss"]))

    def window(iters=30):
        nonlocal state
        start = time.perf_counter()
        for _ in range(iters):
            # donated state chains the steps; one metric readback ends it
            state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        return iters, time.perf_counter() - start

    return _report(f"damsm_step_b{b}_bf16", compiled, window,
                   f"one {b}-pair DAMSM train step (un-cached trunk)")


def bench_gan():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attngan_tpu.core.config import GanConfig
    from attngan_tpu.train.gan_trainer import GanTrainer

    vocab = 1000
    cfg = GanConfig(compute_dtype="bfloat16")
    trainer = GanTrainer(cfg, vocab_size=vocab)
    with jax.default_device(jax.devices("cpu")[0]):
        state = trainer.init_state(seed=0)
    # init_state ran CPU-committed (eager flax init through the remote
    # tunnel is pathological); device_put with NO target is a no-op for
    # committed arrays, so pin the default (accelerator) device explicitly.
    state = jax.device_put(state, jax.devices()[0])
    rng = np.random.default_rng(0)
    b, L = cfg.batch_size, cfg.seq_len
    batch = {
        "tokens": jnp.asarray(rng.integers(0, vocab, (b, L)), jnp.int32),
        "lengths": jnp.asarray(rng.integers(2, L + 1, (b,)), jnp.int32),
        "class_ids": jnp.asarray(np.arange(b), jnp.int32),
    }
    for res in cfg.resolutions:
        batch[f"img{res}"] = jnp.asarray(
            np.tanh(rng.standard_normal((b, res, res, 3))), jnp.float32)
    compiled = trainer._step_fn.lower(state, batch).compile()
    state, metrics = trainer.train_step(state, batch)  # warmup
    assert np.isfinite(float(metrics["g_total"]))

    def window(iters=20):
        nonlocal state
        start = time.perf_counter()
        for _ in range(iters):
            state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["g_total"]))
        return iters, time.perf_counter() - start

    return _report(f"gan_step_b{b}_bf16", compiled, window,
                   f"one {b}-sample 3-stage GAN train step")


def main():
    from attngan_tpu.core.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    which = set(sys.argv[1:]) or {"sampler", "damsm", "gan"}
    if "sampler" in which:
        bench_sampler()
    if "damsm" in which:
        bench_damsm()
    if "gan" in which:
        bench_gan()


if __name__ == "__main__":
    main()
