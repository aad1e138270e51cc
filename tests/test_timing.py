"""StepTimer semantics (utils/timing.py) — the rate the loops print.

The superbatch loop ticks once per DEVICE dispatch with n inner steps;
warmup must swallow the whole compile dispatch (not just its first inner
step) or steps/s is inflated by K-1 never-timed steps.
"""

import time

from attngan_tpu.utils.timing import StepTimer


def test_warmup_consumes_whole_first_dispatch():
    t = StepTimer(warmup=1)
    t.tick(8)                       # compile dispatch: excluded entirely
    assert t.count == 0 and t.start is not None
    assert t.steps_per_sec == 0.0
    t.tick(8)
    assert t.count == 8             # all 8 inner steps counted


def test_rate_counts_inner_steps():
    t = StepTimer(warmup=1)
    t.tick(4)
    time.sleep(0.05)
    t.tick(4)
    rate = t.steps_per_sec
    # ~4 steps in ~0.05s; generous lower bound for loaded CI machines
    assert 4 / 2.0 < rate < 4 / 0.04


def test_plain_path_unchanged():
    t = StepTimer(warmup=1)
    t.tick()
    assert t.count == 0
    t.tick()
    t.tick()
    assert t.count == 2
    assert t.steps_per_sec > 0


# ---- MFU reporting (utils/mfu.py; VERDICT r4 Weak #2) ----


def test_compiled_flops_from_cost_analysis():
    import jax
    import jax.numpy as jnp

    from attngan_tpu.utils.mfu import compiled_flops

    f = jax.jit(lambda a, b: a @ b)
    c = f.lower(jnp.ones((64, 64)), jnp.ones((64, 64))).compile()
    flops = compiled_flops(c)
    # 2 * 64^3 MACs-as-flops = 524,288 (XLA counts fused consumer ops too,
    # so allow headroom above the matmul floor)
    assert flops is not None and 2 * 64**3 <= flops <= 4 * 64**3


def test_mfu_report_known_peak_and_unknown_backend():
    from attngan_tpu.utils.mfu import mfu_report

    class FakeDev:
        device_kind = "TPU v5 lite"

    rep = mfu_report(197e12 * 0.25, 1.0, device=FakeDev())
    assert rep["peak_tflops"] == 197.0
    assert abs(rep["mfu"] - 0.25) < 1e-6

    rep_cpu = mfu_report(1e9, 1.0)  # CPU test backend: peak unknown
    assert rep_cpu["peak_tflops"] is None and rep_cpu["mfu"] is None
    assert rep_cpu["achieved_tflops"] == 0.001

    rep_none = mfu_report(None, 1.0, device=FakeDev())
    assert rep_none["mfu"] is None and rep_none["achieved_tflops"] is None
