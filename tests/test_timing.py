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
