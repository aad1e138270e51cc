"""Profiling/observability.

Reference: utilities/decorators.py:5-14 — a wall-clock ``@timer`` print was
the entire observability stack. Under jit a Python timer measures dispatch,
not compute, so this module provides block-on-result timing helpers and a
jax.profiler trace context (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable

import jax
import numpy as np


def block(tree: Any) -> Any:
    """Block until every array in the pytree is ready (d2h sync point).

    CAVEAT: through remote-device tunnels this can return EARLY (even with
    the compile still in flight) — for honest timing use device_timeit /
    an explicit scalar readback, never this (BENCH.md "Methodology")."""
    return jax.block_until_ready(tree)


def timer(fn: Callable) -> Callable:
    """Wall-clock a host function, blocking on its device results
    (the honest version of reference utilities/decorators.py:5-14)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        start = time.perf_counter()
        out = block(fn(*args, **kwargs))
        print(f"[timer] {fn.__name__}: {time.perf_counter() - start:.3f}s")
        return out

    return wrapped


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context; view with tensorboard/xprof."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepWindowProfiler:
    """Capture a jax.profiler trace of the 0-indexed steps [start, stop) of
    a train loop (RunConfig.profile wiring; view with tensorboard/xprof).
    Skips the first steps so compilation isn't in the trace. Call ``tick()``
    once after EACH COMPLETED step and ``close()`` when the loop ends early:
    after ``start`` ticks, steps 0..start-1 are done, the trace starts, and
    it stops at the ``stop``-th tick — covering steps start..stop-1."""

    def __init__(self, logdir: str, enabled: bool = True, start: int = 2,
                 stop: int = 8):
        self.logdir = logdir
        self.enabled = enabled
        self.start = start
        self.stop = stop
        self._step = 0
        self._active = False

    def tick(self) -> None:
        if not self.enabled:
            return
        self._step += 1
        if self._step == self.start:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._step == self.stop and self._active:
            self.close()

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profile] wrote trace for steps "
                  f"[{self.start}, {min(self._step, self.stop)}) "
                  f"to {self.logdir}")


def count_parameters(params, name: str = "model", verbose: bool = True) -> int:
    """Total parameter count of a pytree (reference trainer.py:27-31)."""
    total = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"Model {name} has {total} parameters")
    return total


def device_timeit(fn: Callable, *args, iters: int = 20, warmup: int = 3,
                  fold: Callable[[Any], Any] | None = None) -> float:
    """Honest per-call seconds for a jitted ``fn(*args)``.

    ``jax.block_until_ready`` alone does not reliably fence independent
    dispatches through remote-device tunnels (measured: trunk forwards
    "finishing" above the chip's theoretical peak). Instead every
    iteration's output is folded into an on-device scalar — a true data
    dependency chain, since a dependent program cannot start before the
    producer program completes — and ONE host readback of that scalar ends
    the clock. ``fold`` maps the output pytree to a scalar; the default
    reads one element of the first leaf (cheapest full fence).
    """
    import jax.numpy as jnp

    if fold is None:
        def fold(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            # first element via plain indexing: lowers to a slice. (ravel()
            # [0] lowers to a full relayout copy — measured blowing HBM with
            # a 42x-padded copy of a (512,256,256,3) image batch.)
            return jnp.real(leaf[(0,) * leaf.ndim]).astype(jnp.float32)

    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(fold(out))                       # fence warmup + compile
    acc = jnp.zeros((), jnp.float32)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        acc = acc + fold(out).astype(jnp.float32)
    # The readback IS the fence that ends the timed region — it must run
    # unconditionally (an assert would be stripped under ``python -O`` and
    # the clock would stop after dispatch only).
    acc_host = float(acc)                  # single readback = end of work
    elapsed = time.perf_counter() - start
    if not np.isfinite(acc_host):
        raise RuntimeError(f"non-finite timing accumulator: {acc_host}")
    return elapsed / iters


class StepTimer:
    """Rolling steps/sec with an initial warmup skip (compile step).

    ``tick(n)`` records one completed DEVICE dispatch that performed ``n``
    optimization steps (n > 1 under DAMSM ``superbatch``). Warmup is
    consumed per dispatch — the whole compile dispatch is excluded from the
    clock regardless of how many inner steps it carried."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = -warmup
        self.start = None

    def tick(self, n: int = 1) -> None:
        if self.count < 0:
            self.count += 1
            if self.count == 0:
                self.start = time.perf_counter()
            return
        self.count += n

    @property
    def steps_per_sec(self) -> float:
        if self.count <= 0 or self.start is None:
            return 0.0
        return self.count / (time.perf_counter() - self.start)
