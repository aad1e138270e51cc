"""AOT serving artifacts: serialize the compiled sampler with jax.export.

The reference's deployment story is "ship the Python repo + .pkl weights
and re-run test.py" (reference test.py:48-68 reconstructs every network
and loads pickles before it can generate). The TPU-native story is an
ahead-of-time artifact: the EXACT serving function (sampler.py::_sample —
BiLSTM text encoding + full generator cascade + denormalize, one XLA
program) is lowered to StableHLO with the restored weights baked in as
constants and serialized to one file. The artifact

  * is self-contained — serving needs jax + the bytes, none of the model
    code, config sidecars, or orbax checkpoint layout;
  * is cross-platform — `platforms=("tpu", "cpu")` lowers for both at
    export time, so a CPU host can build a TPU serving artifact (and the
    same file smoke-tests on CPU);
  * pins the program — StableHLO's backward-compatibility guarantees make
    it stable against model-code refactors, the same property the golden
    fingerprint tests pin for checkpoints;
  * supports a symbolic batch dimension (batch_size=None), so one
    artifact serves any request size without re-export.

The RNG enters as a uint32 seed scalar (the key is derived inside the
exported program), keeping the serving ABI to plain integer/float arrays
— no typed PRNG arrays to reconstruct at the call site — with the same
key derivation as Sampler.generate_from_captions(seed=...) (outputs
match to ~1 ulp; the serialized program may fuse differently than the
live jit).

The int8 tier exports too (``export_int8_sampler``): calibration is
data-dependent, so it runs ONCE at export time on a caller-provided
caption batch, and the calibrated activation scales are baked into the
artifact alongside the (quantize-at-trace-time) weights. Not exported:
the attention-map debug outputs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from attngan_tpu.infer.sampler import as_infer_state, _sample


def _export_serving(serve, seq_len: int, platforms: Sequence[str],
                    batch_size: int | None) -> jax_export.Exported:
    """Shared ABI for every exported sampler tier: (tokens (b, L) i32,
    lengths (b,) i32, seed () u32) with b symbolic when batch_size is None.
    One definition so the float and int8 artifacts cannot diverge."""
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    args = (jax.ShapeDtypeStruct((b, seq_len), jnp.int32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.uint32))
    return jax_export.export(jax.jit(serve), platforms=list(platforms))(*args)


def export_sampler(trainer, state, platforms: Sequence[str] = ("tpu", "cpu"),
                   batch_size: int | None = None) -> jax_export.Exported:
    """Lower the serving function to a jax.export.Exported.

    trainer/state: as for Sampler (state may be a full GanState or the
    restored InferState subtree). platforms: lowering targets; the
    artifact runs on any of them. batch_size: fixed leading dim, or None
    for a symbolic "b" (one artifact, any request size).
    """
    infer = as_infer_state(state)
    seq_len = trainer.cfg.seq_len

    def serve(tokens, lengths, seed):
        key = jax.random.key(seed)
        return _sample(trainer, infer, tokens, lengths, key)

    return _export_serving(serve, seq_len, platforms, batch_size)


def save_exported_sampler(path: str, trainer, state,
                          platforms: Sequence[str] = ("tpu", "cpu"),
                          batch_size: int | None = None) -> int:
    """export_sampler -> one artifact file; returns its size in bytes."""
    blob = export_sampler(trainer, state, platforms, batch_size).serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def export_int8_sampler(trainer, state, calib_tokens, calib_lengths,
                        platforms: Sequence[str] = ("tpu", "cpu"),
                        batch_size: int | None = None,
                        percentile: float = 99.0,
                        calib_seed: int = 0) -> jax_export.Exported:
    """Calibrate the int8 tier on (calib_tokens, calib_lengths), then
    lower the QUANTIZED serving function with the scales as constants.

    The artifact has the same ABI as export_sampler's (tokens, lengths,
    seed) and the same denormalized output; the difference is inside the
    program — convs/matmuls run s8 x s8 -> s32 with the weights quantized
    at trace time and activation scales from this one calibration pass
    (infer/quantize.py; p99 is the measured quality default, BENCH.md)."""
    from attngan_tpu.infer.quantize import Int8Sampler

    sampler = Int8Sampler(trainer, state, percentile=percentile)
    sampler.calibrate_on(jnp.asarray(calib_tokens, jnp.int32),
                         jnp.asarray(calib_lengths, jnp.int32),
                         jax.random.key(calib_seed))
    scales = tuple(sorted(sampler.act_scales.items()))
    infer = sampler.state
    seq_len = trainer.cfg.seq_len

    def serve(tokens, lengths, seed):
        key = jax.random.key(seed)
        return sampler._q_body(scales, infer, tokens, lengths, key)

    return _export_serving(serve, seq_len, platforms, batch_size)


def save_exported_int8_sampler(path: str, trainer, state, calib_tokens,
                               calib_lengths,
                               platforms: Sequence[str] = ("tpu", "cpu"),
                               batch_size: int | None = None,
                               percentile: float = 99.0,
                               calib_seed: int = 0) -> int:
    """export_int8_sampler -> one artifact file; returns its byte size."""
    blob = export_int8_sampler(
        trainer, state, calib_tokens, calib_lengths, platforms,
        batch_size, percentile, calib_seed).serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


class ExportedSampler:
    """Serve from an artifact file: tokens (B, L) int32, lengths (B,)
    int32, seed -> (B, R, R, 3) float images in [0, 1]. No model code or
    checkpoint needed — the weights are constants in the program."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.exported = jax_export.deserialize(bytearray(f.read()))
        self.platforms = tuple(self.exported.platforms)

    def __call__(self, tokens, lengths, seed: int = 0) -> jax.Array:
        return self.exported.call(jnp.asarray(tokens, jnp.int32),
                                  jnp.asarray(lengths, jnp.int32),
                                  jnp.uint32(seed))
