"""Fused Pallas kernel: nearest-2x-upsample -> conv3x3 -> BN(eval) -> GLU.

The generator's UpBlock tail (reference utilities/layers.py:60-69) dominates
sampling time: at 128^2 -> 256^2 the naive chain materializes the 4x
upsampled tensor and the pre-GLU double-width conv output in HBM (~9x the
input bytes of extra traffic). This kernel keeps the whole chain
VMEM-resident per image: the input block is read from HBM once and only the
final GLU output is written.

Math: the exact 2x2 parity decomposition already equality-tested in
ops/layers.py::upsample_conv3x3_fused — on the nearest-upsampled grid every
output pixel of parity (py, px) sees a 3x3 window that collapses onto a 2x2
neighborhood of the ORIGINAL grid, so the op equals four 2x2 convs with
pairwise-summed kernels. Each parity's conv is computed as ONE im2col
matmul with a 4*C_in contraction axis (C_in=32 -> K=128: exactly the MXU
width, where separate per-tap matmuls would idle 3/4 of the array), then
eval-mode BN (folded to scale+bias) and GLU are applied in registers.

Output layout: the kernel interleaves both parities in an fp32 VMEM
scratch (strided sublane stores) and writes finished (2*RC, 2W, C_out)
chunks of the STANDARD-layout (2H, 2W, C_out) output — downstream convs
consume it with no relayout copy.

Inference-only (train-mode BN needs batch stats over the un-GLU'd conv
output; the train path keeps the XLA chain). Forward-only, used under
jax.lax.stop_gradient-free eval sampling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _parity_kernels(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) conv kernel -> (4, 4*Ci, Co) per-parity 2x2 matmul
    weights, pairwise-sum math identical to ops/layers.py:186-194."""
    w_r0 = jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0)  # (2,3,Ci,Co)
    w_r1 = jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0)

    def cols(wk):
        return (jnp.stack([wk[:, 0], wk[:, 1] + wk[:, 2]], axis=1),
                jnp.stack([wk[:, 0] + wk[:, 1], wk[:, 2]], axis=1))

    k00, k01 = cols(w_r0)
    k10, k11 = cols(w_r1)
    ci, co = kernel.shape[2], kernel.shape[3]
    # (2, 2, Ci, Co) -> (2, 2*Ci, Co) per parity, split by COLUMN tap b:
    # [:, 0] contracts the un-shifted column slices (rows a=0 then a=1),
    # [:, 1] the col+1-shifted ones. Two K=2Ci matmuls instead of one 4Ci —
    # Mosaic only concatenates VMEM slices with EQUAL offsets on non-concat
    # dims, and a column shift changes the slice's lane/sublane offset.
    def split_cols(k):
        return jnp.stack([
            jnp.concatenate([k[0, 0], k[1, 0]], axis=0),   # (2Ci, Co)
            jnp.concatenate([k[0, 1], k[1, 1]], axis=0),
        ])
    return jnp.stack([split_cols(k) for k in (k00, k01, k10, k11)])


def _upblock_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, scratch_ref,
                    *, row_chunk):
    """One grid cell = one (image, row chunk): grid (B, H/RC).

    Row chunking lives in the GRID, not a Python unroll — Mosaic gives every
    unrolled iteration's intermediates their own VMEM stack slot, so an
    in-kernel loop over 16 chunks blew the 16 MB scoped limit (41 MB at
    gen3's 128^2 x 64ch). Per cell the body handles one chunk; the full
    padded image block (index map ignores the chunk axis) stays resident
    across the image's cells.

    x (1, H+2, W+2, Ci) zero-padded in HBM by the caller (XLA fuses the pad
    into the producer); w (4, 2, 2Ci, 2Co); scale/bias (1, 2Co) folded eval
    BN; out (1, 2*RC, 2W, Co) — a STANDARD-LAYOUT slice of the final
    (B, 2H, 2W, Co) tensor, so downstream convs consume it with no relayout
    copy (an earlier (1, RC, 2, 2W, Co)+reshape variant won in isolation but
    lost in the full sampler: XLA re-tiled the 256^2 output for the next
    conv, and the copy ate the kernel's entire win). scratch (2*RC, 2W, Co)
    fp32 — Mosaic supports strided stores only for 32-bit data, so both the
    column interleave and the row (parity) interleave land in the fp32
    scratch and one contiguous cast-store moves the finished chunk to the
    (possibly bf16) output block."""
    w_dim, ci = x_ref.shape[2] - 2, x_ref.shape[3]
    co = w_ref.shape[-1] // 2
    scale = scale_ref[0]
    bias = bias_ref[0]
    r0 = pl.program_id(1) * row_chunk   # chunk's first row in padded coords

    def parity(rows, py, px):
        # im2col for output parity (py, px): 2x2 window at rows (i+a),
        # cols (j+px+b), a,b in {0,1} of the padded row slice
        # (layers.py:206-209). Channel-concat groups slices of EQUAL
        # column shift (same VMEM offsets — Mosaic concat requirement),
        # giving two (RC*W, 2Ci) x (2Ci, 2Co) matmuls.
        def half(b_tap, w_half):
            cols_ = jnp.concatenate(
                [rows[:-1, px + b_tap: px + b_tap + w_dim],
                 rows[1:, px + b_tap: px + b_tap + w_dim]],
                axis=-1)                     # (RC, W, 2*Ci)
            return jax.lax.dot_general(
                cols_.reshape(row_chunk * w_dim, 2 * ci), w_half,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (RC*W, 2*Co)

        w_par = w_ref[2 * py + px]
        y = half(0, w_par[0]) + half(1, w_par[1])
        y = y * scale + bias                 # folded eval-mode BN
        a, b = y[:, :co], y[:, co:]
        return (a * jax.nn.sigmoid(b)).reshape(row_chunk, w_dim, co)

    for py in (0, 1):
        # dynamic start on the UNTILED row dim (dims -2/-1 are the tiled
        # pair) — the one dynamic-slice form Mosaic supports on VMEM refs
        rows = x_ref[0, pl.ds(r0 + py, row_chunk + 1)]   # (RC+1, W+2, Ci)
        # Row+column interleave via strided sublane stores into the fp32
        # scratch (Mosaic rejects the (RC,W,2,Co)->(RC,2W,Co) shape-cast,
        # and pltpu.repeat has tile — not element-repeat — semantics).
        scratch_ref[py::2, 0::2, :] = parity(rows, py, 0)
        scratch_ref[py::2, 1::2, :] = parity(rows, py, 1)
    out_ref[0] = scratch_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upblock_call(x, wp, scale, bias, interpret):
    b, h, w_dim, ci = x.shape
    co = wp.shape[-1] // 2
    # chunk ~1024 input pixels per matmul: the resident padded-image block
    # dominates VMEM (~9 MB double-buffered at 128^2 x 64ch bf16 — the
    # Ci=64 lane dim pads to 128), leaving a few MB for the out blocks,
    # fp32 scratch, and kernel stack; must divide H
    row_chunk = max(1, min(h, 1024 // w_dim))
    while h % row_chunk:
        row_chunk -= 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_upblock_kernel, row_chunk=row_chunk),
        grid=(b, h // row_chunk),
        in_specs=[
            pl.BlockSpec((1, h + 2, w_dim + 2, ci),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, 2 * ci, 2 * co), lambda i, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * row_chunk, 2 * w_dim, co),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w_dim, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * row_chunk, 2 * w_dim, co), jnp.float32)],
        interpret=interpret,
    )(xp, wp, scale, bias)
    return out                                 # already standard NHWC


def upblock_pallas(
    x: jax.Array,            # (B, H, W, Ci)
    kernel: jax.Array,       # (3, 3, Ci, 2*Co) conv kernel (UpBlock param)
    bn_k: jax.Array,         # (2*Co,) folded BN scale: scale*rsqrt(var+eps)
    bn_b: jax.Array,         # (2*Co,) folded BN bias: bias - mean*k
    interpret: bool | None = None,
) -> jax.Array:
    """glu(bn_k * conv3x3(upsample_2x(x)) + bn_b) -> (B, 2H, 2W, Co)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wp = _parity_kernels(kernel.astype(jnp.float32)).astype(x.dtype)
    return _upblock_call(x, wp, bn_k.reshape(1, -1).astype(jnp.float32),
                         bn_b.reshape(1, -1).astype(jnp.float32), interpret)


def upblock_fused_eval(
    x: jax.Array,
    kernel: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """glu(bn_eval(conv3x3(upsample_2x(x)))) from raw BN stats.

    Equality-tested vs the XLA chain in tests/test_pallas_upblock.py.
    """
    k = bn_scale * jax.lax.rsqrt(bn_var + eps)
    b = bn_bias - bn_mean * k
    return upblock_pallas(x, kernel, k, b, interpret)
