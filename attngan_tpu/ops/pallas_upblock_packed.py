"""Lane-packed fused Pallas kernel: nearest-2x-upsample -> conv3x3 -> BN(eval) -> GLU.

Redesign of ops/pallas_upblock.py for the generator tail's exact dims
(Ci=64 -> conv 64 -> GLU Co=32; reference utilities/layers.py:60-69). The
first kernel LOST in the full sampler (BENCH.md UpBlock table: 2,440 vs
4,015 img/s) for a measured reason: with Ci=64 the (H+2, W+2, 64) VMEM
block lane-pads 64 -> 128 (2x resident bytes and HBM->VMEM traffic), and
its matmuls run at N = 2*Co = 64 (half the MXU's output lanes idle). This
kernel removes both paddings by packing PAIRS OF ADJACENT COLUMNS into the
lane axis:

  input   (B, H+2, (W+2)/2, 2*Ci = 128)   -- 2 source columns per lane group
  output  (B, 2H,   2W/4,  4*Co = 128)    -- 4 output columns per lane group

Math: the exact 2x2 parity decomposition already proven for the unpacked
kernel (ops/layers.py::upsample_conv3x3_fused) — output pixel of parity
(py, px) at source column j reads padded source columns {j+px, j+px+1}
with the pairwise-summed 2x2 kernel. For one output ROW parity py and one
output column GROUP g (source columns 2g, 2g+1 -> output columns
4g..4g+3), the union of needed source columns is {2g..2g+3} = packed input
groups {g, g+1}. Each GLU half h is then ONE matmul per input group s:

  (RC*Wg, 256 = 2 row-taps x 128 packed lanes) @ (256, 128 = 4 cols x 32)

with the column-tap selection COMPILED INTO THE WEIGHTS (_packed_weights
zero-fills the taps a given output column does not read — 50% structural
zeros, the price of sharing one contraction across four output columns;
still ~2x fewer MXU cycles than the unpacked kernel's N=64 + lane-padded-K
matmuls). Eval-mode BN (folded scale/bias, pre-tiled to the packed lane
layout) and GLU a*sigmoid(b) are applied in registers between the two
matmul results — the GLU output is BORN in the packed layout, so the only
data movement left is the row-parity interleave through an fp32 scratch
(Mosaic strided stores are 32-bit only, as in the first kernel).

The packed HBM output is row-major identical to standard NHWC — lane group
(4 cols x Co) preserves the (col, channel) linear order — so the caller's
final reshape to (B, 2H, 2W, Co) is layout bookkeeping for XLA, not a
data-movement op authored here (XLA may still insert a retiling copy; the
A/B in BENCH.md measures through it).

Inference-only and forward-only, like the first kernel (train-mode BN
needs batch stats over the un-GLU'd conv output). Specialized to
2*Ci == 4*Co == 128; other dims raise and the caller falls back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _packed_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, 2*Co) conv kernel -> (2, 2, 2, 2*2*Ci, 4*Co) packed
    per-(row-parity py, input-group s, GLU-half h) matmul weights.

    K axis order = (row tap a, packed lane = column slot t * Ci + channel),
    matching the kernel's im2col concat; N axis order = (output column
    q in 0..3, output channel co). Entry nonzero iff the output column q
    (source col 2g + q//2, column parity q%2) actually reads padded source
    column 2g + 2s + t, i.e. its column tap b = (2s + t) - (q//2 + q%2)
    lands in {0, 1}."""
    ci, co2 = kernel.shape[2], kernel.shape[3]
    co = co2 // 2
    # pairwise row collapse (a-taps) per py, then column collapse per px —
    # identical algebra to ops/layers.py:193-202
    row = (jnp.stack([kernel[0], kernel[1] + kernel[2]], 0),
           jnp.stack([kernel[0] + kernel[1], kernel[2]], 0))
    kpp = [[jnp.stack([wk[:, 0], wk[:, 1] + wk[:, 2]], 1),
            jnp.stack([wk[:, 0] + wk[:, 1], wk[:, 2]], 1)]
           for wk in row]                       # [py][px] (2a, 2b, ci, co2)
    out = jnp.zeros((2, 2, 2, 2, 2, ci, 4, co), kernel.dtype)
    for py in (0, 1):
        for s in (0, 1):
            for h in (0, 1):
                for t in (0, 1):
                    for q in range(4):
                        b = (2 * s + t) - (q // 2 + q % 2)
                        if 0 <= b <= 1:
                            out = out.at[py, s, h, :, t, :, q, :].set(
                                kpp[py][q % 2][:, b, :,
                                               h * co:(h + 1) * co])
    return out.reshape(2, 2, 2, 4 * ci, 4 * co)


def _kernel(x_ref, w_ref, sc_ref, bi_ref, out_ref, scratch_ref, *,
            row_chunk):
    """One grid cell = one (image, row chunk): grid (B, H/RC).

    x (1, H+2, (W+2)/2, 128) packed + zero-padded (resident across the
    image's cells — the index map ignores the chunk axis); w (2, 2, 2,
    256, 128); sc/bi (2, 128) folded eval BN pre-tiled to packed lanes;
    out (1, 2*RC, Wg, 128) — a packed-layout slice of the final tensor;
    scratch (2*RC, Wg, 128) fp32 for the row-parity interleave."""
    wg = out_ref.shape[2]
    r0 = pl.program_id(1) * row_chunk
    for py in (0, 1):
        rows = x_ref[0, pl.ds(r0 + py, row_chunk + 1)]   # (RC+1, GP, 128)
        # im2col per input group s: lane concat of the two row taps (equal
        # sublane offset s on both — the Mosaic concat requirement)
        xins = [jnp.concatenate([rows[:-1, s:s + wg], rows[1:, s:s + wg]],
                                axis=-1).reshape(row_chunk * wg, 2 * LANES)
                for s in (0, 1)]
        ys = []
        for h in (0, 1):
            acc = None
            for s in (0, 1):
                part = jax.lax.dot_general(
                    xins[s], w_ref[py, s, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            ys.append(acc * sc_ref[h] + bi_ref[h])       # folded eval BN
        gl = ys[0] * jax.nn.sigmoid(ys[1])               # GLU, packed-born
        scratch_ref[py::2] = gl.reshape(row_chunk, wg, LANES)
    out_ref[0] = scratch_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upblock_call(xp, wp, sc, bi, interpret):
    b, hp, gp, _ = xp.shape                     # (B, H+2, (W+2)/2, 128)
    h, wg = hp - 2, gp - 1
    row_chunk = max(1, min(h, 1024 // (2 * wg)))
    while h % row_chunk:
        row_chunk -= 1
    out = pl.pallas_call(
        functools.partial(_kernel, row_chunk=row_chunk),
        grid=(b, h // row_chunk),
        in_specs=[
            pl.BlockSpec((1, hp, gp, LANES), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2, 2 * LANES, LANES),
                         lambda i, r: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * row_chunk, wg, LANES),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, wg, LANES), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * row_chunk, wg, LANES), jnp.float32)],
        interpret=interpret,
    )(xp, wp, sc, bi)
    return out


def upblock_pallas_packed(
    x: jax.Array,            # (B, H, W, Ci) with 2*Ci == 128
    kernel: jax.Array,       # (3, 3, Ci, 2*Co) with 4*Co == 128
    bn_k: jax.Array,         # (2*Co,) folded BN scale: scale*rsqrt(var+eps)
    bn_b: jax.Array,         # (2*Co,) folded BN bias: bias - mean*k
    interpret: bool | None = None,
) -> jax.Array:
    """glu(bn_k * conv3x3(upsample_2x(x)) + bn_b) -> (B, 2H, 2W, Co)."""
    b, h, w_dim, ci = x.shape
    co = kernel.shape[-1] // 2
    if 2 * ci != LANES or 4 * co != LANES:
        raise ValueError(f"packed kernel needs Ci=64, Co=32; got {ci}, {co}")
    if w_dim % 2 or h % 2:
        raise ValueError(f"even spatial dims required; got {h}x{w_dim}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(b, h + 2, (w_dim + 2) // 2, 2 * ci)
    wp = _packed_weights(kernel.astype(jnp.float32)).astype(x.dtype)
    sc = jnp.tile(bn_k.astype(jnp.float32).reshape(2, co), (1, 4))
    bi = jnp.tile(bn_b.astype(jnp.float32).reshape(2, co), (1, 4))
    out = _upblock_call(xp, wp, sc, bi, interpret)
    # packed (B, 2H, 2W/4, 4*Co) is row-major identical to (B, 2H, 2W, Co)
    return out.reshape(b, 2 * h, 2 * w_dim, co)
