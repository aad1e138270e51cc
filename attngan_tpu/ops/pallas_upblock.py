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

Output layout trick: the kernel writes (H, 2, 2W, C_out) blocks —
out[i, py, col, c] — so parity rows interleave via a FREE contiguous
reshape to (2H, 2W, C_out) in the caller; no strided stores.

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
    # (2, 2, Ci, Co) -> (4*Ci, Co), row-major (a, b, c) matching the kernel's
    # im2col concat order [(0,0), (0,1), (1,0), (1,1)]
    return jnp.stack([k.reshape(4 * ci, co) for k in (k00, k01, k10, k11)])


def _upblock_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                    row_chunk):
    """One grid cell = one image, row-chunked so the im2col/matmul
    intermediates stay small (full-image im2col at 128^2 x 4*64ch would
    blow the 16 MB VMEM). x (1, H, W, Ci); w (4, 4Ci, 2Co); scale/bias
    (1, 2Co) folded eval BN; out (1, H, 2, 2W, Co)."""
    h, w_dim, ci = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    co = w_ref.shape[-1] // 2
    x = x_ref[0]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))   # zero pad, (H+2, W+2, Ci)
    scale = scale_ref[0]
    bias = bias_ref[0]

    # static Python unroll over row chunks (<= 4 at reference sizes):
    # Mosaic has no dynamic_slice on VMEM-resident arrays, so all row
    # offsets must be trace-time constants.
    for ch in range(h // row_chunk):
        r0 = ch * row_chunk

        def parity(rows, py, px):
            # im2col for output parity (py, px): 2x2 window at rows (i+a),
            # cols (j+px+b), a,b in {0,1} of the padded row slice
            # (layers.py:206-209), channel-concatenated -> 4*Ci contraction.
            cols_ = jnp.concatenate(
                [rows[:-1, px: px + w_dim],
                 rows[:-1, px + 1: px + 1 + w_dim],
                 rows[1:, px: px + w_dim],
                 rows[1:, px + 1: px + 1 + w_dim]],
                axis=-1)                         # (RC, W, 4*Ci)
            y = jax.lax.dot_general(
                cols_.reshape(row_chunk * w_dim, 4 * ci), w_ref[2 * py + px],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (RC*W, 2*Co)
            y = y * scale + bias                 # folded eval-mode BN
            a, b = y[:, :co], y[:, co:]
            return (a * jax.nn.sigmoid(b)).astype(out_ref.dtype).reshape(
                row_chunk, w_dim, co)

        for py in (0, 1):
            rows = xp[r0 + py: r0 + py + row_chunk + 1]   # (RC+1, W+2, Ci)
            cols0 = parity(rows, py, 0)
            cols1 = parity(rows, py, 1)
            # column interleave: (RC, W, 2, Co) -> (RC, 2W, Co) row-major
            row_out = jnp.stack([cols0, cols1], axis=2).reshape(
                row_chunk, 2 * w_dim, co)
            out_ref[0, r0: r0 + row_chunk, py] = row_out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upblock_call(x, wp, scale, bias, interpret):
    b, h, w_dim, ci = x.shape
    co = wp.shape[-1] // 2
    # chunk ~4096 input pixels per matmul; must divide H
    row_chunk = max(1, min(h, 4096 // w_dim))
    while h % row_chunk:
        row_chunk -= 1
    out = pl.pallas_call(
        functools.partial(_upblock_kernel, row_chunk=row_chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w_dim, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * ci, 2 * co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, 2, 2 * w_dim, co),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, 2 * w_dim, co), x.dtype),
        interpret=interpret,
    )(x, wp, scale, bias)
    return out.reshape(b, 2 * h, 2 * w_dim, co)    # contiguous, free


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
