"""Integer transform / dequantization kernels (JAX, TPU-first).

Bit-exact integer implementations of the H.264 inverse transforms,
batched over all 4x4 blocks of a frame so the work maps onto the VPU as
large elementwise tensor ops (the reference does this per-block in
scalar C/SIMD: decode_mb_aux.cpp IdctResAddPred_c, WelsLumaDcDequantIdct
in decode_slice.cpp:271-312; dequant tables common_tables.cpp
g_kuiDequantCoeff).

Layout convention: coefficient tensors are [N, 4, 4] int32 blocks in
RASTER order (zigzag already undone by the entropy layer).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Dequant scale V[qp%6][i] for 4x4 blocks (spec 8.5.9, flat default
# scaling): three distinct values per qp rem, by coefficient position.
# Positions (0,0),(0,2),(2,0),(2,2) -> v0; (1,1),(1,3),(3,1),(3,3) -> v1;
# others -> v2.
_V = np.array(
    [
        [10, 16, 13],
        [11, 18, 14],
        [13, 20, 16],
        [14, 23, 18],
        [16, 25, 20],
        [18, 29, 23],
    ],
    dtype=np.int32,
)

_POS_CLASS = np.zeros((4, 4), dtype=np.int32)
for _i in range(4):
    for _j in range(4):
        if (_i % 2 == 0) and (_j % 2 == 0):
            _POS_CLASS[_i, _j] = 0
        elif (_i % 2 == 1) and (_j % 2 == 1):
            _POS_CLASS[_i, _j] = 1
        else:
            _POS_CLASS[_i, _j] = 2

# dequant table [52, 4, 4]
_DEQUANT_4x4 = np.zeros((52, 4, 4), dtype=np.int32)
for _qp in range(52):
    _DEQUANT_4x4[_qp] = _V[_qp % 6][_POS_CLASS] << (_qp // 6)

DEQUANT_4x4 = jnp.asarray(_DEQUANT_4x4)


def dequant4x4(coeff: jax.Array, qp: jax.Array) -> jax.Array:
    """coeff: [N,4,4] int32 quantized; qp: [N] int32. Returns dequantized.

    Uses the flat (no scaling list) dequant path; scaling-list variants
    multiply per-position weights in (added with the pixel pipeline).
    """
    scale = DEQUANT_4x4[qp]  # [N,4,4]
    return coeff * scale


def _idct_1d(a0, a1, a2, a3):
    # H.264 4-point inverse core (integer, with >>1 semantics)
    e0 = a0 + a2
    e1 = a0 - a2
    e2 = (a1 >> 1) - a3
    e3 = a1 + (a3 >> 1)
    return e0 + e3, e1 + e2, e1 - e2, e0 - e3


def idct4x4(blocks: jax.Array) -> jax.Array:
    """Inverse 4x4 integer transform. blocks: [N,4,4] int32 (dequantized).

    Returns residuals [N,4,4] int32 (after the final (x+32)>>6 rounding).
    Bit-exact vs the scalar reference (IdctResAddPred_c).
    """
    b = blocks.astype(jnp.int32)
    # horizontal pass (operate on columns of each row vector)
    r0, r1, r2, r3 = _idct_1d(b[:, :, 0], b[:, :, 1], b[:, :, 2], b[:, :, 3])
    h = jnp.stack([r0, r1, r2, r3], axis=-1)  # [N,4,4] rows transformed
    # vertical pass
    c0, c1, c2, c3 = _idct_1d(h[:, 0, :], h[:, 1, :], h[:, 2, :], h[:, 3, :])
    v = jnp.stack([c0, c1, c2, c3], axis=-2)
    return (v + 32) >> 6


def hadamard4x4(dc: jax.Array) -> jax.Array:
    """Inverse 4x4 Hadamard for Intra16x16 luma DC. dc: [N,4,4] int32."""
    b = dc.astype(jnp.int32)

    def h1(a0, a1, a2, a3):
        e0 = a0 + a2
        e1 = a0 - a2
        e2 = a1 - a3
        e3 = a1 + a3
        return e0 + e3, e1 + e2, e1 - e2, e0 - e3

    r0, r1, r2, r3 = h1(b[:, :, 0], b[:, :, 1], b[:, :, 2], b[:, :, 3])
    h = jnp.stack([r0, r1, r2, r3], axis=-1)
    c0, c1, c2, c3 = h1(h[:, 0, :], h[:, 1, :], h[:, 2, :], h[:, 3, :])
    return jnp.stack([c0, c1, c2, c3], axis=-2)


def luma_dc_dequant(dc_transformed: jax.Array, qp: jax.Array) -> jax.Array:
    """Post-Hadamard DC dequant for I16 (spec 8.5.10)."""
    v0 = DEQUANT_4x4[qp][:, 0:1, 0:1]  # V[qp%6][0] << (qp//6)
    qp_ = qp.astype(jnp.int32)
    # ((c * V0) << (qp/6)) >> 8 with qp/6 already folded into V0; spec form:
    # dcY = (f * LevelScale(qp%6,0,0) << (qp/6)) >> 8 for qp >= 12 different
    # rounding; use the general formula:
    raw = dc_transformed * (DEQUANT_4x4[qp_ % 6][:, 0:1, 0:1])
    shift = qp_ // 6
    down = 2 - shift
    up = shift - 2
    pos = jnp.maximum(up, 0).reshape(-1, 1, 1)
    neg = jnp.maximum(down, 0).reshape(-1, 1, 1)
    rounded = (raw << pos)
    rounded = (rounded + ((1 << neg.clip(min=1)) >> 1) * (neg > 0)) >> neg
    return rounded


@functools.partial(jax.jit)
def recon_residual_frame(coeff_blocks: jax.Array, qp: jax.Array) -> jax.Array:
    """Dequant + IDCT over all 4x4 blocks of a frame — the decode hot path.

    coeff_blocks: [N, 4, 4] int32, qp: [N] int32 -> residual [N, 4, 4].
    """
    return idct4x4(dequant4x4(coeff_blocks, qp))
