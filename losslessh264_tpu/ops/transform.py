"""Integer transform / dequantization kernels (JAX, TPU-first, batched).

Bit-exact integer implementations of the H.264 inverse transforms,
batched over all blocks of a frame so the work maps onto the VPU as large
elementwise tensor ops (the reference does this per-block in scalar
C/SIMD: decode_mb_aux.cpp IdctResAddPred_c / IdctResAddPred8x8,
WelsLumaDcDequantIdct, decode_slice.cpp WelsChromaDcIdct; dequant tables
common_tables.cpp g_kuiDequantCoeff / g_kuiDequantCoeff8x8).

Every function is validated element-exact against the numpy oracle in
losslessh264_tpu/decoder_np.py (itself validated against the reference
decoder's YUV output).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import decoder_np as _np_ref

# dequant scale tables — NUMPY at module scope: numpy closures bake in
# as trace-time program constants; captured jax Arrays become runtime
# buffer arguments pinned to live device allocations. Convert with
# jnp.asarray at the traced-index use sites.
DEQ4_V = np.asarray(_np_ref._V4[:, _np_ref._POS4])           # [6,4,4]
DEQ8_V = np.asarray(_np_ref._V8[:, _np_ref._POS8])           # [6,8,8]
CHROMA_QP = np.asarray(_np_ref.CHROMA_QP)


def dequant4(coeff: jax.Array, qp: jax.Array, weights: jax.Array) -> jax.Array:
    """coeff [..,4,4] int, qp [..] int, weights [..,4,4] (16 = flat).

    Returns dequantized int32 levels (spec 8.5.9 general form).
    """
    qp = qp.astype(jnp.int32)
    ls = weights * jnp.asarray(DEQ4_V)[qp % 6]
    c = coeff.astype(jnp.int32) * ls
    qdiv = (qp // 6)[..., None, None]
    hi = c << jnp.maximum(qdiv - 4, 0)
    shift = jnp.maximum(4 - qdiv, 0)
    lo = (c + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qdiv >= 4, hi, lo)


def dequant8(coeff: jax.Array, qp: jax.Array, weights: jax.Array) -> jax.Array:
    qp = qp.astype(jnp.int32)
    ls = weights * jnp.asarray(DEQ8_V)[qp % 6]
    c = coeff.astype(jnp.int32) * ls
    qdiv = (qp // 6)[..., None, None]
    hi = c << jnp.maximum(qdiv - 6, 0)
    shift = jnp.maximum(6 - qdiv, 0)
    lo = (c + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qdiv >= 6, hi, lo)


def _idct4_1d(a0, a1, a2, a3):
    e0 = a0 + a2
    e1 = a0 - a2
    e2 = (a1 >> 1) - a3
    e3 = a1 + (a3 >> 1)
    return e0 + e3, e1 + e2, e1 - e2, e0 - e3


def idct4x4(blocks: jax.Array) -> jax.Array:
    """[..,4,4] dequantized int32 -> residual int32 (incl. (x+32)>>6)."""
    b = blocks.astype(jnp.int32)
    r = _idct4_1d(b[..., 0], b[..., 1], b[..., 2], b[..., 3])
    h = jnp.stack(r, axis=-1)
    c = _idct4_1d(h[..., 0, :], h[..., 1, :], h[..., 2, :], h[..., 3, :])
    v = jnp.stack(c, axis=-2)
    return (v + 32) >> 6


def hadamard4x4(dc: jax.Array) -> jax.Array:
    """Inverse 4x4 Hadamard for I16 luma DC. [..,4,4] -> [..,4,4]."""
    b = dc.astype(jnp.int32)

    def h1_last(a):
        e0 = a[..., 0] + a[..., 2]
        e1 = a[..., 0] - a[..., 2]
        e2 = a[..., 1] - a[..., 3]
        e3 = a[..., 1] + a[..., 3]
        return jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)

    h = h1_last(b)                      # transform rows (last axis)
    v = h1_last(jnp.swapaxes(h, -1, -2))
    return jnp.swapaxes(v, -1, -2)


def idct8x8(blocks: jax.Array) -> jax.Array:
    """[..,8,8] dequantized -> residual (spec 8.5.12.2)."""
    b = blocks.astype(jnp.int32)

    def core_last(a):
        a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        a4, a5, a6, a7 = a[..., 4], a[..., 5], a[..., 6], a[..., 7]
        e0 = a0 + a4
        e1 = -a3 + a5 - a7 - (a7 >> 1)
        e2 = a0 - a4
        e3 = a1 + a7 - a3 - (a3 >> 1)
        e4 = (a2 >> 1) - a6
        e5 = -a1 + a7 + a5 + (a5 >> 1)
        e6 = a2 + (a6 >> 1)
        e7 = a3 + a5 + a1 + (a1 >> 1)
        f0 = e0 + e6
        f1 = e1 + (e7 >> 2)
        f2 = e2 + e4
        f3 = e3 + (e5 >> 2)
        f4 = e2 - e4
        f5 = (e3 >> 2) - e5
        f6 = e0 - e6
        f7 = e7 - (e1 >> 2)
        return jnp.stack([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                          f6 - f1, f4 - f3, f2 - f5, f0 - f7], axis=-1)

    h = core_last(b)
    v = core_last(jnp.swapaxes(h, -1, -2))
    return (jnp.swapaxes(v, -1, -2) + 32) >> 6


def luma_dc_dequant(dc_t: jax.Array, qp: jax.Array, w00: jax.Array) -> jax.Array:
    """Post-Hadamard I16 DC dequant (8.5.10). dc_t [..,4,4], qp [..]."""
    qp = qp.astype(jnp.int32)
    scale = (w00 * jnp.asarray(DEQ4_V)[qp % 6][..., 0, 0])[..., None, None]
    qdiv = (qp // 6)[..., None, None]
    hi = (dc_t * scale) << jnp.maximum(qdiv - 6, 0)
    shift = jnp.maximum(6 - qdiv, 0)
    lo = (dc_t * scale + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qdiv >= 6, hi, lo)


def chroma_dc_transform_dequant(dc: jax.Array, qpc: jax.Array,
                                w00: jax.Array) -> jax.Array:
    """2x2 inverse Hadamard + dequant (8.5.11). dc [..,2,2], qpc [..]."""
    a = dc[..., 0, 0].astype(jnp.int32)
    b = dc[..., 0, 1].astype(jnp.int32)
    c = dc[..., 1, 0].astype(jnp.int32)
    d = dc[..., 1, 1].astype(jnp.int32)
    t = jnp.stack([jnp.stack([a + b + c + d, a - b + c - d], -1),
                   jnp.stack([a + b - c - d, a - b - c + d], -1)], -2)
    qpc = qpc.astype(jnp.int32)
    scale = (w00 * jnp.asarray(DEQ4_V)[qpc % 6][..., 0, 0])[..., None, None]
    return ((t * scale) << (qpc // 6)[..., None, None]) >> 5


# ---------------------------------------------------------------------------
# Position-major kernels: the block-position axis is the MAJOR dim and
# the batch rides the LANE dim ([16, B] / [64, B]), so every butterfly
# line is one full-width VPU op on a contiguous row. The [.., 4, 4]
# formulations above slice 4-wide minor axes, which Mosaic must relayout
# around every op (measured ~14 ms for the 720p residual path; the
# position-major path is the same math with two transposes total).
# ---------------------------------------------------------------------------
def dequant4_pm(coeff_pm, qp_b, w_pm):
    """coeff_pm [16, B] int, qp_b [B] int, w_pm [16, B] weights."""
    qp_b = qp_b.astype(jnp.int32)
    deq = jnp.asarray(DEQ4_V.reshape(6, 16).T)          # [16, 6]
    ls = w_pm * jnp.take(deq, qp_b % 6, axis=1)          # [16, B]
    c = coeff_pm.astype(jnp.int32) * ls
    qdiv = (qp_b // 6)[None, :]
    hi = c << jnp.maximum(qdiv - 4, 0)
    shift = jnp.maximum(4 - qdiv, 0)
    lo = (c + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qdiv >= 4, hi, lo)


def idct4x4_pm(x):
    """Position-major 4x4 inverse core transform: [16, B] -> [16, B]
    (raster positions p = 4*row + col), incl. the (v+32)>>6."""
    h = [None] * 16
    for r in range(4):
        a0, a1, a2, a3 = (x[4 * r + c] for c in range(4))
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = (a1 >> 1) - a3, a1 + (a3 >> 1)
        h[4 * r + 0], h[4 * r + 1] = e0 + e3, e1 + e2
        h[4 * r + 2], h[4 * r + 3] = e1 - e2, e0 - e3
    v = [None] * 16
    for c in range(4):
        a0, a1, a2, a3 = (h[4 * r + c] for r in range(4))
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = (a1 >> 1) - a3, a1 + (a3 >> 1)
        v[0 * 4 + c], v[1 * 4 + c] = e0 + e3, e1 + e2
        v[2 * 4 + c], v[3 * 4 + c] = e1 - e2, e0 - e3
    return (jnp.stack(v) + 32) >> 6


def dequant8_pm(coeff_pm, qp_b, w_pm):
    """coeff_pm [64, B], qp_b [B], w_pm [64, B]."""
    qp_b = qp_b.astype(jnp.int32)
    deq = jnp.asarray(DEQ8_V.reshape(6, 64).T)          # [64, 6]
    ls = w_pm * jnp.take(deq, qp_b % 6, axis=1)
    c = coeff_pm.astype(jnp.int32) * ls
    qdiv = (qp_b // 6)[None, :]
    hi = c << jnp.maximum(qdiv - 6, 0)
    shift = jnp.maximum(6 - qdiv, 0)
    lo = (c + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.where(qdiv >= 6, hi, lo)


def idct8x8_pm(x):
    """Position-major 8x8 inverse transform [64, B] -> [64, B]."""
    def core(a):
        e0 = a[0] + a[4]
        e1 = -a[3] + a[5] - a[7] - (a[7] >> 1)
        e2 = a[0] - a[4]
        e3 = a[1] + a[7] - a[3] - (a[3] >> 1)
        e4 = (a[2] >> 1) - a[6]
        e5 = -a[1] + a[7] + a[5] + (a[5] >> 1)
        e6 = a[2] + (a[6] >> 1)
        e7 = a[3] + a[5] + a[1] + (a[1] >> 1)
        f0, f1 = e0 + e6, e1 + (e7 >> 2)
        f2, f3 = e2 + e4, e3 + (e5 >> 2)
        f4, f5 = e2 - e4, (e3 >> 2) - e5
        f6, f7 = e0 - e6, e7 - (e1 >> 2)
        return [f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                f6 - f1, f4 - f3, f2 - f5, f0 - f7]

    h = [None] * 64
    for r in range(8):
        out = core([x[8 * r + c] for c in range(8)])
        for c in range(8):
            h[8 * r + c] = out[c]
    v = [None] * 64
    for c in range(8):
        out = core([h[8 * r + c] for r in range(8)])
        for r in range(8):
            v[8 * r + c] = out[r]
    return (jnp.stack(v) + 32) >> 6


def hadamard4x4_pm(x):
    """Position-major inverse 4x4 Hadamard [16, B] -> [16, B]."""
    h = [None] * 16
    for r in range(4):
        a0, a1, a2, a3 = (x[4 * r + c] for c in range(4))
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = a1 - a3, a1 + a3
        h[4 * r + 0], h[4 * r + 1] = e0 + e3, e1 + e2
        h[4 * r + 2], h[4 * r + 3] = e1 - e2, e0 - e3
    v = [None] * 16
    for c in range(4):
        a0, a1, a2, a3 = (h[4 * r + c] for r in range(4))
        e0, e1 = a0 + a2, a0 - a2
        e2, e3 = a1 - a3, a1 + a3
        v[0 * 4 + c], v[1 * 4 + c] = e0 + e3, e1 + e2
        v[2 * 4 + c], v[3 * 4 + c] = e1 - e2, e0 - e3
    return jnp.stack(v)


def fdct4x4_pm(x):
    """Position-major forward 4x4 core transform [16, B] -> [16, B]."""
    h = [None] * 16
    for r in range(4):
        a0, a1, a2, a3 = (x[4 * r + c] for c in range(4))
        s0, s1, d0, d1 = a0 + a3, a1 + a2, a0 - a3, a1 - a2
        h[4 * r + 0], h[4 * r + 1] = s0 + s1, 2 * d0 + d1
        h[4 * r + 2], h[4 * r + 3] = s0 - s1, d0 - 2 * d1
    v = [None] * 16
    for c in range(4):
        a0, a1, a2, a3 = (h[4 * r + c] for r in range(4))
        s0, s1, d0, d1 = a0 + a3, a1 + a2, a0 - a3, a1 - a2
        v[0 * 4 + c], v[1 * 4 + c] = s0 + s1, 2 * d0 + d1
        v[2 * 4 + c], v[3 * 4 + c] = s0 - s1, d0 - 2 * d1
    return jnp.stack(v)


def quant4_pm(W_pm, qp_b, intra, skip_dc: bool = False,
              rd_lam: int | None = None):
    """Position-major quantization. W_pm [16, B] int32, qp_b [B],
    intra bool/[B]. |W|*mf stays < 2^31 (|W| <= 9180, mf <= 13107).

    rd_lam != None enables TRELLIS-LITE rate-aware rounding (reference
    analog: RDO quantization the encoder lacks vs encode_mb_aux.cpp's
    plain deadzone — the BA1 RD gap, VERDICT r4 #5): per coefficient,
    decrementing the level costs distortion DeltaD = (2u + S)*S (u =
    reconstruction error in t = |W|*mf units, S = 2^qbits) and saves
    DeltaR bits (~3/Z for Z >= 2; ~4 for zeroing a 1 — level + run/EOB
    structure). Because MF folds the transform basis norms and
    lambda ~ Qstep^2, the decision normalizes to the QP-INVARIANT test
      s < (rd_lam * DeltaR - 1) / 2,     s = u / S  in [-1/3, 5/6)
    computed in 1/256 fixed point; rd_lam is the dimensionless lambda
    (x256). Vectorized 2-candidate choice — no sequential trellis."""
    qp_b = jnp.asarray(qp_b, jnp.int32)
    qbits = (15 + qp_b // 6)[None, :]
    base = jnp.left_shift(1, qbits)
    f = jnp.where(jnp.asarray(intra), base // 3, base // 6)
    mf = jnp.take(jnp.asarray(MF4_V.reshape(6, 16).T.astype(np.int32)),
                  qp_b % 6, axis=1)                      # [16, B]
    t = jnp.abs(W_pm) * mf
    Z = jnp.right_shift(t + f, qbits)
    if rd_lam is not None:
        # u in t-units; s256 = 256 * u / 2^qbits (arithmetic shifts)
        u = t - jnp.left_shift(Z, qbits)
        s256 = jnp.right_shift(jnp.left_shift(u, 8), qbits)
        # only level-1 coefficients are candidates: zeroing them saves
        # the level AND its run/EOB structure (the real trellis win);
        # decrementing Z >= 2 measured equivalent-or-worse than simply
        # raising QP (it is just coarser quantization). High-frequency
        # positions save more run bits -> higher DeltaR.
        pos = jnp.arange(16, dtype=jnp.int32)[:, None]
        dr256 = jnp.where(Z == 1, 3 * 256 + pos * 48, 0)
        thr256 = (jnp.right_shift(rd_lam * dr256, 8) - 256) // 2
        Z = jnp.where((Z >= 1) & (s256 < thr256), Z - 1, Z)
    Z = jnp.sign(W_pm) * Z
    if skip_dc:
        Z = Z.at[0].set(0)
    return Z


# ---------------------------------------------------------------------------
# Whole-frame residual assembly: the decode hot path, fully batched.
# ---------------------------------------------------------------------------
def luma_residuals(mb_class, qp, cbp_luma, transform8, luma_ac, luma_dc,
                   luma8, w4_intra, w4_inter, w8_intra, w8_inter):
    """Per-MB luma residual [n,16,16] int32.

    mb_class/qp/cbp_luma/transform8: [n]; luma_ac [n,16,4,4];
    luma_dc [n,4,4]; luma8 [n,4,8,8]; w*: [4,4]/[8,8] weight matrices.
    """
    n = mb_class.shape[0]
    is_i16 = mb_class == 1
    is_intra = (mb_class == 0) | (mb_class == 1) | (mb_class == 2)
    t8 = (transform8 != 0) & ~is_i16

    w4 = jnp.where(is_intra[:, None, None], w4_intra, w4_inter)
    # 4x4 path, position-major: [16, B] with B = n*16 blocks
    B = n * 16
    ac_pm = luma_ac.reshape(B, 16).T.astype(jnp.int32)       # [16, B]
    qp_b = jnp.repeat(qp.astype(jnp.int32), 16)
    w4_pm = jnp.repeat(w4.reshape(n, 16).T, 16, axis=1)      # [16, B]
    deq = dequant4_pm(ac_pm, qp_b, w4_pm)                    # [16, B]
    dct = hadamard4x4_pm(luma_dc.reshape(n, 16).T.astype(jnp.int32))
    # post-Hadamard I16 DC dequant (8.5.10), position-major [16, n]
    qpn = qp.astype(jnp.int32)
    scale = (w4_intra[0, 0] *
             jnp.asarray(DEQ4_V)[qpn % 6][..., 0, 0])[None, :]   # [1, n]
    qdiv = (qpn // 6)[None, :]
    shift = jnp.maximum(6 - qdiv, 0)
    dcd = jnp.where(qdiv >= 6,
                    (dct * scale) << jnp.maximum(qdiv - 6, 0),
                    (dct * scale + (1 << jnp.maximum(shift - 1, 0)))
                    >> shift)                                # [16, n]
    # substitute DC into position 0 for I16 MBs
    deq = deq.at[0].set(jnp.where(jnp.repeat(is_i16, 16),
                                  dcd.T.reshape(B), deq[0]))
    res4 = idct4x4_pm(deq)                                   # [16, B]
    # cbp gating per 8x8 (I16 ignores cbp for DC but AC already zero if
    # uncoded, and DC substitution applies regardless)
    blk_idx = jnp.arange(16)
    b8_of_blk = (blk_idx // 4 // 2) * 2 + (blk_idx % 4) // 2
    coded4 = ((cbp_luma[:, None] >> b8_of_blk[None, :]) & 1) != 0
    coded4 = (coded4 | is_i16[:, None]).reshape(B)
    res4 = jnp.where(coded4[None, :], res4, 0)
    out4 = (res4.T.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4)
            .reshape(n, 16, 16))

    # 8x8 path, position-major: [64, B8] with B8 = n*4
    w8 = jnp.where(is_intra[:, None, None], w8_intra, w8_inter)
    B8 = n * 4
    l8_pm = luma8.reshape(B8, 64).T.astype(jnp.int32)
    qp8 = jnp.repeat(qp.astype(jnp.int32), 4)
    w8_pm = jnp.repeat(w8.reshape(n, 64).T, 4, axis=1)
    res8 = idct8x8_pm(dequant8_pm(l8_pm, qp8, w8_pm))        # [64, B8]
    coded8 = (((cbp_luma[:, None] >> jnp.arange(4)[None, :]) & 1) != 0) \
        .reshape(B8)
    res8 = jnp.where(coded8[None, :], res8, 0)
    out8 = (res8.T.reshape(n, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4)
            .reshape(n, 16, 16))
    return jnp.where(t8[:, None, None], out8, out4)


def chroma_residuals(mb_class, qp, cbp_chroma, chroma_ac, chroma_dc,
                     chroma_qp_offset, second_chroma_qp_offset,
                     w4_u_intra, w4_v_intra, w4_u_inter, w4_v_inter):
    """Per-MB chroma residuals ([n,8,8] u, [n,8,8] v)."""
    n = mb_class.shape[0]
    is_intra = (mb_class == 0) | (mb_class == 1) | (mb_class == 2)
    qp = qp.astype(jnp.int32)
    outs = []
    for c in range(2):
        off = chroma_qp_offset if c == 0 else second_chroma_qp_offset
        qpc = jnp.asarray(CHROMA_QP)[jnp.clip(qp + off, 0, 51)]
        w = jnp.where(is_intra[:, None, None],
                      w4_u_intra if c == 0 else w4_v_intra,
                      w4_u_inter if c == 0 else w4_v_inter)
        dcd = chroma_dc_transform_dequant(chroma_dc[:, c], qpc, w[:, 0, 0])
        # position-major 4x4 path over Bc = n*4 chroma blocks
        Bc = n * 4
        ac_pm = (chroma_ac[:, c * 4:(c + 1) * 4].reshape(Bc, 16).T
                 .astype(jnp.int32))
        qpc_b = jnp.repeat(qpc, 4)
        w_pm = jnp.repeat(w.reshape(n, 16).T, 4, axis=1)
        deq = dequant4_pm(ac_pm, qpc_b, w_pm)            # [16, Bc]
        has_ac = jnp.repeat(cbp_chroma == 2, 4)
        deq = jnp.where(has_ac[None, :], deq, 0)
        has_dc = jnp.repeat(cbp_chroma != 0, 4)
        deq = deq.at[0].set(jnp.where(has_dc, dcd.reshape(Bc), deq[0]))
        res = idct4x4_pm(deq)
        res = jnp.where((has_dc | has_ac)[None, :], res, 0)
        out = (res.T.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4)
               .reshape(n, 8, 8))
        outs.append(out)
    return outs[0], outs[1]


@jax.jit
def recon_residual_frame(coeff_blocks: jax.Array, qp: jax.Array) -> jax.Array:
    """Dequant + IDCT over 4x4 blocks (flat weights) — used by bench/entry."""
    w = jnp.full((4, 4), 16, jnp.int32)
    return idct4x4(dequant4(coeff_blocks, qp, w))


# ---------------------------------------------------------------------------
# Forward path (encoder): batched DCT / Hadamard / quantization.
# Element-exact vs the numpy oracle in losslessh264_tpu/encoder.py
# (reference behavior: encoder/core encode_mb_aux.cpp WelsDctMb /
# WelsQuant4x4 / WelsHadamardT4Dc and the MF quant multiplier tables).
# ---------------------------------------------------------------------------
# quant multipliers MF[qp%6] expanded per coefficient position (same
# positional-class layout as the dequant _POS4 table)
MF4_V = np.array([[13107, 5243, 8066],
                  [11916, 4660, 7490],
                  [10082, 4194, 6554],
                  [9362, 3647, 5825],
                  [8192, 3355, 5243],
                  [7282, 2893, 4559]],
                 np.int64)[:, _np_ref._POS4]  # [6,4,4] (numpy, see above)
ZZ4 = np.asarray(_np_ref._ZZ4)  # [16] raster index per zigzag position


def fdct4x4(blocks: jax.Array) -> jax.Array:
    """Forward 4x4 core transform, batched. [..,4,4] int -> [..,4,4] int32."""
    b = blocks.astype(jnp.int32)

    def core_last(a):
        s0 = a[..., 0] + a[..., 3]
        s1 = a[..., 1] + a[..., 2]
        d0 = a[..., 0] - a[..., 3]
        d1 = a[..., 1] - a[..., 2]
        return jnp.stack([s0 + s1, 2 * d0 + d1, s0 - s1, d0 - 2 * d1], axis=-1)

    h = core_last(b)
    v = core_last(jnp.swapaxes(h, -1, -2))
    return jnp.swapaxes(v, -1, -2)


def quant4(W: jax.Array, qp: jax.Array, intra, skip_dc: bool = False):
    """Quantize transformed 4x4 blocks. W [..,4,4], qp [..] (broadcast),
    intra [..] bool or python bool. Returns int32 levels."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    base = jnp.left_shift(1, qbits)
    f = jnp.where(jnp.asarray(intra), base // 3, base // 6)
    mf = jnp.asarray(MF4_V)[qp % 6]  # [..,4,4]
    Wl = W.astype(jnp.int64)
    Z = jnp.right_shift(jnp.abs(Wl) * mf + f[..., None, None].astype(jnp.int64),
                        qbits[..., None, None]).astype(jnp.int32)
    Z = jnp.sign(W).astype(jnp.int32) * Z
    if skip_dc:
        Z = Z.at[..., 0, 0].set(0)
    return Z


def fhadamard4x4(X: jax.Array) -> jax.Array:
    """Forward 4x4 Hadamard of I16 luma DC terms (with //2), batched."""
    b = X.astype(jnp.int64)

    def h_last(a):
        s0 = a[..., 0] + a[..., 3]
        s1 = a[..., 1] + a[..., 2]
        d0 = a[..., 0] - a[..., 3]
        d1 = a[..., 1] - a[..., 2]
        return jnp.stack([s0 + s1, d0 + d1, s0 - s1, d0 - d1], axis=-1)

    h = h_last(b)
    v = h_last(jnp.swapaxes(h, -1, -2))
    return jnp.swapaxes(v, -1, -2) // 2


def quant_dc4(Yd: jax.Array, qp: jax.Array) -> jax.Array:
    """Quantize Hadamard-transformed I16 luma DC [..,4,4]; qp [..]."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    f = jnp.left_shift(1, qbits) // 3
    mf = jnp.asarray(MF4_V)[qp % 6][..., 0, 0]  # [..] class-0 multiplier
    num = (jnp.abs(Yd.astype(jnp.int64)) * mf[..., None, None].astype(jnp.int64)
           + 2 * f[..., None, None].astype(jnp.int64))
    Z = jnp.right_shift(num, (qbits + 1)[..., None, None]).astype(jnp.int32)
    return jnp.sign(Yd).astype(jnp.int32) * Z


def fhadamard2x2(X: jax.Array) -> jax.Array:
    """Forward 2x2 Hadamard of chroma DC terms [..,2,2] (no scaling)."""
    a = X[..., 0, 0].astype(jnp.int64)
    b = X[..., 0, 1].astype(jnp.int64)
    c = X[..., 1, 0].astype(jnp.int64)
    d = X[..., 1, 1].astype(jnp.int64)
    return jnp.stack([jnp.stack([a + b + c + d, a - b + c - d], -1),
                      jnp.stack([a + b - c - d, a - b - c + d], -1)], -2)


def quant_dc2(Yd: jax.Array, qpc: jax.Array) -> jax.Array:
    """Quantize 2x2 chroma DC [..,2,2]; qpc [..]."""
    return quant_dc4(Yd, qpc)


def zigzag4(blocks: jax.Array) -> jax.Array:
    """[..,4,4] -> [..,16] in zigzag scan order."""
    flat = blocks.reshape(blocks.shape[:-2] + (16,))
    return flat[..., ZZ4]
