"""Motion compensation kernels (JAX, TPU-first, batched).

Quarter-pel 6-tap luma + eighth-pel bilinear chroma interpolation,
batched over every inter 4x4 cell of a frame: windows are gathered from
the padded reference stack, all fractional cases are computed vectorized
and selected per cell (branch-free — the TPU way; the reference does
per-block scalar dispatch in mc.cpp McLuma_c/McChroma_c + SIMD).

Element-exact vs decoder_np.mc_luma_block / mc_chroma_block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sixtap(a, b, c, d, e, f):
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


def mc_luma_cells(ref_stack: jax.Array, pad: int, ref_idx: jax.Array,
                  y0: jax.Array, x0: jax.Array, mvx: jax.Array,
                  mvy: jax.Array) -> jax.Array:
    """ref_stack [R, H+2p, W+2p] uint8; per-cell vectors [B]. Returns
    [B,4,4] int32 predicted samples.

    Windows are fetched with ONE flat batched gather (a vmapped
    dynamic_slice lowers to a serial per-cell loop on TPU); all
    fractional cases are then computed vectorized over the batch."""
    h = w = 4

    # reference BaseMC clips iFullMV into the padded window (rec_mb.cpp:
    # CLIP3 to [(-PADDING_LENGTH+2)<<2, (dim+PADDING_LENGTH-19)<<2])
    R, Hp, Wp = ref_stack.shape
    H = Hp - 2 * pad
    W = Wp - 2 * pad

    r = ref_idx.astype(jnp.int32)
    cy = y0.astype(jnp.int32)
    cx = x0.astype(jnp.int32)
    vx = mvx.astype(jnp.int32)
    vy = mvy.astype(jnp.int32)
    fullx = jnp.clip((cx << 2) + vx, (-pad + 2) << 2, (W + pad - 19) << 2)
    fully = jnp.clip((cy << 2) + vy, (-pad + 2) << 2, (H + pad - 19) << 2)
    ix = fullx >> 2
    iy = fully >> 2
    fx_b = fullx & 3
    fy_b = fully & 3
    flat = ref_stack.reshape(-1)
    o9 = jnp.arange(h + 5)
    idx = ((r * Hp + (pad + iy - 2))[:, None, None] + o9[None, :, None]) \
        * Wp + (pad + ix - 2)[:, None, None] + o9[None, None, :]
    wins = flat[idx].astype(jnp.int32)                     # [B, 9, 9]

    def one(win, fx, fy):
        G = win[2:2 + h, 2:2 + w]
        b_full = _sixtap(win[:, 0:w], win[:, 1:w + 1], win[:, 2:w + 2],
                         win[:, 3:w + 3], win[:, 4:w + 4], win[:, 5:w + 5])
        b = jnp.clip((b_full[2:2 + h] + 16) >> 5, 0, 255)
        h_full = _sixtap(win[0:h, :], win[1:h + 1, :], win[2:h + 2, :],
                         win[3:h + 3, :], win[4:h + 4, :], win[5:h + 5, :])
        hh = jnp.clip((h_full[:, 2:2 + w] + 16) >> 5, 0, 255)
        j_full = _sixtap(b_full[0:h], b_full[1:h + 1], b_full[2:h + 2],
                         b_full[3:h + 3], b_full[4:h + 4], b_full[5:h + 5])
        j = jnp.clip((j_full + 512) >> 10, 0, 255)
        G1 = win[2:2 + h, 3:3 + w]
        H1 = win[3:3 + h, 2:2 + w]
        b1 = jnp.clip((b_full[3:3 + h] + 16) >> 5, 0, 255)
        hh1 = jnp.clip((h_full[:, 3:3 + w] + 16) >> 5, 0, 255)

        bb = jnp.where(fy == 1, b, b1)        # nearest b row for quarter-diag
        hhh = jnp.where(fx == 1, hh, hh1)
        case_fy0 = jnp.where(fx == 0, G,
                    jnp.where(fx == 1, (G + b + 1) >> 1,
                     jnp.where(fx == 2, b, (G1 + b + 1) >> 1)))
        case_fx0 = jnp.where(fy == 1, (G + hh + 1) >> 1,
                    jnp.where(fy == 2, hh, (H1 + hh + 1) >> 1))
        case_fx2 = jnp.where(fy == 2, j,
                    jnp.where(fy == 1, (b + j + 1) >> 1, (b1 + j + 1) >> 1))
        case_fy2 = jnp.where(fx == 1, (hh + j + 1) >> 1, (hh1 + j + 1) >> 1)
        diag = (bb + hhh + 1) >> 1
        out = jnp.where(fy == 0, case_fy0,
               jnp.where(fx == 0, case_fx0,
                jnp.where(fx == 2, case_fx2,
                 jnp.where(fy == 2, case_fy2, diag))))
        return out

    return jax.vmap(one)(wins, fx_b, fy_b)


def halfpel_planes(ref_pad: jax.Array) -> jax.Array:
    """Precompute the four H.264 half-pel planes of a padded reference.

    ref_pad: [Hp, Wp] (uint8/int32) edge-padded reference plane.
    Returns [4, Hp-5, Wp-5] int32 stacked planes (G, b, h, j) aligned so
    reference position (y, x) maps to planes[:, y-2, x-2]:
      G = integer samples, b = (y, x+1/2), h = (y+1/2, x), j = both.

    This is the TPU-native replacement for per-block 6-tap interpolation
    during motion search: three full-plane FIR filters once per frame,
    then every candidate prediction is a slice + average (mc.cpp
    McHorVer* per-block dispatch in the reference).
    """
    # shifted-slice int32 formulation. Two attempted variants both
    # REJECTED on measurement: an MXU conv path (62 vs 48 ms at 720p,
    # and inexact — the TPU conv truncates f32 inputs through bf16,
    # which cannot hold the 6-tap sums) and an int16-plane path
    # (component-exact in isolation but miscompiles inside the fused
    # encoder program: encoder recon drifted from the decoder on
    # P8x8 content, reproducibly, CPU backend included).
    r = ref_pad.astype(jnp.int32)
    bf = _sixtap(r[:, 0:-5], r[:, 1:-4], r[:, 2:-3], r[:, 3:-2], r[:, 4:-1],
                 r[:, 5:])                              # [Hp, Wp-5] < 2^14
    b = jnp.clip((bf + 16) >> 5, 0, 255)
    hf = _sixtap(r[0:-5, :], r[1:-4, :], r[2:-3, :], r[3:-2, :], r[4:-1, :],
                 r[5:, :])                              # [Hp-5, Wp]
    h = jnp.clip((hf + 16) >> 5, 0, 255)
    jf = _sixtap(bf[0:-5], bf[1:-4], bf[2:-3], bf[3:-2], bf[4:-1], bf[5:])
    j = jnp.clip((jf + 512) >> 10, 0, 255)              # [Hp-5, Wp-5]
    return jnp.stack([r[2:-3, 2:-3], b[2:-3, :], h[:, 2:-3], j])


def _hp_kernel(TH, r_ref, out_ref):
    """One output row-tile of the three 6-tap FIRs: slices a [TH+5, Wp]
    strip of the VMEM-resident plane, emits [4, TH, Wp-5] (G, b, h, j)
    aligned as halfpel_planes' stack."""
    from jax.experimental import pallas as pl

    d = pl.program_id(0)
    x = r_ref[pl.ds(d * TH, TH + 5), :].astype(jnp.int32)  # [TH+5, Wp]
    bf = _sixtap(x[:, 0:-5], x[:, 1:-4], x[:, 2:-3], x[:, 3:-2],
                 x[:, 4:-1], x[:, 5:])                 # [TH+5, Wp-5]
    out_ref[0] = x[2:2 + TH, 2:-3]
    out_ref[1] = jnp.clip((bf[2:2 + TH] + 16) >> 5, 0, 255)
    hf = _sixtap(x[0:TH, 2:-3], x[1:TH + 1, 2:-3], x[2:TH + 2, 2:-3],
                 x[3:TH + 3, 2:-3], x[4:TH + 4, 2:-3], x[5:TH + 5, 2:-3])
    out_ref[2] = jnp.clip((hf + 16) >> 5, 0, 255)
    jf = _sixtap(bf[0:TH], bf[1:TH + 1], bf[2:TH + 2], bf[3:TH + 3],
                 bf[4:TH + 4], bf[5:TH + 5])
    out_ref[3] = jnp.clip((jf + 512) >> 10, 0, 255)


def halfpel_planes_pallas(ref_pad: jax.Array, tile_h: int = 64):
    """Pallas row-tiled variant of halfpel_planes: the (uint8) plane
    stays resident in VMEM and each grid step computes all three FIRs
    from one strip slice, so the plane is read once instead of once per
    shifted slice (XLA does not fuse the 18 shifted reads of the slice
    formulation — measured 48 ms @720p vs ~8 ms of actual traffic)."""
    import functools

    from jax.experimental import pallas as pl

    Hp, Wp = ref_pad.shape
    Ho, Wo = Hp - 5, Wp - 5
    TH = tile_h
    nt = -(-Ho // TH)
    # pad rows so the last strip slice never clamps (a clamped start
    # would compute the tail tile from shifted rows)
    Hp_pad = nt * TH + 5
    r = ref_pad.astype(jnp.uint8)
    if Hp_pad > Hp:
        r = jnp.pad(r, ((0, Hp_pad - Hp), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_hp_kernel, TH),
        grid=(nt,),
        in_specs=[pl.BlockSpec((Hp_pad, Wp), lambda d: (0, 0))],
        out_specs=pl.BlockSpec((4, TH, Wo), lambda d: (0, d, 0)),
        out_shape=jax.ShapeDtypeStruct((4, nt * TH, Wo), jnp.int32),
    )(r)
    return out[:, :Ho]


# quarter-pel case tables: k = (mvy&3)*4 + (mvx&3) selects two plane
# samples whose rounded average is the predicted value (planes G=0, b=1,
# h=2, j=3; identical-pair entries are the pure G/b/h/j cases since
# (2a+1)>>1 == a). Derived from the spec 8.4.2.2.1 quarter-sample rules
# (same math as mc_luma_cells above).
QTAB = np.array(
    #  p1 dy1 dx1  p2 dy2 dx2        k = fy*4+fx
    [[0, 0, 0, 0, 0, 0],   # 0  (0,0) G
     [0, 0, 0, 1, 0, 0],   # 1  (0,1) (G+b)/2
     [1, 0, 0, 1, 0, 0],   # 2  (0,2) b
     [0, 0, 1, 1, 0, 0],   # 3  (0,3) (G(x+1)+b)/2
     [0, 0, 0, 2, 0, 0],   # 4  (1,0) (G+h)/2
     [1, 0, 0, 2, 0, 0],   # 5  (1,1) (b+h)/2
     [1, 0, 0, 3, 0, 0],   # 6  (1,2) (b+j)/2
     [1, 0, 0, 2, 0, 1],   # 7  (1,3) (b+h(x+1))/2
     [2, 0, 0, 2, 0, 0],   # 8  (2,0) h
     [2, 0, 0, 3, 0, 0],   # 9  (2,1) (h+j)/2
     [3, 0, 0, 3, 0, 0],   # 10 (2,2) j
     [2, 0, 1, 3, 0, 0],   # 11 (2,3) (h(x+1)+j)/2
     [0, 1, 0, 2, 0, 0],   # 12 (3,0) (G(y+1)+h)/2
     [1, 1, 0, 2, 0, 0],   # 13 (3,1) (b(y+1)+h)/2
     [1, 1, 0, 3, 0, 0],   # 14 (3,2) (b(y+1)+j)/2
     [1, 1, 0, 2, 0, 1]],  # 15 (3,3) (b(y+1)+h(x+1))/2
    np.int32)


def mc_luma_mbs(planes: jax.Array, pad: int, y0: jax.Array, x0: jax.Array,
                mvx: jax.Array, mvy: jax.Array, size: int = 16) -> jax.Array:
    """Whole-block quarter-pel luma prediction from precomputed half-pel
    planes (size 16 = MBs, 8 = P8x8 partitions). planes:
    halfpel_planes() output for a pad-padded reference.
    Returns [n,size,size] int32, element-exact vs mc_luma_cells for MVs
    that stay inside the padded window (i.e. any ME-produced MV)."""
    # one flat batched gather per tap (a vmapped dynamic_slice lowers to
    # a serial per-block while loop on TPU); plane id + clamped window
    # start fold into a single flattened index
    tab = jnp.asarray(QTAB)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    mvx = mvx.astype(jnp.int32)
    mvy = mvy.astype(jnp.int32)
    _, Hp, Wp = planes.shape
    flat = planes.reshape(-1)
    e = tab[(mvy & 3) * 4 + (mvx & 3)]                     # [n,6]
    by = pad - 2 + y0 + (mvy >> 2)
    bx = pad - 2 + x0 + (mvx >> 2)
    oy = jnp.arange(size)

    def samp(p, dy, dx):
        yy = jnp.clip(by + dy, 0, Hp - size)   # dynamic_slice clamp
        xx = jnp.clip(bx + dx, 0, Wp - size)
        idx = ((p * Hp + yy)[:, None, None] + oy[None, :, None]) * Wp \
            + xx[:, None, None] + oy[None, None, :]
        return flat[idx]

    t1 = samp(e[:, 0], e[:, 1], e[:, 2])
    t2 = samp(e[:, 3], e[:, 4], e[:, 5])
    return ((t1 + t2 + 1) >> 1).astype(jnp.int32)


def mc_chroma_mbs(ref_pad_c: jax.Array, pad: int, cy0: jax.Array,
                  cx0: jax.Array, mvx: jax.Array, mvy: jax.Array,
                  size: int = 8):
    """Whole-block chroma prediction (one gather per block instead of
    per-2x2 cells; MV uniform across the block; size 8 = MB chroma,
    4 = P8x8 partition chroma). Element-exact vs mc_chroma_cells for
    in-window MVs."""
    # one batched window gather (vmapped dynamic_slice lowers serially)
    S = size
    Hc, Wc = ref_pad_c.shape
    cy0 = cy0.astype(jnp.int32)
    cx0 = cx0.astype(jnp.int32)
    mvx = mvx.astype(jnp.int32)
    mvy = mvy.astype(jnp.int32)
    iy = jnp.clip(pad + cy0 + (mvy >> 3), 0, Hc - (S + 1))
    ix = jnp.clip(pad + cx0 + (mvx >> 3), 0, Wc - (S + 1))
    o = jnp.arange(S + 1)
    win = ref_pad_c[iy[:, None, None] + o[None, :, None],
                    ix[:, None, None] + o[None, None, :]] \
        .astype(jnp.int32)
    fx = (mvx & 7)[:, None, None]
    fy = (mvy & 7)[:, None, None]
    A = win[:, 0:S, 0:S]
    B = win[:, 0:S, 1:S + 1]
    C = win[:, 1:S + 1, 0:S]
    D = win[:, 1:S + 1, 1:S + 1]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B +
            (8 - fx) * fy * C + fx * fy * D + 32) >> 6


def mc_chroma_cells(ref_stack: jax.Array, pad: int, ref_idx: jax.Array,
                    y0: jax.Array, x0: jax.Array, mvx: jax.Array,
                    mvy: jax.Array) -> jax.Array:
    """Chroma 2x2 cells from [R, H/2+2p, W/2+2p]. Returns [B,2,2] int32.

    One flat batched window gather (3x3 per cell), vectorized bilinear."""
    h = w = 2

    R, Hp, Wp = ref_stack.shape
    Hc = Hp - 2 * pad
    Wc = Wp - 2 * pad
    lpad = 2 * pad

    r = ref_idx.astype(jnp.int32)
    cy = y0.astype(jnp.int32)
    cx = x0.astype(jnp.int32)
    vx = mvx.astype(jnp.int32)
    vy = mvy.astype(jnp.int32)
    # shared luma-unit iFullMV clip, then >>3 (rec_mb.cpp BaseMC)
    fullx = jnp.clip(((2 * cx) << 2) + vx, (-lpad + 2) << 2,
                     (2 * Wc + lpad - 19) << 2)
    fully = jnp.clip(((2 * cy) << 2) + vy, (-lpad + 2) << 2,
                     (2 * Hc + lpad - 19) << 2)
    ix = fullx >> 3
    iy = fully >> 3
    fx = (fullx & 7)[:, None, None]
    fy = (fully & 7)[:, None, None]
    flat = ref_stack.reshape(-1)
    o3 = jnp.arange(h + 1)
    idx = ((r * Hp + (pad + iy))[:, None, None] + o3[None, :, None]) * Wp \
        + (pad + ix)[:, None, None] + o3[None, None, :]
    win = flat[idx].astype(jnp.int32)                      # [B, 3, 3]
    A = win[:, 0:h, 0:w]
    B = win[:, 0:h, 1:w + 1]
    C = win[:, 1:h + 1, 0:w]
    D = win[:, 1:h + 1, 1:w + 1]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B +
            (8 - fx) * fy * C + fx * fy * D + 32) >> 6
