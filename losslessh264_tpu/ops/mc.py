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


# ---------------------------------------------------------------------------
# Bucketed dense-shift MC (decoder fast path).
#
# The per-cell window gather above is exact and fully general, but TPU
# gathers run at ~9 ns/element through XLA — 40+ ms/frame at 720p
# (57600 cells x 81 elements), which alone sinks a 30 fps target. Real
# P frames cluster around FEW distinct (ref, mv) values, and for one
# (ref, mv) the whole prediction is an AFFINE read: a dynamic_slice of
# a half-pel plane. So: build G/b/h/j planes for the (<=2) active
# reference slots once per frame (dense FIR, MXU/VPU-friendly), then
# for each unique (slot, mv) triple take two shifted dense slices,
# average per the spec's quarter-pel rules (QTAB), and select per
# pixel by a precomputed bucket plane. Cells the dense path cannot
# serve exactly (reference-style iFullMV clipping near frame edges,
# |mv| beyond the slice range) get a per-cell fix-up gather; frames
# exceeding the caps fall back to the general path (lax.cond).
#
# Reference: rec_mb.cpp BaseMC/GetInterPred per-block dispatch + the
# mc.cpp SIMD kernels — redesigned as whole-frame dense ops.
# ---------------------------------------------------------------------------
MC_CAP = 32        # unique (slot, mv) triples served by the fast path
MC_SLOT_CAP = 2    # active reference slots served by the fast path
MC_FIX_CAP = 512   # per-cell fix-ups (clipped/out-of-range/spilled cells)
MC_MV_MAX = 112    # |mv| quarter-pels the dense slices can shift


def mc_fast_plan(mb_w, mb_h, ref_slot, mv, pad):
    """Host-side fast-path plan (numpy). Returns a dict of plan arrays
    (always the same shapes, so scanned runs can stack them) with
    plan["mc_fast"] False when the frame exceeds the caps and must take
    the general per-cell branch."""
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    rs = ref_slot.reshape(-1).astype(np.int64)
    vx = mv[:, :, 0].reshape(-1).astype(np.int64)
    vy = mv[:, :, 1].reshape(-1).astype(np.int64)
    valid = rs >= 0

    mbi = np.arange(n)
    cell = np.arange(16)
    cy0 = ((mbi // mb_w)[:, None] * 16 + (cell // 4)[None, :] * 4) \
        .reshape(-1)
    cx0 = ((mbi % mb_w)[:, None] * 16 + (cell % 4)[None, :] * 4) \
        .reshape(-1)
    # cells where the reference-style iFullMV clip engages (the chroma
    # clip bound reduces to the same inequality: cell coords are 4-px
    # aligned and lpad == 2*(pad//2) == pad)
    lo = (-pad + 2) << 2
    fullx = (cx0 << 2) + vx
    fully = (cy0 << 2) + vy
    clip = ((fullx < lo) | (fullx > ((W + pad - 19) << 2))
            | (fully < lo) | (fully > ((H + pad - 19) << 2)))
    big = (np.abs(vx) > MC_MV_MAX) | (np.abs(vy) > MC_MV_MAX)
    fix = valid & (clip | big)
    fast = valid & ~fix

    plan = {
        "mc_fast": np.bool_(False),
        "mc_nuniq": np.int32(0),
        "mc_uniq": np.zeros((MC_CAP, 16), np.int32),
        "mc_slots": np.zeros((MC_SLOT_CAP,), np.int32),
        "mc_nslots": np.int32(0),
        "mc_bucket": np.full((n, 16), MC_CAP, np.uint8),
        "mc_fix": np.full((MC_FIX_CAP,), -1, np.int32),
    }
    if not valid.any():
        return plan      # nothing to predict: either branch is fine
    key = ((rs << 28) + ((vy + (1 << 13)) << 14) + (vx + (1 << 13)))
    # MB-uniform reduction: most MBs carry one (slot, mv) for all 16
    # cells, so unique() runs over ~n keys instead of 16n
    kg = key.reshape(-1, 16)
    fg = fast.reshape(-1, 16)
    uni = ((kg == kg[:, :1]).all(axis=1) & fg.all(axis=1))
    redu = np.concatenate([kg[uni, 0], kg[~uni][fg[~uni]]])
    uk = np.unique(redu)
    nuni = int(uni.sum())
    # cell counts: a uniform MB contributes 16 cells per key
    cnt = np.bincount(np.searchsorted(uk, redu),
                      weights=np.where(np.arange(len(redu)) < nuni,
                                       16, 1),
                      minlength=len(uk)).astype(np.int64)
    inv = np.searchsorted(uk, key[fast])
    slots = np.unique(rs[fast]) if fast.any() else np.zeros(0, np.int64)
    if len(uk) > MC_CAP:
        # serve the MC_CAP most-populated triples densely; spill the
        # long tail's cells to the per-cell fix-up gather
        keep = np.argsort(-cnt)[:MC_CAP]
        keep_mask = np.zeros(len(uk), bool)
        keep_mask[keep] = True
        spill = np.zeros(len(fast), bool)
        spill[fast] = ~keep_mask[inv]
        fix |= spill
        fast &= ~spill
        uk, inv = np.unique(key[fast], return_inverse=True)
        slots = np.unique(rs[fast]) if fast.any() else \
            np.zeros(0, np.int64)
    if (len(uk) > MC_CAP or len(slots) > MC_SLOT_CAP
            or int(fix.sum()) > MC_FIX_CAP):
        return plan
    slot_local = {int(s): i for i, s in enumerate(slots)}
    uniq = np.zeros((MC_CAP, 16), np.int32)
    for u, k in enumerate(uk):
        s = int(k >> 28)
        uvy = int(((k >> 14) & 0x3fff) - (1 << 13))
        uvx = int((k & 0x3fff) - (1 << 13))
        q = QTAB[(uvy & 3) * 4 + (uvx & 3)]
        uniq[u, 0] = slot_local[s]
        uniq[u, 1] = uvy >> 2
        uniq[u, 2] = uvx >> 2
        uniq[u, 3:9] = q
        uniq[u, 9] = uvy >> 3
        uniq[u, 10] = uvx >> 3
        uniq[u, 11] = uvy & 7
        uniq[u, 12] = uvx & 7
    bucket = np.full(n * 16, MC_CAP, np.uint8)
    bucket[fast] = inv.astype(np.uint8)
    fx_list = np.flatnonzero(fix)
    mc_fix = np.full((MC_FIX_CAP,), -1, np.int32)
    mc_fix[:len(fx_list)] = fx_list
    plan.update(
        mc_fast=np.bool_(True),
        mc_nuniq=np.int32(len(uk)),
        mc_uniq=uniq,
        mc_slots=np.concatenate(
            [slots, np.zeros(MC_SLOT_CAP - len(slots), np.int64)]
        ).astype(np.int32),
        mc_nslots=np.int32(len(slots)),
        mc_bucket=bucket.reshape(n, 16),
        mc_fix=mc_fix)
    return plan


def mc_bucketed(ref_y, ref_u, ref_v, pad, p, mb_w, mb_h):
    """Device fast path: whole-frame pred planes from the plan built by
    mc_fast_plan. Returns (pred_y [H,W], pred_uv [2,H/2,W/2]) int32.
    Element-exact vs mc_luma_cells / mc_chroma_cells on every cell the
    plan marks fast (validated by tests/test_jax_ops.py)."""
    from jax import lax

    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    R, Hp, Wp = ref_y.shape
    uniq = p["mc_uniq"].astype(jnp.int32)
    slots = p["mc_slots"].astype(jnp.int32)
    bucket = p["mc_bucket"].astype(jnp.uint8)

    # half-pel planes for the active slots (slot 1 reuses slot 0's when
    # inactive — same shapes, no compute on the taken branch)
    g0 = lax.dynamic_slice(ref_y, (slots[0], 0, 0), (1, Hp, Wp))[0]
    hp0 = halfpel_planes_pallas(g0).astype(jnp.uint8)
    hp1 = lax.cond(
        p["mc_nslots"] > 1,
        lambda: halfpel_planes_pallas(
            lax.dynamic_slice(ref_y, (slots[1], 0, 0),
                              (1, Hp, Wp))[0]).astype(jnp.uint8),
        lambda: hp0)
    hps = jnp.stack([hp0, hp1])                 # [2, 4, Hp-5, Wp-5]

    # bucket planes (cell = 4x4 luma px, 2x2 chroma px)
    bg = bucket.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 4, mb_w * 4)
    bplane = jnp.repeat(jnp.repeat(bg, 4, 0), 4, 1)          # [H, W]
    bplane_c = jnp.repeat(jnp.repeat(bg, 2, 0), 2, 1)        # [H/2, W/2]

    cpad = pad // 2
    uv = jnp.stack([ref_u, ref_v])              # [2, R, Hc, Wc]
    uv0 = lax.dynamic_slice(
        uv, (0, slots[0], 0, 0), (2, 1, uv.shape[2], uv.shape[3]))[:, 0]
    uv1 = lax.cond(
        p["mc_nslots"] > 1,
        lambda: lax.dynamic_slice(
            uv, (0, slots[1], 0, 0),
            (2, 1, uv.shape[2], uv.shape[3]))[:, 0],
        lambda: uv0)
    uvs = jnp.stack([uv0, uv1]).astype(jnp.uint8)  # [2, 2, Hc, Wc]

    def body(u, carry):
        out_y, out_uv = carry
        e = uniq[u]
        sl = e[0]

        def tap(pl, dy, dx):
            return lax.dynamic_slice(
                hps, (sl, pl, pad - 2 + e[1] + dy, pad - 2 + e[2] + dx),
                (1, 1, H, W))[0, 0].astype(jnp.int32)

        val = ((tap(e[3], e[4], e[5]) + tap(e[6], e[7], e[8]) + 1) >> 1) \
            .astype(jnp.uint8)
        out_y = jnp.where(bplane == u.astype(jnp.uint8), val, out_y)

        def ctap(dy, dx):
            return lax.dynamic_slice(
                uvs, (sl, 0, cpad + e[9] + dy, cpad + e[10] + dx),
                (1, 2, H // 2, W // 2))[0].astype(jnp.int32)

        fy, fx = e[11], e[12]
        cval = (((8 - fx) * (8 - fy) * ctap(0, 0)
                 + fx * (8 - fy) * ctap(0, 1)
                 + (8 - fx) * fy * ctap(1, 0)
                 + fx * fy * ctap(1, 1) + 32) >> 6).astype(jnp.uint8)
        out_uv = jnp.where(bplane_c[None] == u.astype(jnp.uint8),
                           cval, out_uv)
        return out_y, out_uv

    out_y = jnp.zeros((H, W), jnp.uint8)
    out_uv = jnp.zeros((2, H // 2, W // 2), jnp.uint8)
    # dynamic trip count: the loop cost tracks the frame's real number
    # of distinct (slot, mv) values, not the cap
    out_y, out_uv = lax.fori_loop(0, p["mc_nuniq"].astype(jnp.int32),
                                  body, (out_y, out_uv))

    # per-cell fix-ups (clipped / long MVs): general gather on at most
    # MC_FIX_CAP cells, scattered over the dense planes
    fixi = p["mc_fix"].astype(jnp.int32)
    fmask = fixi >= 0
    fc = jnp.clip(fixi, 0, n * 16 - 1)
    fmb, fcell = fc // 16, fc % 16
    fy0 = (fmb // mb_w) * 16 + (fcell // 4) * 4
    fx0 = (fmb % mb_w) * 16 + (fcell % 4) * 4
    rsl = jnp.clip(p["ref_slot"].reshape(-1).astype(jnp.int32)[fc], 0,
                   R - 1)
    fvx = p["mv"][:, :, 0].reshape(-1).astype(jnp.int32)[fc]
    fvy = p["mv"][:, :, 1].reshape(-1).astype(jnp.int32)[fc]
    tiles = mc_luma_cells(ref_y, pad, rsl, fy0, fx0, fvx, fvy)
    o4 = jnp.arange(4)
    yidx = jnp.where(fmask, fy0, H)[:, None, None] + o4[None, :, None]
    xidx = fx0[:, None, None] + o4[None, None, :]
    flatidx = jnp.where(fmask[:, None, None], yidx * W + xidx, H * W)
    out_y = out_y.reshape(-1).at[flatidx.reshape(-1)].set(
        tiles.astype(jnp.uint8).reshape(-1), mode="drop") \
        .reshape(H, W)
    ctiles_u = mc_chroma_cells(ref_u, cpad, rsl, fy0 // 2, fx0 // 2,
                               fvx, fvy)
    ctiles_v = mc_chroma_cells(ref_v, cpad, rsl, fy0 // 2, fx0 // 2,
                               fvx, fvy)
    o2 = jnp.arange(2)
    cyi = jnp.where(fmask, fy0 // 2, H // 2)[:, None, None] \
        + o2[None, :, None]
    cxi = (fx0 // 2)[:, None, None] + o2[None, None, :]
    cflat = jnp.where(fmask[:, None, None],
                      cyi * (W // 2) + cxi, (H // 2) * (W // 2))
    out_u = out_uv[0].reshape(-1).at[cflat.reshape(-1)].set(
        ctiles_u.astype(jnp.uint8).reshape(-1), mode="drop") \
        .reshape(H // 2, W // 2)
    out_v = out_uv[1].reshape(-1).at[cflat.reshape(-1)].set(
        ctiles_v.astype(jnp.uint8).reshape(-1), mode="drop") \
        .reshape(H // 2, W // 2)
    return (out_y.astype(jnp.int32), out_u.astype(jnp.int32),
            out_v.astype(jnp.int32))
