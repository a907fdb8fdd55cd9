"""Intra prediction kernels + the macroblock wavefront (JAX, TPU-first).

The intra dependency chain (each MB needs reconstructed LEFT/ABOVE/
ABOVE-RIGHT pixels; I4x4 blocks additionally sequence inside the MB) is
scheduled as a slope-2 anti-diagonal wavefront: MBs with equal
d = 2*mb_y + mb_x are independent and reconstructed in parallel lanes
(vmap), diagonals advance under lax.scan — the "wavefront-scheduled
kernel" design from the build plan (SURVEY.md §7; the reference is
strictly serial, decode_slice.cpp per-MB loop).

Each predictor computes all candidate modes branch-free and selects by
mode index (the TPU way — no data-dependent control flow). Element-exact
vs decoder_np.pred_intra4x4 / pred_intra8x8 / the I16 and chroma
predictors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _i32(x):
    return x.astype(jnp.int32)


# ---------------------------------------------------------------------------
# 4x4 predictors: nb = (left[4], top[8], tl scalar); avail flags static per
# call site? No — flags are traced; DC uses them; directional modes assume
# required neighbors exist (mode legality guaranteed by the bitstream).
# ---------------------------------------------------------------------------
def pred4_all(left, top, tl, availL, availT):
    """Returns [9,4,4] int32 candidate predictions."""
    l = _i32(left)
    t = _i32(top)
    tlv = _i32(tl)
    out = []
    # 0 vertical
    out.append(jnp.broadcast_to(t[0:4], (4, 4)))
    # 1 horizontal
    out.append(jnp.broadcast_to(l[:, None], (4, 4)))
    # 2 DC
    both = (l.sum() + t[0:4].sum() + 4) >> 3
    onlyl = (l.sum() + 2) >> 2
    onlyt = (t[0:4].sum() + 2) >> 2
    dc = jnp.where(availL & availT, both,
                   jnp.where(availL, onlyl, jnp.where(availT, onlyt, 128)))
    out.append(jnp.broadcast_to(dc, (4, 4)))

    def f3(a, b, c):  # (a + 2b + c + 2) >> 2
        return (a + 2 * b + c + 2) >> 2

    def f2(a, b):  # (a + b + 1) >> 1
        return (a + b + 1) >> 1

    # 3 DDL
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            i = x + y
            row.append(f3(t[6], t[7], t[7]) if i == 6 else f3(t[i], t[i + 1], t[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 4 DDR
    seq = [l[3], l[2], l[1], l[0], tlv, t[0], t[1], t[2], t[3]]
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            k = 4 + x - y
            row.append(f3(seq[k - 1], seq[k], seq[k + 1]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 5 VR
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * x - y
            if z >= 0 and z % 2 == 0:
                i = x - (y >> 1)
                a = tlv if i - 1 < 0 else t[i - 1]
                row.append(f2(a, t[i]))
            elif z >= 0:
                i = x - (y >> 1)
                a = tlv if i - 2 < 0 else t[i - 2]
                b = tlv if i - 1 < 0 else t[i - 1]
                row.append(f3(a, b, t[i]))
            elif z == -1:
                row.append(f3(l[0], tlv, t[0]))
            else:
                i = y - 2 * x - 1
                row.append(f3(l[i], l[i - 1], l[i - 2] if i - 2 >= 0 else tlv)
                           if i >= 2 else f3(l[1], l[0], tlv))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 6 HD
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * y - x
            if z >= 0 and z % 2 == 0:
                i = y - (x >> 1)
                a = tlv if i - 1 < 0 else l[i - 1]
                row.append(f2(a, l[i]))
            elif z >= 0:
                i = y - (x >> 1)
                a = tlv if i - 2 < 0 else l[i - 2]
                b = tlv if i - 1 < 0 else l[i - 1]
                row.append(f3(a, b, l[i]))
            elif z == -1:
                row.append(f3(t[0], tlv, l[0]))
            else:
                i = x - 2 * y - 1
                row.append(f3(t[i], t[i - 1], t[i - 2] if i - 2 >= 0 else tlv)
                           if i >= 2 else f3(t[1], t[0], tlv))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 7 VL
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            i = x + (y >> 1)
            row.append(f2(t[i], t[i + 1]) if y % 2 == 0
                       else f3(t[i], t[i + 1], t[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 8 HU
    rows = []
    for y in range(4):
        row = []
        for x in range(4):
            z = x + 2 * y
            if z > 5:
                row.append(l[3])
            elif z == 5:
                row.append(f3(l[2], l[3], l[3]))
            elif z % 2 == 0:
                i = y + (x >> 1)
                row.append(f2(l[i], l[i + 1]))
            else:
                i = y + (x >> 1)
                row.append(f3(l[i], l[i + 1], l[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    return jnp.clip(jnp.stack(out), 0, 255)


def pred8_all(left, top, tl, availL, availT, availTL):
    """8x8 intra with reference filtering. left[8], top[16]. -> [9,8,8]."""
    l = _i32(left)
    t = _i32(top)
    tlv = _i32(tl)
    # reference filtering (spec 8.3.2.2.1)
    ft0 = jnp.where(availTL, (tlv + 2 * t[0] + t[1] + 2) >> 2,
                    (3 * t[0] + t[1] + 2) >> 2)
    ftm = (t[0:14] + 2 * t[1:15] + t[2:16] + 2) >> 2
    ft15 = (t[14] + 3 * t[15] + 2) >> 2
    ft = jnp.concatenate([ft0[None], ftm, ft15[None]])
    ftl = jnp.where(availL & availT, (l[0] + 2 * tlv + t[0] + 2) >> 2,
                    jnp.where(availT, (3 * tlv + t[0] + 2) >> 2,
                              jnp.where(availL, (3 * tlv + l[0] + 2) >> 2, tlv)))
    ftl = jnp.where(availTL, ftl, tlv)
    fl0 = jnp.where(availTL, (tlv + 2 * l[0] + l[1] + 2) >> 2,
                    (3 * l[0] + l[1] + 2) >> 2)
    flm = (l[0:6] + 2 * l[1:7] + l[2:8] + 2) >> 2
    fl7 = (l[6] + 3 * l[7] + 2) >> 2
    fl = jnp.concatenate([fl0[None], flm, fl7[None]])
    t, l, tlv = ft, fl, ftl

    def f3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    def f2(a, b):
        return (a + b + 1) >> 1

    out = []
    out.append(jnp.broadcast_to(t[0:8], (8, 8)))
    out.append(jnp.broadcast_to(l[:, None], (8, 8)))
    both = (l.sum() + t[0:8].sum() + 8) >> 4
    onlyl = (l.sum() + 4) >> 3
    onlyt = (t[0:8].sum() + 4) >> 3
    dc = jnp.where(availL & availT, both,
                   jnp.where(availL, onlyl, jnp.where(availT, onlyt, 128)))
    out.append(jnp.broadcast_to(dc, (8, 8)))
    # 3 DDL
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            if x == 7 and y == 7:
                row.append(f3(t[14], t[15], t[15]))
            else:
                i = x + y
                row.append(f3(t[i], t[i + 1], t[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 4 DDR
    seq = [l[7 - i] for i in range(8)] + [tlv] + [t[i] for i in range(8)]
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            k = 8 + x - y
            row.append(f3(seq[k - 1], seq[k], seq[k + 1]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 5 VR
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = 2 * x - y
            if z >= 0 and z % 2 == 0:
                i = x - (y >> 1)
                a = tlv if i - 1 < 0 else t[i - 1]
                row.append(f2(a, t[i]))
            elif z >= 0:
                i = x - (y >> 1)
                a = tlv if i - 2 < 0 else t[i - 2]
                b = tlv if i - 1 < 0 else t[i - 1]
                row.append(f3(a, b, t[i]))
            elif z == -1:
                row.append(f3(l[0], tlv, t[0]))
            else:
                i = y - 2 * x - 1
                row.append(f3(l[i], l[i - 1], l[i - 2] if i - 2 >= 0 else tlv)
                           if i >= 2 else f3(l[1], l[0], tlv))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 6 HD
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = 2 * y - x
            if z >= 0 and z % 2 == 0:
                i = y - (x >> 1)
                a = tlv if i - 1 < 0 else l[i - 1]
                row.append(f2(a, l[i]))
            elif z >= 0:
                i = y - (x >> 1)
                a = tlv if i - 2 < 0 else l[i - 2]
                b = tlv if i - 1 < 0 else l[i - 1]
                row.append(f3(a, b, l[i]))
            elif z == -1:
                row.append(f3(t[0], tlv, l[0]))
            else:
                i = x - 2 * y - 1
                row.append(f3(t[i], t[i - 1], t[i - 2] if i - 2 >= 0 else tlv)
                           if i >= 2 else f3(t[1], t[0], tlv))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 7 VL
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            i = x + (y >> 1)
            row.append(f2(t[i], t[i + 1]) if y % 2 == 0
                       else f3(t[i], t[i + 1], t[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    # 8 HU
    rows = []
    for y in range(8):
        row = []
        for x in range(8):
            z = x + 2 * y
            if z > 13:
                row.append(l[7])
            elif z == 13:
                row.append(f3(l[6], l[7], l[7]))
            elif z % 2 == 0:
                i = y + (x >> 1)
                row.append(f2(l[i], l[i + 1]))
            else:
                i = y + (x >> 1)
                row.append(f3(l[i], l[i + 1], l[i + 2]))
        rows.append(jnp.stack(row))
    out.append(jnp.stack(rows))
    return jnp.clip(jnp.stack(out), 0, 255)


def _plane_pred(left, top, tl, size):
    n = size
    h = n // 2
    idx = jnp.arange(1, h + 1)
    tpos = _i32(top[h - 1 + idx])
    tneg = jnp.concatenate([_i32(top[h - 1 - idx[:-1]]), _i32(tl)[None]])
    lpos = _i32(left[h - 1 + idx])
    lneg = jnp.concatenate([_i32(left[h - 1 - idx[:-1]]), _i32(tl)[None]])
    Hsum = (idx * (tpos - tneg)).sum()
    Vsum = (idx * (lpos - lneg)).sum()
    if n == 16:
        b = (5 * Hsum + 32) >> 6
        c = (5 * Vsum + 32) >> 6
    else:
        b = (17 * Hsum + 16) >> 5
        c = (17 * Vsum + 16) >> 5
    a = 16 * (_i32(left[n - 1]) + _i32(top[n - 1]))
    ys, xs = jnp.mgrid[0:n, 0:n]
    val = (a + b * (xs - h + 1) + c * (ys - h + 1) + 16) >> 5
    return jnp.clip(val, 0, 255)


def pred16_all(left, top, tl, availL, availT):
    l = _i32(left)
    t = _i32(top)
    out = [jnp.broadcast_to(t, (16, 16)), jnp.broadcast_to(l[:, None], (16, 16))]
    both = (l.sum() + t.sum() + 16) >> 5
    onlyl = (l.sum() + 8) >> 4
    onlyt = (t.sum() + 8) >> 4
    dc = jnp.where(availL & availT, both,
                   jnp.where(availL, onlyl, jnp.where(availT, onlyt, 128)))
    out.append(jnp.broadcast_to(dc, (16, 16)))
    out.append(_plane_pred(left, top, tl, 16))
    return jnp.stack(out)


def pred_chroma_all(left, top, tl, availL, availT):
    l = _i32(left)
    t = _i32(top)
    # DC per 4x4 quadrant with edge rules
    pred_dc = jnp.zeros((8, 8), jnp.int32)
    for qy in range(2):
        for qx in range(2):
            ls = l[qy * 4:qy * 4 + 4].sum()
            ts = t[qx * 4:qx * 4 + 4].sum()
            if (qy, qx) in ((0, 0), (1, 1)):
                v = jnp.where(availL & availT, (ls + ts + 4) >> 3,
                              jnp.where(availT, (ts + 2) >> 2,
                                        jnp.where(availL, (ls + 2) >> 2, 128)))
            elif (qy, qx) == (0, 1):
                v = jnp.where(availT, (ts + 2) >> 2,
                              jnp.where(availL, (ls + 2) >> 2, 128))
            else:
                v = jnp.where(availL, (ls + 2) >> 2,
                              jnp.where(availT, (ts + 2) >> 2, 128))
            pred_dc = pred_dc.at[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4].set(v)
    out = [pred_dc,
           jnp.broadcast_to(l[:, None], (8, 8)),
           jnp.broadcast_to(t, (8, 8)),
           _plane_pred(left, top, tl, 8)]
    return jnp.stack(out)


# 4x4 block decode order within an MB (raster index per step)
BLK_ORDER = np.array([0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])
