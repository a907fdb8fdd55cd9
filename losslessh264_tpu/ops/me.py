"""Motion estimation — batched full-search SAD on TPU.

TPU-first equivalent of the reference encoder's motion search
(svc_motion_estimate.cpp WelsMotionEstimateSearch + sample.cpp SAD
kernels, x86 satd_sad.asm): instead of a sequential diamond/cross walk
per MB, evaluate the WHOLE (2R+1)^2 integer window for EVERY MB as one
batched reduction — the VPU eats the |a-b| tree, XLA fuses the window
gathers, and wall-clock is one kernel launch per frame instead of a
data-dependent walk.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("radius", "block"))
def full_search_sad(cur_mbs: jax.Array, ref_pad: jax.Array, mb_y: jax.Array,
                    mb_x: jax.Array, radius: int = 16, block=16):
    """Exhaustive integer-pel block search.

    cur_mbs: [n,bh,bw] int32 source blocks; block = side length or a
    (bh, bw) pair (16 MBs, 8 P8x8 partitions, (8,16)/(16,8) for
    P16x8/P8x16).
    ref_pad: reference luma edge-padded by `radius` on every side.
    mb_y/mb_x: [n] top-left pixel coords of each block (unpadded frame).
    Returns (best_dy, best_dx, best_sad, zero_sad): [n] each, offsets in
    integer pixels relative to the colocated position.
    """
    bh, bw = (block, block) if isinstance(block, int) else block
    span = 2 * radius + 1
    b2 = bh * bw

    def one_mb(cur, y, x):
        win = jax.lax.dynamic_slice(
            ref_pad, (y, x), (2 * radius + bh, 2 * radius + bw))
        win = win.astype(jnp.int32)
        patches = jax.lax.conv_general_dilated_patches(
            win[None, None].astype(jnp.float32), (bh, bw), (1, 1),
            "VALID")
        patches = patches[0].astype(jnp.int32)          # [b2, span, span]
        sads = jnp.abs(patches - cur.reshape(b2, 1, 1)).sum(axis=0)
        flat = sads.reshape(-1)
        best = jnp.argmin(flat)
        return (best // span - radius, best % span - radius, flat[best],
                sads[radius, radius])

    return jax.vmap(one_mb)(cur_mbs, mb_y, mb_x)


@partial(jax.jit, static_argnames=("step", "pad", "size", "return_pred"))
def subpel_refine(planes: jax.Array, pad: int, mb_y: jax.Array,
                  mb_x: jax.Array, mvx: jax.Array, mvy: jax.Array,
                  cur_mbs: jax.Array, step: int, size=16,
                  return_pred: bool = False):
    """One sub-pel refinement round (step=2: half-pel, step=1: quarter).

    planes: mc.halfpel_planes() output. Per MB, gathers ONE [4,18,18]
    window around the current integer position; every candidate
    prediction is then a STATIC slice + average of that window (no
    per-candidate interpolation or dynamic indexing — the reference
    recomputes 6-tap blocks per candidate,
    svc_motion_estimate.cpp half-pel iterations). Entering a round the
    fractional MV parts are restricted (step=2: integer MVs from full
    search; step=1: {0,2} halves), so the slice set per candidate is
    enumerable at trace time; step=1 computes all four base cases and
    selects per MB.
    Returns (mvx, mvy, best_sad) per MB; with return_pred=True also the
    winning prediction block — the candidates are already materialized
    for the SADs, so returning the winner makes a separate final MC
    gather pass unnecessary.
    """
    from .mc import QTAB
    offs = [(oy, ox) for oy in (-step, 0, step) for ox in (-step, 0, step)]
    bases = [(0, 0)] if step == 2 else [(0, 0), (0, 2), (2, 0), (2, 2)]
    oy_arr = jnp.asarray(np.array([o[0] for o in offs], np.int32))
    ox_arr = jnp.asarray(np.array([o[1] for o in offs], np.int32))

    SH, SW = (size, size) if isinstance(size, int) else size

    def one(cy, cx, vx, vy, cur):
        iy0 = vy >> 2
        ix0 = vx >> 2
        win = jax.lax.dynamic_slice(
            planes, (0, pad - 3 + cy + iy0, pad - 3 + cx + ix0),
            (4, SH + 2, SW + 2))

        sads_b = []
        preds_b = []
        for bfy, bfx in bases:
            sads = []
            preds = []
            for oy, ox in offs:
                k = ((bfy + oy) & 3) * 4 + ((bfx + ox) & 3)
                p1, dy1, dx1, p2, dy2, dx2 = (int(v) for v in QTAB[k])
                ry = 1 + ((bfy + oy) >> 2)
                rx = 1 + ((bfx + ox) >> 2)
                t1 = win[p1, ry + dy1:ry + dy1 + SH,
                         rx + dx1:rx + dx1 + SW]
                t2 = win[p2, ry + dy2:ry + dy2 + SH,
                         rx + dx2:rx + dx2 + SW]
                pred = (t1 + t2 + 1) >> 1
                sads.append(jnp.abs(pred - cur).sum())
                if return_pred:
                    preds.append(pred)
            sads_b.append(jnp.stack(sads))
            if return_pred:
                preds_b.append(jnp.stack(preds))
        if step == 2:
            sads = sads_b[0]
        else:
            bidx = ((vy & 2) >> 1) * 2 + ((vx & 2) >> 1)
            sads = jnp.stack(sads_b)[bidx]
        best = jnp.argmin(sads)
        if not return_pred:
            return vx + ox_arr[best], vy + oy_arr[best], sads[best]
        if step == 2:
            pred_best = preds_b[0][best]
        else:
            pred_best = jnp.stack(preds_b)[bidx, best]
        return vx + ox_arr[best], vy + oy_arr[best], sads[best], pred_best

    return jax.vmap(one)(mb_y.astype(jnp.int32), mb_x.astype(jnp.int32),
                         mvx.astype(jnp.int32), mvy.astype(jnp.int32),
                         cur_mbs)


@partial(jax.jit, static_argnames=("radius",))
def dense_full_search(cur: jax.Array, ref_pad: jax.Array, radius: int):
    """Exhaustive integer-pel search, displacement-major and gather-free.

    The per-MB window formulation (full_search_sad) lowers each vmapped
    dynamic_slice to a serial XLA while-loop on TPU — the dominant cost
    of the whole encoder. Here the loop is over DISPLACEMENTS instead:
    for each (dy, dx) one dense |cur - shift(ref)| plane is pooled to
    per-8x8 SADs, and P16x16/P16x8/P8x16/P8x8 costs all fall out of the
    same pass as progressive 2x pools, so every partition shape gets the
    FULL search radius (the reference re-searches sub-partitions only
    locally, svc_motion_estimate.cpp).

    cur: [H, W] int source luma (16 | H, W). ref_pad: [H+2R, W+2R]
    edge-padded reference. Returns four (dy, dx, sad) triples, flattened
    raster-MB-major: 16x16 [n], 16x8 [2n] (top,bottom), 8x16 [2n]
    (left,right), 8x8 [4n] (row-major quadrants).
    """
    H, W = cur.shape
    span = 2 * radius + 1
    h8, w8 = H // 8, W // 8
    mbh, mbw = h8 // 2, w8 // 2
    cur16 = cur.astype(jnp.int16)
    ref16 = ref_pad.astype(jnp.int16)
    INF = jnp.int32(1 << 30)

    # derive the scan-carry init from the inputs (a constant init is
    # "unvarying" under shard_map and trips the scan vma check)
    d0 = jnp.abs(cur16 - jax.lax.slice(ref16, (radius, radius),
                                       (radius + H, radius + W)))
    z8 = d0.reshape(h8, 8, w8, 8).sum((1, 3), dtype=jnp.int32) * 0

    def init(z):
        return (z + INF, z)

    def body(best, dy):
        slab = jax.lax.dynamic_slice(ref16, (dy, 0), (H, W + 2 * radius))
        b16, bh, bv, b8 = best
        for dx in range(span):
            shft = jax.lax.slice(slab, (0, dx), (H, dx + W))
            d = jnp.abs(cur16 - shft)
            # pool with the lane (last) dim kept wide: a sublane-group
            # reduce, then lane-strided adds — reshaping 8 into the lane
            # dim forces a relayout per displacement and dominated the
            # whole scan
            rp = d.reshape(h8, 8, W).sum(1, dtype=jnp.int32)  # [h8, W]
            s8 = sum(rp[:, j::8] for j in range(8))           # [h8, w8]
            sh2 = s8[:, 0::2] + s8[:, 1::2]               # 16 wide, 8 high
            sv2 = s8[0::2] + s8[1::2]                     # 8 wide, 16 high
            s16 = sh2[0::2] + sh2[1::2]
            idx = dy * span + dx

            def upd(b, s):
                sad, bi = b
                better = s < sad
                return (jnp.where(better, s, sad),
                        jnp.where(better, idx, bi))

            b16 = upd(b16, s16)
            bh = upd(bh, sh2)
            bv = upd(bv, sv2)
            b8 = upd(b8, s8)
        return (b16, bh, bv, b8), None

    best0 = (init(z8.reshape(mbh, 2, mbw, 2).sum((1, 3))),
             init(z8.reshape(h8, mbw, 2).sum(-1)),
             init(z8.reshape(mbh, 2, w8).sum(1)),
             init(z8))
    best, _ = jax.lax.scan(body, best0, jnp.arange(span))

    def unpack(b, flat):
        sad, idx = b
        return (flat(idx // span - radius), flat(idx % span - radius),
                flat(sad))

    f16 = lambda a: a.reshape(-1)                                # noqa: E731
    fh = lambda a: a.reshape(mbh, 2, mbw).transpose(0, 2, 1) \
        .reshape(-1)                                             # noqa: E731
    fv = lambda a: a.reshape(-1)                                 # noqa: E731
    f8 = lambda a: a.reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3) \
        .reshape(-1)                                             # noqa: E731
    return (unpack(best[0], f16), unpack(best[1], fh),
            unpack(best[2], fv), unpack(best[3], f8))


@partial(jax.jit, static_argnames=("pad", "size"))
def subpel_full(planes: jax.Array, pad: int, mb_y: jax.Array,
                mb_x: jax.Array, mvx: jax.Array, mvy: jax.Array,
                cur_blks: jax.Array, size=16):
    """Full 7x7 quarter-pel refinement around an integer-pel winner.

    ONE batched window gather per partition shape (the hierarchical
    half-then-quarter subpel_refine gathers twice per shape and its
    vmapped dynamic_slice lowers serially); all 49 candidate predictions
    are static slices of the [4, SH+3, SW+3] window and the argmin runs
    vectorized. Searching the full quarter grid also dominates the
    reference's hierarchical refinement in quality.

    mvx/mvy: integer-pel winners in quarter units (frac == 0).
    Returns (mvx, mvy, sad, pred) with pred the exact spec-8.4.2.2.1
    prediction for the winning MV (so no separate MC pass is needed).
    """
    from .mc import QTAB
    SH, SW = (size, size) if isinstance(size, int) else size
    n = cur_blks.shape[0]
    p16 = planes.astype(jnp.int16)
    cur16 = cur_blks.astype(jnp.int16)

    ys = pad - 4 + mb_y + (mvy >> 2)                  # [n]
    xs = pad - 4 + mb_x + (mvx >> 2)
    oy = jnp.arange(SH + 3)
    ox = jnp.arange(SW + 3)
    win = p16[:, ys[:, None, None] + oy[None, :, None],
              xs[:, None, None] + ox[None, None, :]]  # [4,n,SH+3,SW+3]

    best_sad = jnp.full((n,), jnp.int32(1 << 30))
    best_t = jnp.zeros((n,), jnp.int32)
    best_pred = jnp.zeros((n, SH, SW), jnp.int16)
    for ty in range(-3, 4):
        for tx in range(-3, 4):
            k = (ty & 3) * 4 + (tx & 3)
            p1, dy1, dx1, p2, dy2, dx2 = (int(v) for v in QTAB[k])
            ry = 2 + (ty >> 2)
            rx = 2 + (tx >> 2)
            t1 = win[p1, :, ry + dy1:ry + dy1 + SH, rx + dx1:rx + dx1 + SW]
            t2 = win[p2, :, ry + dy2:ry + dy2 + SH, rx + dx2:rx + dx2 + SW]
            pred = (t1 + t2 + 1) >> 1
            sad = jnp.abs(pred - cur16).sum((1, 2), dtype=jnp.int32)
            better = sad < best_sad
            best_sad = jnp.where(better, sad, best_sad)
            best_t = jnp.where(better, (ty + 3) * 7 + (tx + 3), best_t)
            best_pred = jnp.where(better[:, None, None], pred, best_pred)
    return (mvx + best_t % 7 - 3, mvy + best_t // 7 - 3, best_sad,
            best_pred.astype(jnp.int32))


@partial(jax.jit, static_argnames=("pad",))
def subpel_quad(planes: jax.Array, pad: int, by8: jax.Array,
                bx8: jax.Array, mvx: jax.Array, mvy: jax.Array,
                src8: jax.Array, part: jax.Array):
    """Quadrant-granular joint quarter-pel refinement.

    Every partition shape's prediction decomposes into its 8x8 quadrant
    predictions (mvq), and a block SAD is the sum of its quadrant SADs —
    so ONE [4,11,11] window gather per quadrant serves every shape:
    candidate SADs are computed per quadrant for the full 7x7 quarter
    grid and pooled per partition UNIT of the chosen shape (16x16 pools
    all 4 quadrants, 16x8 the top/bottom pairs, ...), which makes the
    joint refinement bit-identical to refining the whole partition while
    gathering 3.5x fewer window elements than per-shape windows.

    by8/bx8: [4n] quadrant pixel coords (row-major within raster MBs).
    mvx/mvy: [4n] integer-pel winners (quarter units, frac == 0) of the
    CHOSEN partition per quadrant. part: [n] 0/1/2/3 =
    P16x16/P16x8/P8x16/P8x8. Returns (mvqx, mvqy, sad_tot, pred_q):
    refined per-quadrant MVs [4n], per-MB total SAD of the chosen
    partition [n], and exact spec-8.4.2.2.1 quadrant predictions
    [4n,8,8] int32.
    """
    from .mc import QTAB
    m = src8.shape[0]
    n = m // 4
    p16 = planes.astype(jnp.int16)
    # block-axis-LAST layout so every candidate's abs/avg/reduce runs
    # over m full lanes (a [m,8,8] layout reduces over 8-lane rows)
    cur16 = src8.astype(jnp.int16).transpose(1, 2, 0)   # [8,8,m]

    ys = pad - 4 + by8 + (mvy >> 2)
    xs = pad - 4 + bx8 + (mvx >> 2)
    oy = jnp.arange(11)
    win = p16[:, ys[None, None, :] + oy[:, None, None],
              xs[None, None, :] + oy[None, :, None]]    # [4,11,11,m]

    def cand(ty, tx):
        k = (ty & 3) * 4 + (tx & 3)
        p1, dy1, dx1, p2, dy2, dx2 = (int(v) for v in QTAB[k])
        ry = 2 + (ty >> 2)
        rx = 2 + (tx >> 2)
        t1 = win[p1, ry + dy1:ry + dy1 + 8, rx + dx1:rx + dx1 + 8]
        t2 = win[p2, ry + dy2:ry + dy2 + 8, rx + dx2:rx + dx2 + 8]
        return (t1 + t2 + 1) >> 1                       # [8,8,m]

    offs = [(ty, tx) for ty in range(-3, 4) for tx in range(-3, 4)]

    # online joint refinement: candidates are computed ONCE; each one's
    # per-quadrant SADs are pooled into the CHOSEN partition's units
    # (part is decided before subpel) and the running per-unit best
    # carries the winning prediction along — no second candidate pass,
    # no [49,...] SAD tensor (the recompute-behind-a-where-chain
    # formulation paid every candidate twice).
    pn = part[:, None]
    lanes_per_unit = jnp.where(pn == 0, 4,
                               jnp.where(pn == 3, 1, 2))    # [n,1]->[n,4]
    lanes_per_unit = jnp.broadcast_to(lanes_per_unit, (n, 4))

    def pool(qsad):                       # [n,4] -> per-lane unit SAD
        s16 = qsad.sum(1, keepdims=True)
        sh = qsad.reshape(n, 2, 2).sum(-1)          # units (01)(23)
        sv = qsad.reshape(n, 2, 2).sum(-2)          # units (02)(13)
        q = jnp.arange(4)
        u = jnp.where(pn == 1, sh[:, q // 2],
                      jnp.broadcast_to(s16, (n, 4)))
        u = jnp.where(pn == 2, sv[:, q % 2], u)
        return jnp.where(pn == 3, qsad, u)

    big = jnp.int32(1 << 30)
    best_usad = jnp.full((n, 4), big, jnp.int32)
    best_i = jnp.zeros((n, 4), jnp.int32)
    pred_q = jnp.zeros((8, 8, m), jnp.int16)
    for i, (ty, tx) in enumerate(offs):
        c = cand(ty, tx)
        qsad = jnp.abs(c - cur16).sum((0, 1), dtype=jnp.int32) \
            .reshape(n, 4)
        usad = pool(qsad)
        better = usad < best_usad
        best_usad = jnp.where(better, usad, best_usad)
        best_i = jnp.where(better, i, best_i)
        pred_q = jnp.where(better.reshape(m)[None, None, :], c, pred_q)
    sad_tot = (best_usad // lanes_per_unit).sum(1)

    t_q = best_i.reshape(m)
    tys = jnp.asarray([o[0] for o in offs], jnp.int32)
    txs = jnp.asarray([o[1] for o in offs], jnp.int32)
    return (mvx + txs[t_q], mvy + tys[t_q], sad_tot,
            pred_q.transpose(2, 0, 1).astype(jnp.int32))


@partial(jax.jit, static_argnames=())
def intra_sad_proxy(cur_mbs: jax.Array):
    """Cheap intra cost proxy: SAD to the MB mean (DC prediction bound).

    Mirrors the role of the reference's intra cost in P-slice mode
    decision (svc_base_layer_md.cpp) without running full intra search.
    """
    mean = (cur_mbs.sum(axis=(1, 2), keepdims=True) + 128) // 256
    return jnp.abs(cur_mbs - mean).sum(axis=(1, 2))
