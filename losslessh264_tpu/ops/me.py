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


@partial(jax.jit, static_argnames=())
def intra_sad_proxy(cur_mbs: jax.Array):
    """Cheap intra cost proxy: SAD to the MB mean (DC prediction bound).

    Mirrors the role of the reference's intra cost in P-slice mode
    decision (svc_base_layer_md.cpp) without running full intra search.
    """
    mean = (cur_mbs.sum(axis=(1, 2), keepdims=True) + 128) // 256
    return jnp.abs(cur_mbs - mean).sum(axis=(1, 2))
