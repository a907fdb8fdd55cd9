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


@partial(jax.jit, static_argnames=("radius",))
def full_search_sad(cur_mbs: jax.Array, ref_pad: jax.Array, mb_y: jax.Array,
                    mb_x: jax.Array, radius: int = 16):
    """Exhaustive integer-pel 16x16 search.

    cur_mbs: [n,16,16] int32 source MBs.
    ref_pad: reference luma edge-padded by `radius` on every side.
    mb_y/mb_x: [n] top-left pixel coords of each MB (unpadded frame).
    Returns (best_dy, best_dx, best_sad, zero_sad): [n] each, offsets in
    integer pixels relative to the colocated position.
    """
    span = 2 * radius + 1

    def one_mb(cur, y, x):
        # window of all candidate 16x16 blocks: [(2R+16) x (2R+16)]
        win = jax.lax.dynamic_slice(ref_pad, (y, x),
                                    (2 * radius + 16, 2 * radius + 16))
        win = win.astype(jnp.int32)
        # all 16x16 patches in one XLA op: [1, 256, span, span]
        patches = jax.lax.conv_general_dilated_patches(
            win[None, None].astype(jnp.float32), (16, 16), (1, 1), "VALID")
        patches = patches[0].astype(jnp.int32)          # [256, span, span]
        sads = jnp.abs(patches - cur.reshape(256, 1, 1)).sum(axis=0)
        flat = sads.reshape(-1)
        best = jnp.argmin(flat)
        return (best // span - radius, best % span - radius, flat[best],
                sads[radius, radius])

    return jax.vmap(one_mb)(cur_mbs, mb_y, mb_x)


@partial(jax.jit, static_argnames=())
def intra_sad_proxy(cur_mbs: jax.Array):
    """Cheap intra cost proxy: SAD to the MB mean (DC prediction bound).

    Mirrors the role of the reference's intra cost in P-slice mode
    decision (svc_base_layer_md.cpp) without running full intra search.
    """
    mean = (cur_mbs.sum(axis=(1, 2), keepdims=True) + 128) // 256
    return jnp.abs(cur_mbs - mean).sum(axis=(1, 2))
