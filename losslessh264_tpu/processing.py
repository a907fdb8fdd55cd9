"""Video pre-processing library (JAX, TPU-first, whole-frame batched).

TPU-native equivalent of the reference's `codec/processing` plugin
library (IWelsVP): every analysis that the reference computes with
per-8x8/16x16 scalar+SIMD loops is a whole-frame reduction here.

Reference parity (behavior, per component):
- VAA calc          processing/src/vaacalc/vaacalcfuncs.cpp (pSad8x8,
                    pSsd16x16, pSum16x16, pSumOfSquare16x16; zero-MV SAD
                    against the co-located reference block)
- Scene change      processing/src/scenechangedetection/
                    SceneChangeDetection.h:52-56,111 (8x8 SAD >
                    HIGH_MOTION_BLOCK_THRESHOLD=320 counted as motion
                    block; ratio > 0.85/0.5 thresholds)
- Adaptive quant    processing/src/adaptivequantization/
                    AdaptiveQuantization.cpp:93-176 (motion/texture
                    indices -> per-MB delta QP, integer model, range ±6)
- Downsample        processing/src/downsample (dyadic mean pyramid)
- Complexity        processing/src/complexityanalysis/
                    ComplexityAnalysis.cpp (frame SAD complexity)
- Background det.   processing/src/backgrounddetection (low-SAD low-
                    texture blocks flagged static)
- Scroll detection  processing/src/scrolldetection (dominant vertical
                    shift via line matching)
- Denoise           processing/src/denoise/denoise.cpp (edge-preserving
                    smoothing of flat regions)
- Image rotate      processing/src/imagerotate
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# scene change thresholds (SceneChangeDetection.h:52-55)
HIGH_MOTION_BLOCK_THRESHOLD = 320
SCENE_CHANGE_RATIO_LARGE = 0.85
SCENE_CHANGE_RATIO_MEDIUM = 0.50

# AQ integer-model constants (AdaptiveQuantization.cpp:38-42, util.h:62-65)
AQ_INT_MULTIPLY = 10_000_000
AQ_TIME_INT_MULTIPLY = 10_000
AQ_QSTEP_INT_MULTIPLY = 100
AQ_PESN = 10
AVERAGE_TIME_MOTION = 3000
AVERAGE_TIME_TEXTURE_QUALITYMODE = 10_000
AVERAGE_TIME_TEXTURE_BITRATEMODE = 8750
MODEL_ALPHA = 9910
MODEL_TIME = 58185

AQ_QUALITY_MODE = 0
AQ_BITRATE_MODE = 1


class VaaResult(NamedTuple):
    sad8x8: jax.Array        # [mb_h, mb_w, 4] zero-MV SAD per 8x8 quadrant
    ssd16x16: jax.Array      # [mb_h, mb_w] sum of squared diffs per MB
    sum16x16: jax.Array      # [mb_h, mb_w] sum of cur samples per MB
    sqsum16x16: jax.Array    # [mb_h, mb_w] sum of squared cur samples


def _block_reduce(x, by, bx):
    """Sum over non-overlapping (by,bx) blocks of [H,W] -> [H/by, W/bx]."""
    H, W = x.shape
    return x.reshape(H // by, by, W // bx, bx).sum(axis=(1, 3))


@jax.jit
def vaa_calc(cur: jax.Array, ref: jax.Array) -> VaaResult:
    """Variance/SAD analysis of a luma frame vs the previous one."""
    c = cur.astype(jnp.int32)
    r = ref.astype(jnp.int32)
    d = jnp.abs(c - r)
    sad8 = _block_reduce(d, 8, 8)                        # [H/8, W/8]
    mh, mw = sad8.shape[0] // 2, sad8.shape[1] // 2
    sad8x8 = sad8.reshape(mh, 2, mw, 2).transpose(0, 2, 1, 3).reshape(
        mh, mw, 4)
    ssd = _block_reduce((c - r) * (c - r), 16, 16)
    s = _block_reduce(c, 16, 16)
    sq = _block_reduce(c * c, 16, 16)
    return VaaResult(sad8x8, ssd, s, sq)


@jax.jit
def scene_change_score(cur: jax.Array, ref: jax.Array) -> jax.Array:
    """Fraction of 8x8 blocks whose zero-MV SAD exceeds the high-motion
    threshold (SceneChangeDetection.h:111). Compare against
    SCENE_CHANGE_RATIO_* to classify."""
    d = jnp.abs(cur.astype(jnp.int32) - ref.astype(jnp.int32))
    sad8 = _block_reduce(d, 8, 8)
    return (sad8 > HIGH_MOTION_BLOCK_THRESHOLD).mean()


def is_scene_change(cur, ref, ratio: float = SCENE_CHANGE_RATIO_LARGE):
    return bool(scene_change_score(cur, ref) > ratio)


@functools.partial(jax.jit, static_argnames=("mode",))
def adaptive_quant_map(cur: jax.Array, ref: jax.Array,
                       mode: int = AQ_QUALITY_MODE):
    """Per-MB delta-QP map [mb_h, mb_w] int8 plus the average delta.

    Same model as AdaptiveQuantization.cpp Process (each MB's
    motion/texture index is compared against a weighted frame average
    through dqp = MODEL_TIME * (a - 1) / (a + MODEL_ALPHA); texture term
    always applied, motion term when negative in quality mode), with the
    reference's 1e11-range fixed-point intermediates restated in
    normalized float32 (int64 is unavailable on this accelerator path).
    Per-component range is ±~5.9, total in [-12, +6] for quality mode.
    """
    vaa = vaa_calc(cur, ref)
    sum_diff = (vaa.sad8x8.sum(axis=2) >> 8).astype(jnp.float32)
    motion = ((vaa.ssd16x16 >> 8).astype(jnp.float32) - sum_diff * sum_diff)
    usum = (vaa.sum16x16 >> 8).astype(jnp.float32)
    texture = ((vaa.sqsum16x16 >> 8).astype(jnp.float32) - usum * usum)

    alpha = MODEL_ALPHA / AQ_TIME_INT_MULTIPLY        # 0.991
    gain = MODEL_TIME / AQ_TIME_INT_MULTIPLY          # 5.8185
    w_motion = AVERAGE_TIME_MOTION / AQ_TIME_INT_MULTIPLY
    w_texture = ((AVERAGE_TIME_TEXTURE_QUALITYMODE
                  if mode == AQ_QUALITY_MODE else
                  AVERAGE_TIME_TEXTURE_BITRATEMODE) / AQ_TIME_INT_MULTIPLY)

    def component(idx, weight):
        avg = idx.mean()
        avg = jnp.where(jnp.abs(avg) <= 1e-6, 1.0, avg) * weight
        a = idx / avg
        return gain * (a - 1.0) / (a + alpha)

    dqp = component(texture, w_texture)
    dqp_m = component(motion, w_motion)
    add_motion = (dqp_m < 0) if mode == AQ_QUALITY_MODE else True
    dqp = dqp + jnp.where(add_motion, dqp_m, 0.0)
    dqp_final = jnp.trunc(dqp).astype(jnp.int8)
    return dqp_final, dqp.mean()


@jax.jit
def downsample2x(plane: jax.Array) -> jax.Array:
    """Dyadic halve with rounding ((a+b+c+d+2)>>2, the reference's
    DyadicBilinearDownsampler)."""
    p = plane.astype(jnp.int32)
    H, W = p.shape
    q = p[:H & ~1, :W & ~1].reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3))
    return ((q + 2) >> 2).astype(jnp.uint8)


def upsample2x(plane: jax.Array) -> jax.Array:
    """Dyadic 2x integer bilinear upsample (co-sited with downsample2x):
    even samples copy, odd samples round-average their neighbors (edge
    clamp). Deterministic integer math — the inter-layer prediction
    contract between SimulcastEncoder and SimulcastDecoder depends on
    both sides computing the identical plane. (The reference SVC
    upsampler is a 4-tap poly-phase filter, downsample.cpp /
    svc_mode_decision.cpp inter-layer intra; this is the compact dyadic
    equivalent for the residual-domain scalability design.)"""
    p = plane.astype(jnp.int32)
    H, W = p.shape
    right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    row_even = p
    row_odd = (p + right + 1) >> 1
    rows = jnp.stack([row_even, row_odd], axis=2).reshape(H, 2 * W)
    below = jnp.concatenate([rows[1:], rows[-1:]], axis=0)
    out = jnp.stack([rows, (rows + below + 1) >> 1], axis=1)
    return out.reshape(2 * H, 2 * W).astype(jnp.uint8)


def downsample_pyramid(plane, levels: int):
    """[full, 1/2, 1/4, ...] dyadic pyramid (encoder pre-process uses a
    3-level pyramid for hierarchical ME)."""
    out = [plane]
    for _ in range(levels - 1):
        out.append(downsample2x(out[-1]))
    return out


@jax.jit
def frame_complexity(cur: jax.Array, ref: jax.Array) -> jax.Array:
    """Frame SAD complexity (ComplexityAnalysis FRAME_SAD method)."""
    return jnp.abs(cur.astype(jnp.int32) - ref.astype(jnp.int32)).sum()


@jax.jit
def background_mask(cur: jax.Array, ref: jax.Array):
    """Per-MB background flag: all four 8x8 quadrants below the motion
    threshold and low residual energy (BackgroundDetection's static-block
    criterion, simplified to its SAD test)."""
    vaa = vaa_calc(cur, ref)
    quiet = (vaa.sad8x8 < HIGH_MOTION_BLOCK_THRESHOLD // 4).all(axis=2)
    low_ssd = vaa.ssd16x16 < (HIGH_MOTION_BLOCK_THRESHOLD * 4)
    return quiet & low_ssd


@functools.partial(jax.jit, static_argnames=("max_shift",))
def scroll_detect(cur: jax.Array, ref: jax.Array, max_shift: int = 32):
    """Detect a dominant vertical scroll: best dy in [-max_shift,
    max_shift] minimizing row-profile SAD (scrolldetection's line-match
    search, done as one batched reduction)."""
    c = cur.astype(jnp.int32).mean(axis=1)
    r = ref.astype(jnp.int32).mean(axis=1)
    H = c.shape[0]
    span = H - max_shift * 2

    def cost(i):
        dy = i - max_shift
        cs = jax.lax.dynamic_slice(c, (max_shift + dy,), (span,))
        rs = jax.lax.dynamic_slice(r, (max_shift,), (span,))
        return jnp.abs(cs - rs).sum()

    costs = jax.vmap(cost)(jnp.arange(2 * max_shift + 1))
    best = jnp.argmin(costs)
    dy = -(best - max_shift)   # cur[y] ~= ref[y + dy]
    detected = (costs[best] * 2 < costs[max_shift]) & (dy != 0)
    return detected, dy


@jax.jit
def denoise(Y: jax.Array) -> jax.Array:
    """Edge-preserving smoothing: 3x3 mean applied only where local
    activity is below threshold (denoise.cpp's flat-region filter)."""
    p = Y.astype(jnp.int32)
    pad = jnp.pad(p, 1, mode="edge")
    acc = jnp.zeros_like(p)
    for dy in range(3):
        for dx in range(3):
            acc = acc + pad[dy:dy + p.shape[0], dx:dx + p.shape[1]]
    mean = (acc + 4) // 9
    var = jnp.abs(p - mean)
    return jnp.where(var < 8, mean, p).astype(jnp.uint8)


def image_rotate(plane, degrees: int):
    """90-degree-step rotation (imagerotate plugin)."""
    k = (degrees // 90) % 4
    return jnp.rot90(plane, k=-k) if k else plane
