"""TPU-batched encoder front-end (JAX): mode decision, ME, transforms.

The analysis half of the encoder as whole-frame JAX programs:

- Inter path: exhaustive integer-pel ME (ops/me.py; up to 2 reference
  frames chosen per MB via width-concatenated reference planes) +
  batched half/quarter-pel refinement that hands back the winning
  prediction, 4-way partition decision (16x16/16x8/8x16/8x8), then
  residual fDCT/quant/recon for every P MB as one batched kernel chain
  — there is no per-MB host loop at all. Per frame the whole analysis
  is ONE fused program (_p_analyze) with a single int8-packed
  device->host fetch; recon + in-loop deblock (_p_finish, the Pallas
  wavefront kernel) overlap the host entropy write.
- Intra path: I16x16/I4x4 + chroma mode decision scheduled as a slope-2
  MB wavefront (lax.scan over anti-diagonals, vmap across the
  diagonal), since intra prediction consumes reconstructed LEFT/ABOVE
  pixels.

Entropy/NAL assembly stays in the native layer (pip_encode_frame) — the
same CAVLC/CABAC writers the recompression recode path uses. Features:
multi-slice, AQ, frame+GOM rate control, 2 temporal layers, LTR,
2 reference frames, arbitrary even resolutions (SPS cropping).

Reference parity (behavior, not structure): codec/encoder/core —
svc_motion_estimate.cpp (ME; reference walks diamond/cross per MB, we
evaluate the whole window batched), md.cpp + svc_base_layer_md.cpp (mode
decision), encode_mb_aux.cpp (forward transforms). The in-loop recon here
is bit-exact with the decoder: with deblock=True (default) the loop
filter runs encoder-side as the shared ops/deblock.py wavefront and the
slice headers carry disable_deblocking_filter_idc=0 (2 for multi-slice);
with deblock=False the headers carry idc=1 and recon stays unfiltered.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import decoder_np as dn
from . import ratectl
from .ops import deblock as jdb
from .ops import intra as jintra
from .ops import mc as jmc
from .ops import me as jme
from .ops import transform as jt
from .ops import wavefront as jwf

PAD = 32          # reference-plane padding (matches decoder_jax)
WPAD = 8          # working-plane padding for wavefront gathers

# Module-level lookup tables stay NUMPY: numpy closures bake into the
# compiled program as constants at trace time, while a captured jax
# Array becomes an extra runtime buffer argument bound to a live device
# allocation (and on the axon tunnel backend, running such a program
# forces the runtime out of its deferred-dispatch mode). Convert with
# jnp.asarray at the traced-index use site only.
BIG = 1 << 30

CHROMA_QP = np.asarray(dn.CHROMA_QP)


def _diagonals(mb_w, mb_h):
    """Slope-2 wavefront MB schedule (same as decoder_jax)."""
    diags = {}
    for i in range(mb_w * mb_h):
        y, x = divmod(i, mb_w)
        diags.setdefault(2 * y + x, []).append(i)
    nd = 2 * (mb_h - 1) + mb_w
    K = max(len(v) for v in diags.values())
    out = np.full((nd, K), -1, np.int32)
    for d, v in diags.items():
        out[d, :len(v)] = v
    return out


def _mb_tiles(plane, mb_h, mb_w, t):
    """[H,W] -> [n,t,t] MB tiles."""
    return plane.reshape(mb_h, t, mb_w, t).transpose(0, 2, 1, 3) \
        .reshape(mb_h * mb_w, t, t)


def _tiles_to_plane(tiles, mb_h, mb_w, t):
    return tiles.reshape(mb_h, mb_w, t, t).transpose(0, 2, 1, 3) \
        .reshape(mb_h * t, mb_w * t)


def _blocks16(tile16):
    """[..,16,16] -> [..,16,4,4] raster 4x4 blocks."""
    s = tile16.shape[:-2]
    return tile16.reshape(s + (4, 4, 4, 4)).swapaxes(-3, -2) \
        .reshape(s + (16, 4, 4))


def _blocks4(tile8):
    """[..,8,8] -> [..,4,4,4] raster 4x4 blocks."""
    s = tile8.shape[:-2]
    return tile8.reshape(s + (2, 4, 2, 4)).swapaxes(-3, -2) \
        .reshape(s + (4, 4, 4))


def _assemble16(blocks):
    """[..,16,4,4] -> [..,16,16]."""
    s = blocks.shape[:-3]
    return blocks.reshape(s + (4, 4, 4, 4)).swapaxes(-3, -2) \
        .reshape(s + (16, 16))


def _assemble8(blocks):
    s = blocks.shape[:-3]
    return blocks.reshape(s + (2, 2, 4, 4)).swapaxes(-3, -2) \
        .reshape(s + (8, 8))


FLAT4 = np.full((4, 4), 16, np.int32)

# SAD-domain Lagrange multiplier per QP (JM-style sqrt(lambda_mode) =
# 0.92 * 2^((qp-12)/6); reference md.cpp uses the same exponential family)
LAMBDA = np.asarray(
    [max(1, round(0.92 * 2.0 ** ((q - 12) / 6.0))) for q in range(52)],
    np.int32)

# 4x4 block coding order within an MB and the top-right availability kind
# per raster block (0 never, 1 always, 2 = MB aT, 3 = MB aTR) — same
# derivation as the decoder wavefront (decoder_jax).
BLK = jintra.BLK_ORDER
_I4_TR_KIND = np.zeros(16, np.int64)
for _d, _r in enumerate(BLK):
    _by, _bx = divmod(int(_r), 4)
    if _by == 0:
        _I4_TR_KIND[_r] = 2 if _bx < 3 else 3
    elif _bx == 3:
        _I4_TR_KIND[_r] = 0
    else:
        _nb = (_by - 1) * 4 + _bx + 1
        _I4_TR_KIND[_r] = 1 if list(BLK).index(_nb) < _d else 0


# ---------------------------------------------------------------------------
# per-MB intra encode (runs inside the wavefront, vmapped across a diagonal)
# ---------------------------------------------------------------------------
def _encode_i16_mb(loc, src, qp, aL, aT):
    """loc [17,25] luma recon context; src [16,16]. Returns
    (mode, qdc_zz[16], qac[16,4,4], tile[16,16], best_sad)."""
    left = loc[1:17, 0]
    top = loc[0, 1:17]
    preds = jintra.pred16_all(left, top, loc[0, 0], aL, aT)  # [4,16,16]
    sads = jnp.abs(src[None] - preds).sum(axis=(1, 2))
    legal = jnp.stack([aT, aL, jnp.array(True), aL & aT])
    sads = jnp.where(legal, sads, BIG)
    mode = jnp.argmin(sads)
    pred = preds[mode]

    resid = src - pred
    W = jt.fdct4x4(_blocks16(resid))                 # [16,4,4]
    qac = jt.quant4(W, jnp.full((16,), qp), True, skip_dc=True)
    Wdc = W[:, 0, 0].reshape(4, 4)
    qdc = jt.quant_dc4(jt.fhadamard4x4(Wdc), qp)     # [4,4]

    # decoder-exact recon
    dcd = jt.luma_dc_dequant(jt.hadamard4x4(qdc), qp, jnp.int32(16))
    deq = jt.dequant4(qac, jnp.full((16,), qp), FLAT4)
    deq = deq.at[:, 0, 0].set(dcd.reshape(16))
    rec = _assemble16(jt.idct4x4(deq))
    tile = jnp.clip(pred + rec, 0, 255)
    return mode.astype(jnp.int32), jt.zigzag4(qdc), qac, tile, sads[mode]


def _encode_i4_mb(loc, src, qp, aL, aT, aTR):
    """I4x4 mode decision + encode: 16 blocks in coding order over the
    local buffer (sequential — each block predicts from the previous
    blocks' reconstruction, 8.3.1). loc [17,25]; src [16,16].
    Returns (modes[16] raster, qac[16,4,4], rd_cost, tile[16,16]).

    The mode-bit cost uses the 8.3.1.1 most-probable-mode rule with
    cross-MB neighbors approximated as DC (affects only the RD estimate,
    never conformance — the writer computes the true predictor)."""
    lam = jnp.asarray(LAMBDA)[qp]
    loc_buf = loc
    grid = jnp.full((5, 5), 2, jnp.int32)   # chosen modes, border = DC
    modes = jnp.zeros(16, jnp.int32)
    qac = jnp.zeros((16, 4, 4), jnp.int32)
    total = jnp.int32(0)
    mode_idx = jnp.arange(9)
    for d in range(16):
        r = int(BLK[d])
        by, bx = divmod(r, 4)
        ly, lx = 1 + by * 4, 1 + bx * 4
        leftv = jax.lax.dynamic_slice(loc_buf, (ly, lx - 1), (4, 1))[:, 0]
        topv = jax.lax.dynamic_slice(loc_buf, (ly - 1, lx), (1, 8))[0]
        tl = loc_buf[ly - 1, lx - 1]
        kind = int(_I4_TR_KIND[r])
        if kind == 0:
            trv = jnp.array(False)
        elif kind == 1:
            trv = jnp.array(True)
        elif kind == 2:
            trv = aT
        else:
            trv = aTR
        topv = jnp.where(jnp.arange(8) < 4, topv,
                         jnp.where(trv, topv, topv[3]))
        blk_aL = aL if bx == 0 else jnp.array(True)
        blk_aT = aT if by == 0 else jnp.array(True)
        preds = jintra.pred4_all(leftv, topv, tl, blk_aL, blk_aT)  # [9,4,4]
        srcb = src[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
        sads = jnp.abs(preds - srcb[None]).sum(axis=(1, 2))
        legal = jnp.stack([blk_aT, blk_aL, jnp.array(True), blk_aT,
                           blk_aL & blk_aT, blk_aL & blk_aT,
                           blk_aL & blk_aT, blk_aT, blk_aL])
        pm = jnp.where(blk_aL & blk_aT,
                       jnp.minimum(grid[1 + by, bx], grid[by, 1 + bx]), 2)
        cost = sads + lam * jnp.where(mode_idx == pm, 1, 4)
        cost = jnp.where(legal, cost, BIG)
        m = jnp.argmin(cost)
        total = total + cost[m]
        grid = grid.at[1 + by, 1 + bx].set(m.astype(jnp.int32))
        modes = modes.at[r].set(m.astype(jnp.int32))
        resid = srcb - preds[m]
        q = jt.quant4(jt.fdct4x4(resid), qp, True)
        deq = jt.dequant4(q, qp, FLAT4)
        rec = jnp.clip(preds[m] + jt.idct4x4(deq), 0, 255)
        loc_buf = jax.lax.dynamic_update_slice(loc_buf, rec, (ly, lx))
        qac = qac.at[r].set(q)
    return modes, qac, total, loc_buf[1:17, 1:17]


def _encode_luma_mb(loc, src, qp, aL, aT, aTR):
    """I16x16-vs-I4x4 luma mode decision for one intra MB. Returns
    (cls 0/1, i16_mode, i4_modes[16], qdc_zz[16], qac[16,4,4], tile)."""
    mode16, qdc, qac16, tile16, sad16 = _encode_i16_mb(loc, src, qp, aL, aT)
    modes4, qac4, cost4, tile4 = _encode_i4_mb(loc, src, qp, aL, aT, aTR)
    lam = jnp.asarray(LAMBDA)[qp]
    use4 = cost4 < sad16 + lam * 6   # I16 header/mode-bit allowance
    cls = jnp.where(use4, 0, 1).astype(jnp.int32)
    return (cls, mode16, modes4,
            jnp.where(use4, 0, qdc),
            jnp.where(use4, qac4, qac16),
            jnp.where(use4, tile4, tile16))


def _encode_chroma_mb(locu, locv, srcu, srcv, qpc, aL, aT):
    """Intra chroma for one MB: shared U/V mode decision +
    transform/quant/recon. Returns (cmode, qdc[2,4], qac[2,4,16] zz,
    tileU, tileV)."""
    predsu = jintra.pred_chroma_all(locu[1:9, 0], locu[0, 1:9], locu[0, 0],
                                    aL, aT)
    predsv = jintra.pred_chroma_all(locv[1:9, 0], locv[0, 1:9], locv[0, 0],
                                    aL, aT)
    sads = (jnp.abs(srcu[None] - predsu).sum(axis=(1, 2)) +
            jnp.abs(srcv[None] - predsv).sum(axis=(1, 2)))
    legal = jnp.stack([jnp.array(True), aL, aT, aL & aT])
    cmode = jnp.argmin(jnp.where(legal, sads, BIG))
    predu = predsu[cmode]
    predv = predsv[cmode]

    qdcs, qacs, tiles = [], [], []
    for src, pred in ((srcu, predu), (srcv, predv)):
        resid = src - pred
        W = jt.fdct4x4(_blocks4(resid))              # [4,4,4]
        qac = jt.quant4(W, jnp.full((4,), qpc), True, skip_dc=True)
        Wd2 = W[:, 0, 0].reshape(2, 2)
        qd2 = jt.quant_dc2(jt.fhadamard2x2(Wd2), qpc)
        dcd = jt.chroma_dc_transform_dequant(qd2, qpc, jnp.int32(16))
        deq = jt.dequant4(qac, jnp.full((4,), qpc), FLAT4)
        deq = deq.at[:, 0, 0].set(dcd.reshape(4))
        rec = _assemble8(jt.idct4x4(deq))
        qdcs.append(qd2.reshape(4))
        qacs.append(jt.zigzag4(qac))
        tiles.append(jnp.clip(pred + rec, 0, 255))
    return (cmode.astype(jnp.int32), jnp.stack(qdcs), jnp.stack(qacs),
            tiles[0], tiles[1])


# ---------------------------------------------------------------------------
# intra wavefront over a frame (used by I frames and P intra-fallback MBs)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h"))
def intra_wavefront(mb_w: int, mb_h: int, srcY, srcU, srcV, inter_y, inter_u,
                    inter_v, is_intra, qp, qpc, diags, row_slice):
    """Encode all intra MBs of a frame as a slope-2 wavefront.

    inter_*: [n,16,16]/[n,8,8] already-reconstructed inter tiles (zeros
    where intra); is_intra: [n]; qp/qpc: per-MB [n] (adaptive
    quantization). Returns per-MB symbol planes + final recon planes.
    """
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    srcY_t = _mb_tiles(srcY.astype(jnp.int32), mb_h, mb_w, 16)
    srcU_t = _mb_tiles(srcU.astype(jnp.int32), mb_h, mb_w, 8)
    srcV_t = _mb_tiles(srcV.astype(jnp.int32), mb_h, mb_w, 8)

    Yw = jnp.zeros((H + 2 * WPAD, W + 2 * WPAD), jnp.int32)
    Uw = jnp.zeros((H // 2 + 2 * WPAD, W // 2 + 2 * WPAD), jnp.int32)
    Vw = jnp.zeros_like(Uw)
    Yw = Yw.at[WPAD:WPAD + H, WPAD:WPAD + W].set(
        _tiles_to_plane(inter_y, mb_h, mb_w, 16))
    Uw = Uw.at[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].set(
        _tiles_to_plane(inter_u, mb_h, mb_w, 8))
    Vw = Vw.at[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].set(
        _tiles_to_plane(inter_v, mb_h, mb_w, 8))

    i16_mode = jnp.zeros((n,), jnp.int32)
    intra_cls = jnp.ones((n,), jnp.int32)     # 0 = I4x4, 1 = I16x16
    i4_modes = jnp.full((n, 16), 2, jnp.int32)
    chroma_mode = jnp.zeros((n,), jnp.int32)
    luma_dc = jnp.zeros((n, 16), jnp.int32)
    luma_ac = jnp.zeros((n, 16, 4, 4), jnp.int32)
    chroma_dc = jnp.zeros((n, 2, 4), jnp.int32)
    chroma_ac = jnp.zeros((n, 2, 4, 16), jnp.int32)

    def diag_step(carry, mb_list):
        (Yw, Uw, Vw, i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc,
         luma_ac, chroma_dc, chroma_ac) = carry

        def compute(mb):
            mb_c = jnp.clip(mb, 0, n - 1)
            my = mb_c // mb_w
            mx = mb_c % mb_w
            aL = mx > 0
            same_slice_up = row_slice[my] == row_slice[jnp.maximum(my - 1, 0)]
            aT = (my > 0) & same_slice_up
            aTR = aT & (mx < mb_w - 1)
            y0 = my * 16 + WPAD
            x0 = mx * 16 + WPAD
            loc = jax.lax.dynamic_slice(Yw, (y0 - 1, x0 - 1), (17, 25))
            cls, mode, m4, qdc, qac, tile = _encode_luma_mb(
                loc, srcY_t[mb_c], qp[mb_c], aL, aT, aTR)
            cy = my * 8 + WPAD
            cx = mx * 8 + WPAD
            locu = jax.lax.dynamic_slice(Uw, (cy - 1, cx - 1), (9, 9))
            locv = jax.lax.dynamic_slice(Vw, (cy - 1, cx - 1), (9, 9))
            cmode, cdc, cac, tu, tv = _encode_chroma_mb(
                locu, locv, srcU_t[mb_c], srcV_t[mb_c], qpc[mb_c], aL, aT)
            return (cls, mode, m4, qdc, qac, cmode, cdc, cac, tile, tu, tv,
                    y0, x0, cy, cx)

        (clss, modes, m4s, qdcs, qacs, cmodes, cdcs, cacs, tiles, tus, tvs,
         y0s, x0s, cys, cxs) = jax.vmap(compute)(mb_list)

        do = (mb_list >= 0) & is_intra[jnp.clip(mb_list, 0, n - 1)]
        # per-MB symbol scatter (out-of-bounds index drops masked lanes)
        idx = jnp.where(do, jnp.clip(mb_list, 0, n - 1), n)
        i16_mode = i16_mode.at[idx].set(modes, mode="drop")
        intra_cls = intra_cls.at[idx].set(clss, mode="drop")
        i4_modes = i4_modes.at[idx].set(m4s, mode="drop")
        chroma_mode = chroma_mode.at[idx].set(cmodes, mode="drop")
        luma_dc = luma_dc.at[idx].set(qdcs, mode="drop")
        luma_ac = luma_ac.at[idx].set(qacs, mode="drop")
        chroma_dc = chroma_dc.at[idx].set(cdcs, mode="drop")
        chroma_ac = chroma_ac.at[idx].set(cacs, mode="drop")

        Yw = jwf.scatter_tiles(Yw, tiles, y0s, x0s, do)
        Uw = jwf.scatter_tiles(Uw, tus, cys, cxs, do)
        Vw = jwf.scatter_tiles(Vw, tvs, cys, cxs, do)
        return (Yw, Uw, Vw, i16_mode, intra_cls, i4_modes, chroma_mode,
                luma_dc, luma_ac, chroma_dc, chroma_ac), 0

    (Yw, Uw, Vw, i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc,
     luma_ac, chroma_dc, chroma_ac), _ = jax.lax.scan(
        diag_step,
        (Yw, Uw, Vw, i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc,
         luma_ac, chroma_dc, chroma_ac), diags)

    recY = Yw[WPAD:WPAD + H, WPAD:WPAD + W].astype(jnp.uint8)
    recU = Uw[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].astype(jnp.uint8)
    recV = Vw[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].astype(jnp.uint8)
    return (i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc,
            jt.zigzag4(luma_ac), chroma_dc, chroma_ac, recY, recU, recV)


# ---------------------------------------------------------------------------
# inter path: ME refinement + batched P-MB encode
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "radius"))
def encode_inter_mbs(mb_w: int, mb_h: int, radius: int, Y, U, V, refY_s,
                     refU_s, refV_s, qp, qpc, scroll_dy=None,
                     rd_lam=None):
    """Whole-frame P-MB analysis, fully batched.

    refY_s/refU_s/refV_s: [R,H+2P,W+2P] edge-padded reference stacks
    (PAD=32 luma / 16 chroma, same as the decoder's DPB planes; R = 1 or
    2 short-term references, newest first). With R=2 every MB picks its
    reference by ME cost; downstream the choice is a per-lane x offset
    into width-concatenated reference planes, so subpel/MC pay nothing
    extra. Returns mv (quarter-pel), use_intra, partition code, per-MB
    ref choice, symbol planes, recon tiles and a per-MB all-zero-residual
    flag for P_Skip detection.
    """
    n = mb_w * mb_h
    R = refY_s.shape[0]
    WpY = refY_s.shape[2]
    WpC = refU_s.shape[2]
    lam = jnp.asarray(LAMBDA)[qp]
    srcY_t = _mb_tiles(Y.astype(jnp.int32), mb_h, mb_w, 16)
    srcU_t = _mb_tiles(U.astype(jnp.int32), mb_h, mb_w, 8)
    srcV_t = _mb_tiles(V.astype(jnp.int32), mb_h, mb_w, 8)
    mbi = jnp.arange(n)
    mby0 = (mbi // mb_w) * 16
    mbx0 = (mbi % mb_w) * 16

    refcatY = jnp.concatenate([refY_s[k] for k in range(R)], axis=1)
    refcatU = jnp.concatenate([refU_s[k] for k in range(R)], axis=1)
    refcatV = jnp.concatenate([refV_s[k] for k in range(R)], axis=1)

    # gather-free integer-pel search: one dense displacement scan per
    # reference yields P16x16/P16x8/P8x16/P8x8 winners at the FULL
    # radius (the per-MB-window formulation lowered each vmapped
    # dynamic_slice to a serial while loop on TPU — it dominated the
    # whole encoder)
    Hf, Wf = Y.shape
    # scroll-detected global vertical shift recenters the search window:
    # the dense scan still covers [-radius, radius] but around the
    # detected scroll, so scrolling content beyond the radius stays
    # reachable (reference scrolldetection -> ME seeding)
    sdy = jnp.int32(0) if scroll_dy is None else scroll_dy.astype(jnp.int32)
    dres = []
    for k in range(R):
        refp = jax.lax.dynamic_slice(
            refY_s[k], (PAD - radius + sdy, PAD - radius),
            (Hf + 2 * radius, Wf + 2 * radius))
        dres.append(jme.dense_full_search(Y.astype(jnp.int32), refp,
                                          radius))
    d16, dh, dv, d8 = dres[0]
    ref_sel = jnp.zeros((n,), jnp.int32)
    if R == 2:
        take1 = (dres[1][0][2] + lam) < d16[2]  # te(ref_idx) bit bias

        def _sel(a, b, t):
            return tuple(jnp.where(t, y, x) for x, y in zip(a, b))

        d16 = _sel(d16, dres[1][0], take1)
        dh = _sel(dh, dres[1][1], jnp.repeat(take1, 2))
        dv = _sel(dv, dres[1][2], jnp.repeat(take1, 2))
        d8 = _sel(d8, dres[1][3], jnp.repeat(take1, 4))
        ref_sel = take1.astype(jnp.int32)
    xoffL = ref_sel * WpY
    xoffC = ref_sel * WpC

    # partition decision on the dense integer-pel SADs + lambda *
    # side-info bits per shape (reference svc_base_layer_md.cpp inter
    # partition MD; deciding before subpel lets the refinement run once,
    # at quadrant granularity, instead of once per candidate shape)
    cost = jnp.stack([
        d16[2] + lam * 4,                                # 0: P16x16
        dh[2].reshape(n, 2).sum(axis=1) + lam * 11,      # 1: P16x8
        dv[2].reshape(n, 2).sum(axis=1) + lam * 11,      # 2: P8x16
        d8[2].reshape(n, 4).sum(axis=1) + lam * 20,      # 3: P8x8
    ], axis=1)
    part = jnp.argmin(cost, axis=1).astype(jnp.int32)

    # the chosen partition's integer MV per 8x8 quadrant
    quad = jnp.arange(4)
    pn = part[:, None]

    def _qsel(a16, ah, av, a8):
        a = jnp.where(pn == 1, ah.reshape(n, 2)[:, quad // 2],
                      jnp.broadcast_to(a16[:, None], (n, 4)))
        a = jnp.where(pn == 2, av.reshape(n, 2)[:, quad % 2], a)
        return jnp.where(pn == 3, a8.reshape(n, 4), a)

    ivy_q = _qsel(d16[0], dh[0], dv[0], d8[0]).reshape(n * 4) + sdy
    ivx_q = _qsel(d16[1], dh[1], dv[1], d8[1]).reshape(n * 4)

    blk4 = jnp.arange(4)
    by8 = (mby0[:, None] + (blk4 // 2)[None, :] * 8).reshape(-1)   # [4n]
    bx8 = (mbx0[:, None] + (blk4 % 2)[None, :] * 8).reshape(-1)
    src8 = srcY_t.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n * 4, 8, 8)
    xo4 = jnp.repeat(xoffL, 4)

    # joint quarter-pel refinement of the chosen partition (one window
    # gather per quadrant; hands back the winning predictions so no
    # separate MC pass is needed)
    planes = jmc.halfpel_planes(refcatY)
    mvqx, mvqy, best_sad, pred_q = jme.subpel_quad(
        planes, PAD, by8, bx8 + xo4, ivx_q * 4, ivy_q * 4, src8, part)

    intra_cost = jme.intra_sad_proxy(srcY_t)
    use_intra = best_sad > intra_cost + 2048
    part = jnp.where(use_intra, 0, part)

    def _asm4(blocks, t):
        return blocks.reshape(n, 2, 2, t, t).transpose(0, 1, 3, 2, 4) \
            .reshape(n, 2 * t, 2 * t)

    pred_y = _asm4(pred_q, 8)

    # per-partition MVs: writer layout (partition slots) and per-8x8
    # quadrant (chroma MC + deblock cells)
    mvq = jnp.stack([mvqx, mvqy], 1).reshape(n, 4, 2)
    mvx = mvq[:, 0, 0]
    mvy = mvq[:, 0, 1]
    p2 = part[:, None, None]
    zpad = jnp.zeros((n, 2, 2), jnp.int32)
    mv16b = jnp.broadcast_to(mvq[:, :1], (n, 4, 2))
    mv8 = jnp.where(
        p2 == 1, jnp.concatenate([mvq[:, 0::2], zpad], axis=1), mv16b)
    mv8 = jnp.where(
        p2 == 2, jnp.concatenate([mvq[:, 0:2], zpad], axis=1), mv8)
    mv8 = jnp.where(p2 == 3, mvq, mv8)

    # chroma MC once, at 4x4 partition granularity with the SELECTED MV
    # per 8x8 quadrant (bilinear chroma MC is split-invariant for one
    # translation, so larger partitions equal their quarter blocks)
    mv_sel = mvq.reshape(n * 4, 2)
    xoc4 = jnp.repeat(xoffC, 4)
    pred_u = _asm4(jmc.mc_chroma_mbs(refcatU, PAD // 2, by8 // 2,
                                     bx8 // 2 + xoc4, mv_sel[:, 0],
                                     mv_sel[:, 1], size=4), 4)
    pred_v = _asm4(jmc.mc_chroma_mbs(refcatV, PAD // 2, by8 // 2,
                                     bx8 // 2 + xoc4, mv_sel[:, 0],
                                     mv_sel[:, 1], size=4), 4)

    resid = srcY_t - pred_y
    # position-major residual path ([16, B]: batch on the lane dim) —
    # the [n,16,4,4] butterflies relayout around every op on TPU
    B = n * 16
    r_pm = _blocks16(resid).reshape(B, 16).T.astype(jnp.int32)
    qp_b = jnp.repeat(qp.astype(jnp.int32), 16)
    W_pm = jt.fdct4x4_pm(r_pm)
    q_pm = jt.quant4_pm(W_pm, qp_b, False, rd_lam=rd_lam)
    deq_pm = jt.dequant4_pm(q_pm, qp_b, jnp.int32(16))
    rec = _assemble16(jt.idct4x4_pm(deq_pm).T.reshape(n, 16, 4, 4))
    qac = q_pm.T.reshape(n, 16, 4, 4)
    tile_y = jnp.clip(pred_y + rec, 0, 255)

    cdc = jnp.zeros((n, 2, 4), jnp.int32)
    cac = jnp.zeros((n, 2, 4, 16), jnp.int32)
    tiles_c = []
    for ci, (src_t, pred_c) in enumerate(((srcU_t, pred_u),
                                          (srcV_t, pred_v))):
        residc = src_t - pred_c
        Bc = n * 4
        rc_pm = _blocks4(residc).reshape(Bc, 16).T.astype(jnp.int32)
        qpc_b = jnp.repeat(qpc.astype(jnp.int32), 4)
        Wc_pm = jt.fdct4x4_pm(rc_pm)
        qc_pm = jt.quant4_pm(Wc_pm, qpc_b, False, skip_dc=True,
                             rd_lam=rd_lam)
        Wd2 = Wc_pm[0].reshape(n, 2, 2)
        qd2 = jt.quant_dc2(jt.fhadamard2x2(Wd2), qpc)
        dcd = jt.chroma_dc_transform_dequant(qd2, qpc, jnp.int32(16))
        deqc_pm = jt.dequant4_pm(qc_pm, qpc_b, jnp.int32(16))
        deqc_pm = deqc_pm.at[0].set(dcd.reshape(Bc))
        recc = _assemble8(jt.idct4x4_pm(deqc_pm).T.reshape(n, 4, 4, 4))
        qc = qc_pm.T.reshape(n, 4, 4, 4)
        cdc = cdc.at[:, ci].set(qd2.reshape(n, 4))
        cac = cac.at[:, ci].set(jt.zigzag4(qc))
        tiles_c.append(jnp.clip(pred_c + recc, 0, 255))

    no_res = ((qac == 0).all(axis=(1, 2, 3)) &
              (cdc == 0).all(axis=(1, 2)) & (cac == 0).all(axis=(1, 2, 3)))
    return (mvx, mvy, use_intra, part, ref_sel, mv8, mvq, jt.zigzag4(qac),
            cdc, cac, tile_y, tiles_c[0], tiles_c[1], no_res)


# ---------------------------------------------------------------------------
# device-side packing: ONE device->host transfer per frame
# (the axon TPU tunnel has ~10-50 ms latency per transfer, so symbol
# planes are merged and packed to a single int16 array on device)
# ---------------------------------------------------------------------------
PACK_W = 427  # 16 dc + 256 ac + 8 cdc + 128 cac + mode + cmode + cls + 16 i4


@jax.jit
def _pack_intra(luma_dc, luma_ac, chroma_dc, chroma_ac, i16_mode,
                chroma_mode, intra_cls, i4_modes):
    n = luma_dc.shape[0]
    return jnp.concatenate(
        [luma_dc.reshape(n, 16), luma_ac.reshape(n, 256),
         chroma_dc.reshape(n, 8), chroma_ac.reshape(n, 128),
         i16_mode.reshape(n, 1), chroma_mode.reshape(n, 1),
         intra_cls.reshape(n, 1) - 1, i4_modes.reshape(n, 16) - 2],
        axis=1).astype(jnp.int16)


@jax.jit
def _pack_merge(use_intra, luma_dc_i, luma_ac_i, chroma_dc_i, chroma_ac_i,
                i16_mode, chroma_mode, intra_cls, i4_modes, qac_zz, cdc,
                cac):
    n = use_intra.shape[0]
    sel = use_intra[:, None]
    return jnp.concatenate(
        [jnp.where(sel, luma_dc_i.reshape(n, 16), 0),
         jnp.where(sel, luma_ac_i.reshape(n, 256), qac_zz.reshape(n, 256)),
         jnp.where(sel, chroma_dc_i.reshape(n, 8), cdc.reshape(n, 8)),
         jnp.where(sel, chroma_ac_i.reshape(n, 128), cac.reshape(n, 128)),
         i16_mode.reshape(n, 1), chroma_mode.reshape(n, 1),
         intra_cls.reshape(n, 1) - 1, i4_modes.reshape(n, 16) - 2],
        axis=1).astype(jnp.int16)


@jax.jit
def _pack_inter_only(qac_zz, cdc, cac):
    n = qac_zz.shape[0]
    z1 = jnp.zeros((n, 16), jnp.int16)
    z2 = jnp.zeros((n, 2), jnp.int16)
    # cls/i4 columns are stored biased (-1 / -2) so the all-inter default
    # packs as zeros — the sparse batched transport never ships them
    z1c = jnp.zeros((n, 1), jnp.int16)
    z16 = jnp.zeros((n, 16), jnp.int16)
    return jnp.concatenate(
        [z1, qac_zz.reshape(n, 256).astype(jnp.int16),
         cdc.reshape(n, 8).astype(jnp.int16),
         cac.reshape(n, 128).astype(jnp.int16), z2, z1c, z16], axis=1)


@jax.jit
def _pack_meta(mvx, mvy, use_intra, no_res, part, mv8, ref_sel):
    """meta columns (14): mvx mvy use_intra no_res part(0=16x16,
    1=16x8,2=8x16,3=8x8) mv8[4][2] (partition slots) ref_idx."""
    n = mvx.shape[0]
    head = jnp.stack([mvx, mvy, use_intra.astype(jnp.int32),
                      no_res.astype(jnp.int32),
                      part.astype(jnp.int32)], axis=1)
    return jnp.concatenate([head, mv8.reshape(n, 8),
                            ref_sel.astype(jnp.int32)[:, None]], axis=1) \
        .astype(jnp.int16)


def _unpack(packed):
    """host-side views into the packed [n,427] int16 symbol array."""
    luma_dc = packed[:, 0:16]
    luma_ac = packed[:, 16:272].reshape(-1, 16, 16)
    chroma_dc = packed[:, 272:280].reshape(-1, 2, 4)
    chroma_ac = packed[:, 280:408].reshape(-1, 8, 16)
    i16_mode = packed[:, 408]
    chroma_mode = packed[:, 409]
    intra_cls = packed[:, 410] + 1   # stored biased -1 (inter default = 0)
    i4_modes = packed[:, 411:427] + 2  # stored biased -2
    return (luma_dc, luma_ac, chroma_dc, chroma_ac, i16_mode, chroma_mode,
            intra_cls, i4_modes)


@functools.partial(jax.jit, static_argnames=("mb_h", "mb_w"))
def _split_src(mb_h: int, mb_w: int, buf):
    """Split the single uploaded [(H+H/2), W] uint8 buffer into Y,U,V."""
    H, W = mb_h * 16, mb_w * 16
    Y = buf[:H]
    U = buf[H:H + H // 2, :W // 2]
    V = buf[H:H + H // 2, W // 2:]
    return Y, U, V


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h"))
def _finalize_inter(mb_w: int, mb_h: int, tile_y, tile_u, tile_v):
    """Assemble recon planes when a P frame has no intra MBs (cast to
    uint8 before the tile transpose: 4x less data through the shuffle)."""
    return (_tiles_to_plane(tile_y.astype(jnp.uint8), mb_h, mb_w, 16),
            _tiles_to_plane(tile_u.astype(jnp.uint8), mb_h, mb_w, 8),
            _tiles_to_plane(tile_v.astype(jnp.uint8), mb_h, mb_w, 8))


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h"))
def _deblock_recon(mb_w: int, mb_h: int, recY, recU, recV, cls, qp, nnz,
                   mv_cells, slice_id, idc, ref_cells=None):
    """Run the shared in-loop filter over the encoder's recon planes.

    cls/qp/nnz/mv_cells/slice_id are decoder-layout symbol planes for the
    frame just written; idc the disable_deblocking_filter_idc it carries.
    Uses exactly the decoder's ops/deblock.py wavefront, so the filtered
    reference equals what any conformant decoder reconstructs.
    """
    n = mb_w * mb_h
    WP = jdb.WPAD
    H, W = mb_h * 16, mb_w * 16
    Yw = jnp.pad(recY.astype(jnp.int32), WP)
    Uw = jnp.pad(recU.astype(jnp.int32), WP)
    Vw = jnp.pad(recV.astype(jnp.int32), WP)
    zeros = jnp.zeros((n,), jnp.int32)
    if ref_cells is None:
        ref_cells = jnp.zeros((n, 16), jnp.int32)  # single-ref: all L0[0]
    Yw, Uw, Vw = jdb.deblock_frame(
        mb_w, mb_h, Yw, Uw, Vw, cls.astype(jnp.int32), qp.astype(jnp.int32),
        nnz, mv_cells.astype(jnp.int32), ref_cells.astype(jnp.int32),
        slice_id.astype(jnp.int32),
        jnp.full((n,), idc, jnp.int32), zeros, zeros, zeros, jnp.int32(0))
    return (Yw[WP:WP + H, WP:WP + W].astype(jnp.uint8),
            Uw[WP:WP + H // 2, WP:WP + W // 2].astype(jnp.uint8),
            Vw[WP:WP + H // 2, WP:WP + W // 2].astype(jnp.uint8))


@jax.jit
def _pad_refs(recY, recU, recV):
    """Edge-pad [R,H,W] reference stacks (R = number of refs)."""
    def pad(pl, m):
        return jnp.pad(pl, ((0, 0), (m, m), (m, m)), mode="edge")
    return pad(recY, PAD), pad(recU, PAD // 2), pad(recV, PAD // 2)


# ---------------------------------------------------------------------------
# fused per-frame programs (non-AQ path): ONE dispatch + ONE packed
# device->host fetch per frame. The axon tunnel costs ~30 ms latency per
# sync and ~20 MB/s, so the frame pipeline is structured as
#   A: analysis+pack (fetch packed symbols)  ->  host entropy write
#   B: recon finalize + in-loop deblock      ->  stays on device
# with B dispatched before the host write so it overlaps it.
# ---------------------------------------------------------------------------
_CELL_PART8 = ((np.arange(16) // 4) // 2) * 2 + (np.arange(16) % 4) // 2


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "radius",
                                              "rd_lam"))
def _p_analyze(mb_w: int, mb_h: int, radius: int, buf, refY, refU, refV,
               qp, qpc, scroll_dy=None, rd_lam=None):
    """Upload-to-symbols program for a P frame: split source, pad refs,
    run the whole-frame inter analysis, pack meta+symbols into one int16
    array, and derive the deblock prep planes device-side."""
    Y, U, V = _split_src(mb_h, mb_w, buf)
    refY_s, refU_s, refV_s = _pad_refs(refY, refU, refV)
    (mvx, mvy, use_intra, part, ref_sel, mv8, mvq, qac_zz, cdc, cac,
     tile_y, tile_u, tile_v, no_res) = encode_inter_mbs(
        mb_w, mb_h, radius, Y, U, V, refY_s, refU_s, refV_s, qp, qpc,
        scroll_dy, rd_lam)
    meta = _pack_meta(mvx, mvy, use_intra, no_res, part, mv8, ref_sel)
    nmb = mb_w * mb_h
    # inter frames carry only meta + qac/cdc/cac (no I16 DC, no mode
    # columns — those are constants the host re-materializes); coeffs
    # usually fit int8, so the fetch is the int8 copy and the int16
    # original stays device-side as the rare wide-value fallback
    packed = jnp.concatenate(
        [meta, qac_zz.reshape(nmb, 256).astype(jnp.int16),
         cdc.reshape(nmb, 8).astype(jnp.int16),
         cac.reshape(nmb, 128).astype(jnp.int16)], axis=1)
    clip8 = jnp.clip(packed, -128, 127)
    wide = (clip8 != packed).any(axis=1)
    packed8 = jnp.concatenate(
        [clip8, wide[:, None].astype(jnp.int16)], axis=1).astype(jnp.int8)
    # deblock prep (the host's later P_Skip/I4 class refinements don't
    # change boundary strengths: skip stays inter with the same MV/nnz,
    # I4 stays intra)
    n = mb_w * mb_h
    cls_d = jnp.where(use_intra, 1, 3 + part).astype(jnp.int32)
    nnz_d = (qac_zz != 0).any(-1)
    mvc = mvq[:, jnp.asarray(_CELL_PART8), :]  # quadrant mv -> 4x4 cells
    mvc = jnp.where(use_intra[:, None, None], 0, mvc)
    refc = jnp.broadcast_to(ref_sel[:, None], (n, 16))  # bS ref compare
    return (packed8, packed, tile_y, tile_u, tile_v, Y, U, V, use_intra,
            cls_d, nnz_d, mvc, refc)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "idc"))
def _p_finish(mb_w: int, mb_h: int, idc: int, tile_y, tile_u, tile_v,
              cls_d, nnz_d, mvc, refc, qp_plane, slice_id):
    """Recon planes for an all-inter P frame + in-loop deblock."""
    recY, recU, recV = _finalize_inter(mb_w, mb_h, tile_y, tile_u, tile_v)
    if idc == 1:
        return recY, recU, recV
    return _deblock_recon(mb_w, mb_h, recY, recU, recV, cls_d, qp_plane,
                          nnz_d, mvc, slice_id, idc, refc)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "idc"))
def _p_intra_fixup(mb_w: int, mb_h: int, idc: int, packed, Y, U, V,
                   tile_y, tile_u, tile_v, use_intra, cls_d, nnz_d, mvc,
                   refc, qp, qpc, qp_plane, slice_id, diags, row_slice):
    """Rare path: some P MBs fell back to intra. Runs the masked intra
    wavefront over the inter recon, merges symbols with the inter planes
    sliced back out of `packed`, and deblocks the merged recon."""
    n = mb_w * mb_h
    m = jnp.asarray(~use_intra)[:, None, None]
    (i16_mode, intra_cls, i4_modes, chroma_mode, ldc_i, lac_i, cdc_i,
     cac_i, recY, recU, recV) = intra_wavefront(
        mb_w, mb_h, Y, U, V, jnp.where(m, tile_y, 0),
        jnp.where(m, tile_u, 0), jnp.where(m, tile_v, 0),
        use_intra, qp, qpc, diags, row_slice)
    qac_zz = packed[:, 14:270].astype(jnp.int32).reshape(n, 16, 16)
    cdc = packed[:, 270:278].astype(jnp.int32).reshape(n, 2, 4)
    cac = packed[:, 278:406].astype(jnp.int32).reshape(n, 8, 16)
    syms = _pack_merge(use_intra, ldc_i, lac_i, cdc_i, cac_i, i16_mode,
                       chroma_mode, intra_cls, i4_modes, qac_zz, cdc, cac)
    if idc == 1:
        return syms, recY, recU, recV
    cls2 = jnp.where(use_intra, intra_cls, cls_d)
    recY, recU, recV = _deblock_recon(mb_w, mb_h, recY, recU, recV, cls2,
                                      qp_plane, nnz_d, mvc, slice_id, idc,
                                      refc)
    return syms, recY, recU, recV


@functools.partial(jax.jit,
                   static_argnames=("mb_w", "mb_h", "radius", "idc",
                                    "rd_lam"))
def _p_batch(mb_w: int, mb_h: int, radius: int, idc: int, bufs, refY,
             refU, refV, qp, qpc, slice_id, diags, row_slice,
             rd_lam=None):
    """K consecutive P frames in ONE program: lax.scan chains the
    recon+deblock reference carry, so a whole batch rides one source
    upload, one dispatch, and one packed symbol fetch. The axon tunnel
    pays ~30 ms latency per dispatch and ~20 MB/s per transfer, which
    makes per-frame dispatch count — not FLOPs — the unbatched
    pipeline's bound.

    bufs: [K, H+H/2, W] uint8 source buffers (_upload_buf layout).
    refY/refU/refV: unpadded uint8 recon planes of the preceding frame.
    Returns (packed8 [K,n,442] int8, packed16 [K,n,441] int16, recon*3):
    per frame, 14 meta columns (_pack_meta) ++ PACK_W symbol columns
    (_pack_merge layout) ++ a wide-coeff flag; packed16 stays device-side
    as the rare wide-value fallback."""
    n = mb_w * mb_h

    def step(carry, buf):
        rY0, rU0, rV0 = carry
        Y, U, V = _split_src(mb_h, mb_w, buf)
        refY_s, refU_s, refV_s = _pad_refs(rY0[None], rU0[None], rV0[None])
        (mvx, mvy, use_intra, part, ref_sel, mv8, mvq, qac_zz, cdc, cac,
         tile_y, tile_u, tile_v, no_res) = encode_inter_mbs(
            mb_w, mb_h, radius, Y, U, V, refY_s, refU_s, refV_s, qp, qpc,
            rd_lam=rd_lam)
        meta = _pack_meta(mvx, mvy, use_intra, no_res, part, mv8, ref_sel)
        cls_d = jnp.where(use_intra, 1, 3 + part).astype(jnp.int32)
        nnz_d = (qac_zz != 0).any(-1)
        mvc = mvq[:, jnp.asarray(_CELL_PART8), :]
        mvc = jnp.where(use_intra[:, None, None], 0, mvc)
        refc = jnp.broadcast_to(ref_sel[:, None], (n, 16))

        def fix(_):
            m = (~use_intra)[:, None, None]
            (i16_mode, intra_cls, i4_modes, chroma_mode, ldc_i, lac_i,
             cdc_i, cac_i, rY, rU, rV) = intra_wavefront(
                mb_w, mb_h, Y, U, V, jnp.where(m, tile_y, 0),
                jnp.where(m, tile_u, 0), jnp.where(m, tile_v, 0),
                use_intra, qp, qpc, diags, row_slice)
            syms = _pack_merge(use_intra, ldc_i, lac_i, cdc_i, cac_i,
                               i16_mode, chroma_mode, intra_cls, i4_modes,
                               qac_zz, cdc, cac)
            return syms, rY, rU, rV, jnp.where(use_intra, intra_cls, cls_d)

        def plain(_):
            rY, rU, rV = _finalize_inter(mb_w, mb_h, tile_y, tile_u,
                                         tile_v)
            return _pack_inter_only(qac_zz, cdc, cac), rY, rU, rV, cls_d

        syms, rY, rU, rV, cls2 = jax.lax.cond(use_intra.any(), fix, plain,
                                              None)
        if idc != 1:
            rY, rU, rV = _deblock_recon(mb_w, mb_h, rY, rU, rV, cls2, qp,
                                        nnz_d, mvc, slice_id, idc, refc)
        packed = jnp.concatenate([meta, syms], axis=1)      # [n,441] i16
        clip8 = jnp.clip(packed, -128, 127)
        wide = (clip8 != packed).any(axis=1)
        packed8 = jnp.concatenate(
            [clip8, wide[:, None].astype(jnp.int16)],
            axis=1).astype(jnp.int8)
        return (rY, rU, rV), (packed8, packed)

    (refY, refU, refV), (p8, p16) = jax.lax.scan(
        step, (refY, refU, refV), bufs)
    # Sparse transport: the packed symbols are ~85% zeros (coefficients
    # above the last nonzero, skip MBs, biased constant columns), and the
    # axon tunnel's ~40 MB/s D2H makes the dense [K,n,442] fetch the
    # encode throughput bound. Ship a bitmask (packbits) + the nonzero
    # bytes compacted by a cumsum scatter; the dense int16 array stays
    # device-side as the wide/overflow fallback.
    K = p8.shape[0]
    n = p8.shape[1]
    pp = jnp.pad(p8, ((0, 0), (0, 0), (0, 6)))  # 442 -> 448 (bit-packable)
    mask = pp != 0
    maskbits = jnp.packbits(mask, axis=-1)      # [K, n, 56] u8
    flat = pp.reshape(-1)
    fm = mask.reshape(-1)
    idx = jnp.cumsum(fm.astype(jnp.int32))
    cap = flat.shape[0] // 4
    tgt = jnp.where(fm, idx - 1, cap)
    vals = jnp.zeros((cap,), jnp.int8).at[tgt].set(flat, mode="drop")
    # 1-byte sentinel: fetching it waits for this program's compute
    # without moving the bulk outputs — the drain times it separately
    # to split device-compute wait from pure transfer time
    sentinel = vals[:1]
    return maskbits, vals, p16, refY, refU, refV, sentinel


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "idc"))
def _i_frame(mb_w: int, mb_h: int, idc: int, buf, qp, qpc, qp_plane,
             slice_id, diags, row_slice):
    """Whole IDR frame: intra wavefront + pack + in-loop deblock."""
    n = mb_w * mb_h
    Y, U, V = _split_src(mb_h, mb_w, buf)
    zt16 = jnp.zeros((n, 16, 16), jnp.int32)
    zt8 = jnp.zeros((n, 8, 8), jnp.int32)
    (i16_mode, intra_cls, i4_modes, chroma_mode, ldc, lac, cdc, cac,
     recY, recU, recV) = intra_wavefront(
        mb_w, mb_h, Y, U, V, zt16, zt8, zt8, jnp.ones((n,), bool), qp,
        qpc, diags, row_slice)
    packed = _pack_intra(ldc, lac, cdc, cac, i16_mode, chroma_mode,
                         intra_cls, i4_modes)
    if idc != 1:
        recY, recU, recV = _deblock_recon(
            mb_w, mb_h, recY, recU, recV, intra_cls, qp_plane,
            jnp.zeros((n, 16), bool), jnp.zeros((n, 16, 2), jnp.int32),
            slice_id, idc)
    return packed, recY, recU, recV


# ---------------------------------------------------------------------------
# host-side frame drivers
# ---------------------------------------------------------------------------
class JaxEncoder:
    """IPPP encoder with the analysis half on TPU.

    Every per-MB loop of a classical encoder is a batched/wavefront JAX
    kernel; entropy/NAL assembly is the native writer. See the module
    docstring for the pipeline shape and the supported feature set.
    """

    ME_RADIUS = 16

    def __init__(self, width, height, qp=28, gop=0, intra_only=False,
                 rc=None, scene_cut=False, aq=False, cabac=False,
                 slices=1, deblock=True, temporal_layers=1,
                 gom_rc=False, ltr=False, refs=1, denoise=False,
                 param_id=0, bgd=False, scroll_me=False,
                 slice_max_bytes=None, trellis=False):
        assert width % 2 == 0 and height % 2 == 0, "4:2:0 needs even dims"
        # arbitrary (even) resolutions: pad to whole MBs internally and
        # signal the true size via SPS frame cropping (7.4.2.1.1)
        self.width, self.height = width, height
        self.mb_w = -(-width // 16)
        self.mb_h = -(-height // 16)
        self.pad_w = self.mb_w * 16 - width
        self.pad_h = self.mb_h * 16 - height
        self.qp = int(qp)
        self.qpc = int(dn.CHROMA_QP[self.qp])
        self.gop = gop
        self.intra_only = intra_only
        self.rc = rc                 # any ratectl.* controller
        self.scene_cut = scene_cut   # IDR on detected scene changes
        self.aq = aq                 # per-MB adaptive quantization
        self.gom_rc = gom_rc and rc is not None  # per-MB-row RC dqp
        # background detection -> +QP on static background MBs
        # (reference backgrounddetection library feeding the MB QP
        # decision; rides the same per-MB QP plane as AQ)
        self.bgd = bool(bgd)
        # scroll detection -> ME search recentered on the global
        # vertical shift (reference scrolldetection feeding ME)
        self.scroll_me = bool(scroll_me)
        # trellis-lite rate-aware quantization (ops/transform.quant4_pm
        # rd_lam — reference analog: RDO quant vs encode_mb_aux.cpp's
        # plain deadzone). Default OFF after measurement: on BA1_FT
        # conference content both uniform level decrement and
        # position-weighted zero-ones lost to plain QP scaling at equal
        # PSNR (24-frame sweep: lam=72 cost 47412 B @37.35 dB vs a
        # ~45.8 KB baseline interpolation; CAVLC codes trailing ones
        # near-free, so zeroing them buys little rate). Kept as an
        # option for CABAC-side experiments. Dimensionless lambda x256.
        self.trellis_lam = 144 if trellis else None
        self._scroll_dy = 0
        # dynamic size-limited slicing (reference SM_DYN_SLICE,
        # codec_app_def.h:275). TPU-first tradeoff: the batched device
        # analysis needs slice boundaries BEFORE writing, so boundaries
        # are row-granular and planned from the previous frame's
        # measured per-row bit costs (exact CAVLC row bits fed back by
        # the native writer) instead of closed exactly mid-row like the
        # reference's serial writer; the cap can overshoot by one row's
        # prediction error on content changes.
        assert slice_max_bytes is None or slices == 1, \
            "slice_max_bytes replaces the fixed slice count"
        self.slice_max_bytes = (int(slice_max_bytes)
                                if slice_max_bytes else None)
        self._row_bits = None      # [mb_h] measured bits, prev frame
        self._row_bits_buf = (np.zeros(self.mb_h, np.uint32)
                              if slice_max_bytes else None)
        self._row_slice_np = np.zeros(self.mb_h, np.int32)
        # pipeline profile (batched path): per-stage wall ms + fetch
        # volume, read by bench.py's encode breakdown (VERDICT r2 #5)
        self.prof = {"upload_ms": 0.0, "fetch_wait_ms": 0.0,
                     "compute_wait_ms": 0.0, "transfer_ms": 0.0,
                     "unpack_ms": 0.0, "entropy_ms": 0.0,
                     "fetch_bytes": 0, "frames": 0}
        self.cabac = cabac           # CABAC entropy coding
        self.slices = max(1, min(int(slices), self.mb_h))
        # in-loop filter: idc 0 filters everything; 2 keeps slices
        # independent (multi-slice, incl. dynamic slicing); 1 = filter
        # off (deblock=False)
        multi = self.slices > 1 or slice_max_bytes
        self.deblock_idc = (2 if multi else 0) if deblock else 1
        # dyadic temporal scalability (the reference encoder supports up
        # to 4 layers, ref_list_mgr_svc.cpp). L=2: odd frames are
        # droppable non-references predicting from the last T0 frame.
        # L=3/4: full hierarchical-P — each frame predicts from its
        # dyadic parent; the DPB keeps one reference per lower layer,
        # RPLR (idc 0) brings the parent to L0[0] when it isn't the
        # newest reference, and MMCO 1 evicts same-or-higher-layer
        # references no future frame predicts from.
        assert temporal_layers in (1, 2, 3, 4), "1..4 temporal layers"
        assert temporal_layers <= 2 or (refs == 1 and not ltr
                                        and not aq and not gom_rc), \
            "hierarchical layers need the plain single-ref path"
        self.temporal_layers = temporal_layers
        self._gop_pos = 0     # frames since the last IDR (hierarchical-P)
        self._dpb = []        # [{pos, fn, layer, recon}] for L >= 3
        self._sps_refs = temporal_layers - 1 if temporal_layers >= 3 else 0
        self._rplr_diff = 0
        self._mmco_drops = None
        # long-term reference (reference LTR feature): the SPS keeps a
        # second DPB slot; IDRs seed the LTR, mark_ltr() re-marks it,
        # recover_from_ltr() makes the next P frame predict from it
        # (loss recovery without an IDR, ref_list_mgr_svc.cpp)
        self.ltr = bool(ltr)
        self._ltr_ref = None      # device recon planes of the LTR
        self._mark_ltr_next = False
        self._use_ltr_next = False
        # multi-reference ME: 2 short-term refs, per-MB choice coded as
        # ref_idx (te), all partitions inherit the MB's reference
        assert refs in (1, 2), "1 or 2 reference frames"
        assert not (refs == 2 and ltr), "refs=2 and LTR are exclusive"
        assert not (refs == 2 and (aq or gom_rc)), \
            "refs=2 requires the fused (non-AQ) path"
        self.refs = refs
        # SPS/PPS id carried by this stream (spatial simulcast layers
        # use distinct ids so their parameter sets coexist)
        self.param_id = int(param_id)
        # luma denoise preprocess (reference denoise.cpp flat-region
        # filter, applied by CWelsPreProcess before analysis)
        self.denoise = bool(denoise)
        self._force_idr = False   # ISVCEncoder::ForceIntraFrame analog
        self._ref2 = None         # second-newest ref recon (refs=2)
        self.frame_idx = 0
        self._frame_num = 0   # 7.4.3: increments after each ref frame
        self._idr_id = 0
        self._cur_is_ref = True
        self.ref = None   # (Y,U,V) uint8 recon planes (device arrays)
        self._prev_src = None  # device luma of the previous source frame
        self._diags = jnp.asarray(_diagonals(self.mb_w, self.mb_h))
        rows_per = -(-self.mb_h // self.slices)
        self._row_slice = jnp.asarray(
            np.arange(self.mb_h) // rows_per, jnp.int32)
        self._slice_id = jnp.asarray(
            np.repeat(np.arange(self.mb_h) // rows_per, self.mb_w),
            jnp.int32)
        from . import encoder as _enc
        self._lib = _enc._cfg_lib()

    # -- helpers ----------------------------------------------------------
    def _write(self, slice_type, mb_class, mv, i16_mode, chroma_mode,
               luma_dc, luma_ac, chroma_dc, chroma_ac, mb_qp=None,
               i4_modes=None, mv8=None, n_refs=1, ref_plane=None):
        from . import encoder as _enc
        n = self.mb_w * self.mb_h
        if i4_modes is None:
            i4_modes = np.full((n, 16), 2, np.int8)
        else:
            # wavefront emits raster-in-MB; MbRecord wants decode order
            i4_modes = np.asarray(i4_modes)[:, np.asarray(BLK)]
        self._out_qp = np.zeros(n, np.uint8)  # per-MB QP chain (7.4.5)
        data = _enc._write_frame(
            self._lib, self.mb_w, self.mb_h, self.qp, self.frame_idx,
            slice_type=slice_type, mb_class=np.asarray(mb_class, np.uint8),
            mv=np.asarray(mv, np.int16),
            i16_mode=np.asarray(i16_mode, np.uint8),
            chroma_mode=np.asarray(chroma_mode, np.uint8),
            i4_modes=np.ascontiguousarray(i4_modes, np.int8),
            luma_dc=np.asarray(luma_dc, np.int16),
            luma_ac=np.asarray(luma_ac, np.int16),
            chroma_dc=np.asarray(chroma_dc, np.int16),
            chroma_ac=np.asarray(chroma_ac, np.int16),
            include_params=self.frame_idx == 0, mb_qp=mb_qp,
            cabac=self.cabac, n_slices=self.slices, mv8=mv8,
            deblock_idc=self.deblock_idc, out_qp=self._out_qp,
            crop_r=self.pad_w // 2, crop_b=self.pad_h // 2,
            is_ref=self._cur_is_ref, frame_num=self._frame_num,
            idr_id=self._idr_id, ltr_flags=self._ltr_flags(slice_type),
            n_refs=n_refs, ref_plane=ref_plane, sps_refs=self._sps_refs,
            rplr_diff=self._rplr_diff, mmco_drops=self._mmco_drops,
            param_id=self.param_id,
            row_slice=(self._row_slice_np if self.slice_max_bytes
                       else None),
            out_row_bits=(self._row_bits_buf if self.slice_max_bytes
                          else None))
        if self.slice_max_bytes:
            self._row_bits = self._row_bits_buf.copy()
        return data

    def _plan_dynamic_slices(self):
        """Row->slice map for SM_DYN_SLICE-style size-limited slices:
        greedy accumulation of predicted per-row bits (previous frame's
        measured costs; first frame worst-cases to one row per slice),
        closing a slice before the row that would exceed the byte cap."""
        budget = self.slice_max_bytes * 8
        est = self._row_bits
        if est is None:
            est = np.full(self.mb_h, budget, np.float64)  # 1 row/slice
        sl = np.zeros(self.mb_h, np.int32)
        acc, s = 0.0, 0
        for r in range(self.mb_h):
            if r > 0 and acc + float(est[r]) > budget:
                s += 1
                acc = 0.0
            sl[r] = s
            acc += float(est[r])
        changed = not np.array_equal(sl, self._row_slice_np)
        self._row_slice_np = sl
        self._row_slice = jnp.asarray(sl)
        self._slice_id = jnp.asarray(np.repeat(sl, self.mb_w), jnp.int32)
        return changed

    def _dyn_slice_violated(self):
        """True when a just-written slice exceeded the byte cap by more
        than the row-granularity floor allows fixing."""
        bits = self._row_bits.astype(np.float64)
        sl = self._row_slice_np
        for s in range(sl.max() + 1):
            rows = np.where(sl == s)[0]
            if rows.size > 1 and bits[rows].sum() > self.slice_max_bytes * 8:
                return True
        return False

    def _ltr_flags(self, slice_type):
        if not self.ltr:
            return 0
        flags = 1
        if slice_type == 0 and self._mark_ltr_next and self._cur_is_ref:
            flags |= 2
        if slice_type == 0 and self._use_ltr_next:
            flags |= 4
        return flags

    def mark_ltr(self):
        """Mark the NEXT reference frame as the long-term reference."""
        assert self.ltr, "encoder not in LTR mode"
        self._mark_ltr_next = True

    def recover_from_ltr(self):
        """Make the next P frame predict from the LTR instead of the
        previous frame (loss recovery without an IDR)."""
        assert self.ltr, "encoder not in LTR mode"
        self._use_ltr_next = True

    def _apply_deblock(self, mb_class, luma_ac, mv, mv8=None):
        """Filter self.ref in place with the shared loop-filter wavefront
        (only when the stream carries idc != 1)."""
        if self.deblock_idc == 1:
            return
        n = self.mb_w * self.mb_h
        nnz = (np.asarray(luma_ac, np.int16).reshape(n, 16, 16)
               != 0).any(axis=2)
        mv_cells = np.repeat(np.asarray(mv, np.int16)[:, None, :], 16,
                             axis=1)
        if mv8 is not None:
            c = np.arange(16)
            mv8r = np.asarray(mv8, np.int16).reshape(n, 4, 2)
            mbc = np.asarray(mb_class)
            quad = ((c // 4) // 2) * 2 + (c % 4) // 2  # cell -> 8x8 quad
            for cls_v, idx in ((4, (c // 4) // 2), (5, (c % 4) // 2),
                               (6, quad)):
                m = mbc == cls_v
                if m.any():
                    mv_cells[m] = mv8r[:, idx][m]
        slice_id = np.repeat(np.asarray(self._row_slice), self.mb_w)
        self.ref = _deblock_recon(
            self.mb_w, self.mb_h, *self.ref,
            jnp.asarray(mb_class, jnp.int32),
            jnp.asarray(self._out_qp, jnp.int32),
            jnp.asarray(nnz), jnp.asarray(mv_cells, jnp.int32),
            jnp.asarray(slice_id, jnp.int32), self.deblock_idc)

    def _qp_maps(self, Yd):
        """Per-MB (qp, qpc) planes; AQ offsets when enabled (the
        reference applies the AdaptiveQuantization dqp map the same
        way, wels_preprocess.cpp -> sMbInfo QP adjustment)."""
        n = self.mb_w * self.mb_h
        qp_map = np.full(n, self.qp)
        if self.aq:
            from . import processing as proc
            ref = self._prev_src if self._prev_src is not None else Yd
            dqp, _ = proc.adaptive_quant_map(Yd, ref)
            qp_map = qp_map + np.asarray(dqp).reshape(n)
        if self.gom_rc and self._prev_src is not None:
            diff = jnp.abs(Yd.astype(jnp.int32)
                           - self._prev_src.astype(jnp.int32))
            row_cx = np.asarray(diff.reshape(self.mb_h, 16, -1)
                                .sum(axis=(1, 2)))
            qp_map = qp_map + np.repeat(self.rc.gom_dqp(row_cx), self.mb_w)
        if self.bgd and self._prev_src is not None:
            # static background MBs take +2 QP: bits flow to the moving
            # foreground (reference backgrounddetection feeding the MB
            # QP decision via the same per-MB dqp plane as AQ)
            from . import processing as proc
            bg = np.asarray(proc.background_mask(Yd, self._prev_src))
            qp_map = qp_map + 2 * bg.reshape(n).astype(np.int32)
        qp_map = np.clip(qp_map, 10, 51)
        qpc_map = dn.CHROMA_QP[qp_map]
        self._qp_plane = qp_map.astype(np.uint8)
        return (jnp.asarray(qp_map, jnp.int32),
                jnp.asarray(qpc_map, jnp.int32))

    def _mv_preds(self, mb_class, mv, mv8=None, ref_plane=None):
        import ctypes
        n = self.mb_w * self.mb_h
        skip_pred = np.zeros((n, 2), np.int16)
        p16_pred = np.zeros((n, 2), np.int16)
        err = ctypes.create_string_buffer(512)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        mv16 = np.ascontiguousarray(mv, np.int16)
        mbc = np.ascontiguousarray(mb_class, np.uint8)
        if mv8 is not None:
            mv8 = np.ascontiguousarray(mv8, np.int16)
        if ref_plane is not None:
            ref_plane = np.ascontiguousarray(ref_plane, np.int8)
        rs = (np.ascontiguousarray(self._row_slice_np, np.intc)
              if self.slice_max_bytes else None)
        rc = self._lib.pip_encode_mv_preds(
            self.mb_w, self.mb_h, self.slices,
            None if rs is None else ptr(rs), ptr(mbc), ptr(mv16),
            None if mv8 is None else ptr(mv8),
            None if ref_plane is None else ptr(ref_plane),
            ptr(skip_pred), ptr(p16_pred), err, len(err))
        if rc != 0:
            raise RuntimeError(f"pip_encode_mv_preds: {err.value.decode()}")
        return skip_pred, p16_pred

    # -- frame paths ------------------------------------------------------
    def _host_buf(self, Y, U, V):
        """Packed host frame buffer: Y on top, U|V side by side below
        (source edge-padded to whole MBs when the display size isn't)."""
        if self.denoise:
            from . import processing as proc
            Y = np.asarray(proc.denoise(jnp.asarray(Y)))
        if self.pad_w or self.pad_h:
            Y = np.pad(Y, ((0, self.pad_h), (0, self.pad_w)), mode="edge")
            U = np.pad(U, ((0, self.pad_h // 2), (0, self.pad_w // 2)),
                       mode="edge")
            V = np.pad(V, ((0, self.pad_h // 2), (0, self.pad_w // 2)),
                       mode="edge")
        H, W = self.mb_h * 16, self.mb_w * 16
        buf = np.empty((H + H // 2, W), np.uint8)
        buf[:H] = Y
        buf[H:, :W // 2] = U
        buf[H:, W // 2:] = V
        return buf

    def _upload_buf(self, Y, U, V):
        """Single H2D transfer of the packed frame buffer."""
        return jnp.asarray(self._host_buf(Y, U, V))

    def _upload(self, Y, U, V):
        return _split_src(self.mb_h, self.mb_w, self._upload_buf(Y, U, V))

    def _encode_i(self, Y, U, V):
        """IDR frame via the fused single-dispatch program (flat QP)."""
        if self.aq or self.gom_rc or self.bgd:
            return self._encode_i_aq(Y, U, V)
        n = self.mb_w * self.mb_h
        buf = self._upload_buf(Y, U, V)
        qp_d = jnp.full((n,), self.qp, jnp.int32)
        qpc_d = jnp.full((n,), self.qpc, jnp.int32)
        packed_d, recY, recU, recV = _i_frame(
            self.mb_w, self.mb_h, self.deblock_idc, buf, qp_d, qpc_d,
            qp_d, self._slice_id, self._diags, self._row_slice)
        self.ref = (recY, recU, recV)
        packed = np.asarray(packed_d)
        (ldc, lac, cdc, cac, i16m, cm, cls, m4) = _unpack(packed)
        mb_class = np.where(cls == 0, 0, 1).astype(np.uint8)
        mv = np.zeros((n, 2), np.int16)
        # n_refs on an IDR only sizes the SPS DPB (max_num_ref_frames);
        # IDR slices carry no ref-list syntax
        return self._write(1, mb_class, mv, i16m, cm, ldc, lac, cdc, cac,
                           i4_modes=m4, n_refs=self.refs)

    def _encode_p(self, Y, U, V):
        """P frame: fused analyze program, one packed fetch, recon+deblock
        finishing on device while the host writes entropy (non-AQ)."""
        if self.aq or self.gom_rc or self.bgd:
            return self._encode_p_aq(Y, U, V)
        n = self.mb_w * self.mb_h
        buf = self._upload_buf(Y, U, V)
        qp_d = jnp.full((n,), self.qp, jnp.int32)
        qpc_d = jnp.full((n,), self.qpc, jnp.int32)
        if self.refs == 2 and self._ref2 is not None:
            n_refs = 2
            stack = [jnp.stack([a, b])
                     for a, b in zip(self.ref, self._ref2)]
        else:
            n_refs = 1
            stack = [p[None] for p in self.ref]
        (packed8_d, packed_d, tile_y, tile_u, tile_v, Yd, Ud, Vd,
         use_intra_d, cls_d, nnz_d, mvc_d, refc_d) = _p_analyze(
            self.mb_w, self.mb_h, self.ME_RADIUS, buf, *stack, qp_d,
            qpc_d, jnp.int32(self._scroll_dy), rd_lam=self.trellis_lam)
        packed8 = np.asarray(packed8_d)  # the frame's one blocking fetch
        if packed8[:, 406].any():  # rare wide coeffs: refetch as int16
            packed = np.asarray(packed_d)
        else:
            packed = packed8[:, :406].astype(np.int16)
        meta = packed[:, :14]
        use_intra = meta[:, 2] != 0
        no_res = meta[:, 3] != 0
        part = meta[:, 4]
        mv8 = np.ascontiguousarray(meta[:, 5:13], np.int16)
        ref_plane = np.ascontiguousarray(meta[:, 13], np.int8)
        ref_plane[use_intra] = 0
        mv = np.zeros((n, 2), np.int16)
        mv[:, 0] = meta[:, 0]
        mv[:, 1] = meta[:, 1]
        mv[use_intra] = 0
        if use_intra.any():
            fix = _p_intra_fixup(
                self.mb_w, self.mb_h, self.deblock_idc, packed_d, Yd, Ud,
                Vd, tile_y, tile_u, tile_v, use_intra_d, cls_d, nnz_d,
                mvc_d, refc_d, qp_d, qpc_d, qp_d, self._slice_id,
                self._diags, self._row_slice)
            if self._cur_is_ref:
                self._ref2 = self.ref if self.refs == 2 else None
                self.ref = fix[1:]
            (ldc, lac, cdc, cac, i16m, cm, cls,
             m4) = _unpack(np.asarray(fix[0]))
        else:
            if self._cur_is_ref:
                # dispatched before the host write so it overlaps it
                # (non-ref T1 frames never become references, so their
                # recon+deblock is skipped entirely)
                new_ref = _p_finish(
                    self.mb_w, self.mb_h, self.deblock_idc, tile_y,
                    tile_u, tile_v, cls_d, nnz_d, mvc_d, refc_d, qp_d,
                    self._slice_id)
                self._ref2 = self.ref if self.refs == 2 else None
                self.ref = new_ref
            lac = packed[:, 14:270].reshape(n, 16, 16)
            cdc = packed[:, 270:278].reshape(n, 2, 4)
            cac = packed[:, 278:406].reshape(n, 8, 16)
            ldc = np.zeros((n, 16), np.int16)
            i16m = np.zeros(n, np.int16)
            cm = np.zeros(n, np.int16)
            cls = np.ones(n, np.int16)
            m4 = np.full((n, 16), 2, np.int16)
        # part -> MbClass: 0/1/2/3 = P16x16/P16x8/P8x16/P8x8 (3/4/5/6)
        mb_class = np.where(use_intra, 1, 3 + part).astype(np.uint8)
        skip_pred, _ = self._mv_preds(mb_class, mv, mv8, ref_plane)
        is_skip = (no_res & ~use_intra & (part == 0) & (ref_plane == 0)
                   & (mv[:, 0] == skip_pred[:, 0])
                   & (mv[:, 1] == skip_pred[:, 1]))
        mb_class[is_skip] = 11
        mb_class[use_intra & (cls == 0)] = 0  # I4x4 fallback MBs
        return self._write(0, mb_class, mv, i16m, cm, ldc, lac, cdc, cac,
                           i4_modes=m4, mv8=mv8, n_refs=n_refs,
                           ref_plane=ref_plane)

    def _write_p_packed(self, packed):
        """Host entropy tail for the batched P path: `packed` is one
        frame's [n, 441] int16 array (14 meta ++ 427 symbol columns)."""
        n = self.mb_w * self.mb_h
        meta = packed[:, :14]
        use_intra = meta[:, 2] != 0
        no_res = meta[:, 3] != 0
        part = meta[:, 4]
        mv8 = np.ascontiguousarray(meta[:, 5:13], np.int16)
        ref_plane = np.ascontiguousarray(meta[:, 13], np.int8)
        ref_plane[use_intra] = 0
        mv = np.zeros((n, 2), np.int16)
        mv[:, 0] = meta[:, 0]
        mv[:, 1] = meta[:, 1]
        mv[use_intra] = 0
        (ldc, lac, cdc, cac, i16m, cm, cls, m4) = _unpack(packed[:, 14:])
        mb_class = np.where(use_intra, 1, 3 + part).astype(np.uint8)
        skip_pred, _ = self._mv_preds(mb_class, mv, mv8, ref_plane)
        is_skip = (no_res & ~use_intra & (part == 0) & (ref_plane == 0)
                   & (mv[:, 0] == skip_pred[:, 0])
                   & (mv[:, 1] == skip_pred[:, 1]))
        mb_class[is_skip] = 11
        mb_class[use_intra & (cls == 0)] = 0  # I4x4 fallback MBs
        return self._write(0, mb_class, mv, i16m, cm, ldc, lac, cdc, cac,
                           i4_modes=m4, mv8=mv8, n_refs=1,
                           ref_plane=ref_plane)

    def _dispatch_p_run(self, frames):
        """Queue K consecutive P frames as one scanned `_p_batch` program:
        one H2D upload and one dispatch for the whole run (the axon
        tunnel charges ~30 ms per dispatch/sync, so per-run rather than
        per-frame dispatch is the throughput lever). Returns the device
        handles; `self.ref` advances to the run's final recon without a
        sync, so the next run can be queued behind this one while the
        host is still writing earlier frames' entropy."""
        n = self.mb_w * self.mb_h
        t0 = time.perf_counter()
        bufs = jnp.asarray(np.stack([self._host_buf(*f) for f in frames]))
        self.prof["upload_ms"] += (time.perf_counter() - t0) * 1e3
        qp_d = jnp.full((n,), self.qp, jnp.int32)
        qpc_d = jnp.full((n,), self.qpc, jnp.int32)
        mb_d, vals_d, p16_d, recY, recU, recV, sent_d = _p_batch(
            self.mb_w, self.mb_h, self.ME_RADIUS, self.deblock_idc, bufs,
            *self.ref, qp_d, qpc_d, self._slice_id, self._diags,
            self._row_slice, rd_lam=self.trellis_lam)
        self.ref = (recY, recU, recV)
        return mb_d, vals_d, p16_d, len(frames), sent_d

    def _drain_p_run(self, mb_d, vals_d, p16_d, K, sent_d=None):
        """Host half of a dispatched run: fetch the sparse transport
        (bitmask + compacted nonzero bytes), rebuild the dense symbol
        array host-side, then run the per-frame entropy writes. The
        nonzero count comes from the mask itself (no device scalar
        sync), and values are fetched in fixed-shape chunks gathered by
        one device_get."""
        n = self.mb_w * self.mb_h
        # one gathered fetch of existing output buffers — issuing new
        # device work here would queue behind the already-dispatched
        # next run and serialize two batch computes per drain
        t0 = time.perf_counter()
        if sent_d is not None:
            # 1-byte sentinel: waits for compute (and anything the
            # tunnel queued ahead) without moving bulk bytes —
            # separates device-compute wait from pure transfer
            jax.device_get(sent_d)
        tc = time.perf_counter()
        mbits, vals_all = jax.device_get((mb_d, vals_d))
        t1 = time.perf_counter()
        self.prof["compute_wait_ms"] += (tc - t0) * 1e3
        self.prof["transfer_ms"] += (t1 - tc) * 1e3
        self.prof["fetch_wait_ms"] += (t1 - t0) * 1e3
        self.prof["fetch_bytes"] += mbits.nbytes + vals_all.nbytes
        self.prof["frames"] += K
        mask = np.unpackbits(mbits, axis=-1).astype(bool)  # [K,n,448]
        count = int(mask.sum())
        cap = int(vals_all.shape[0])
        if count > cap:
            # pathological density: whole-run dense int16 fallback
            p16 = np.asarray(p16_d)
            frames_sym = [p16[k] for k in range(K)]
            wide = [False] * K  # already int16
        else:
            vals = vals_all[:count]
            dense = np.zeros((K, n, 448), np.int8)
            dense[mask] = vals
            frames_sym = [dense[k, :, :441].astype(np.int16)
                          for k in range(K)]
            wide = [bool(dense[k, :, 441].any()) for k in range(K)]
        t2 = time.perf_counter()
        self.prof["unpack_ms"] += (t2 - t1) * 1e3
        out = []
        for k in range(K):
            if wide[k]:  # rare wide coeffs: refetch this frame as int16
                packed = np.asarray(p16_d[k])
            else:
                packed = frames_sym[k]
            out.append(self._write_p_packed(packed))
            self._frame_num = (self._frame_num + 1) & 0xff
            self.frame_idx += 1
        self.prof["entropy_ms"] += (time.perf_counter() - t2) * 1e3
        return out

    @property
    def _batchable(self):
        """Configurations the scanned multi-frame P program covers: the
        plain fused path (flat QP, single short-term reference, every
        frame a reference) with no per-frame host decisions in between."""
        return (not self.intra_only and not self.aq and not self.gom_rc
                and self.rc is None and not self.scene_cut
                and self.refs == 1 and self.temporal_layers == 1
                and not self.ltr and not self.bgd and not self.scroll_me
                and not self.slice_max_bytes)

    def encode_frames(self, frames, batch=8):
        """Encode a sequence of (Y, U, V) frames. When the configuration
        allows, full runs of `batch` consecutive P frames ride one
        scanned device program (`_p_batch`); output bytes are identical
        to per-frame encode_frame() calls. Shorter runs (GOP tails, odd
        counts) fall back to the already-compiled per-frame path so only
        one batched program shape ever compiles. Back-to-back runs are
        double-buffered: run N+1 is queued on the device before run N's
        symbols are fetched, so device analysis of the next run overlaps
        the host entropy writing of the current one."""
        frames = list(frames)
        if not self._batchable:
            return [self.encode_frame(*f) for f in frames]
        out = []
        pending = []   # dispatched-but-unwritten runs (at most one deep)
        fidx = self.frame_idx   # segmentation-time frame counter
        have_ref = self.ref is not None

        def drain():
            while pending:
                out.extend(self._drain_p_run(*pending.pop(0)))

        i = 0
        while i < len(frames):
            # _force_idr only affects the next encode_frame call, which
            # consumes (clears) it
            is_idr = (not have_ref or self._force_idr
                      or (self.gop and fidx % self.gop == 0))
            if is_idr:
                drain()
                out.append(self.encode_frame(*frames[i]))
                fidx += 1
                have_ref = True
                i += 1
                continue
            k = 1
            while (i + k < len(frames) and k < batch
                   and not (self.gop and (fidx + k) % self.gop == 0)):
                k += 1
            if k < batch:
                drain()
                for f in frames[i:i + k]:
                    out.append(self.encode_frame(*f))
            else:
                pending.append(self._dispatch_p_run(frames[i:i + k]))
                if len(pending) > 1:
                    out.extend(self._drain_p_run(*pending.pop(0)))
            fidx += k
            i += k
        drain()
        return out

    def _encode_i_aq(self, Y, U, V):
        n = self.mb_w * self.mb_h
        Yd, Ud, Vd = self._upload(Y, U, V)
        zt16 = jnp.zeros((n, 16, 16), jnp.int32)
        zt8 = jnp.zeros((n, 8, 8), jnp.int32)
        qp_d, qpc_d = self._qp_maps(Yd)
        (i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc, luma_ac,
         chroma_dc, chroma_ac, recY, recU, recV) = intra_wavefront(
            self.mb_w, self.mb_h, Yd, Ud, Vd, zt16, zt8, zt8,
            jnp.ones((n,), bool), qp_d, qpc_d, self._diags,
            self._row_slice)
        self.ref = (recY, recU, recV)  # device arrays
        packed = np.asarray(_pack_intra(luma_dc, luma_ac, chroma_dc,
                                        chroma_ac, i16_mode, chroma_mode,
                                        intra_cls, i4_modes))
        (ldc, lac, cdc, cac, i16m, cm, cls, m4) = _unpack(packed)
        mb_class = np.where(cls == 0, 0, 1).astype(np.uint8)
        mv = np.zeros((n, 2), np.int16)
        data = self._write(1, mb_class, mv, i16m, cm, ldc, lac, cdc, cac,
                           mb_qp=(self._qp_plane if (self.aq or self.gom_rc or self.bgd) else None),
                           i4_modes=m4)
        self._apply_deblock(mb_class, lac, mv)
        return data

    def _encode_p_aq(self, Y, U, V):
        n = self.mb_w * self.mb_h
        Yd, Ud, Vd = self._upload(Y, U, V)
        refY_s, refU_s, refV_s = _pad_refs(
            *(pl[None] for pl in self.ref))
        qp_d, qpc_d = self._qp_maps(Yd)

        (mvx, mvy, use_intra_d, part_d, ref_sel_d, mv8_d, mvq_d, qac_zz,
         cdc_d, cac_d, tile_y, tile_u, tile_v,
         no_res_d) = encode_inter_mbs(
            self.mb_w, self.mb_h, self.ME_RADIUS, Yd, Ud, Vd, refY_s,
            refU_s, refV_s, qp_d, qpc_d, jnp.int32(self._scroll_dy),
            rd_lam=self.trellis_lam)

        meta = np.asarray(_pack_meta(mvx, mvy, use_intra_d, no_res_d,
                                     part_d, mv8_d, ref_sel_d))
        use_intra = meta[:, 2] != 0
        no_res = meta[:, 3] != 0
        part = meta[:, 4]
        mv8 = np.ascontiguousarray(meta[:, 5:13], np.int16)
        mv = np.zeros((n, 2), np.int16)
        mv[:, 0] = meta[:, 0]
        mv[:, 1] = meta[:, 1]
        mv[use_intra] = 0
        mb_class = np.where(use_intra, 1, 3 + part).astype(np.uint8)

        if use_intra.any():
            # intra-fallback wavefront on top of the inter recon tiles
            m = jnp.asarray(~use_intra)[:, None, None]
            (i16_mode, intra_cls, i4_modes, chroma_mode, luma_dc_i,
             luma_ac_i, chroma_dc_i, chroma_ac_i, recY, recU,
             recV) = intra_wavefront(
                self.mb_w, self.mb_h, Yd, Ud, Vd, jnp.where(m, tile_y, 0),
                jnp.where(m, tile_u, 0), jnp.where(m, tile_v, 0),
                use_intra_d, qp_d, qpc_d, self._diags, self._row_slice)
            packed = np.asarray(_pack_merge(
                use_intra_d, luma_dc_i, luma_ac_i, chroma_dc_i, chroma_ac_i,
                i16_mode, chroma_mode, intra_cls, i4_modes, qac_zz, cdc_d,
                cac_d))
        else:
            recY, recU, recV = _finalize_inter(self.mb_w, self.mb_h, tile_y,
                                               tile_u, tile_v)
            packed = np.asarray(_pack_inter_only(qac_zz, cdc_d, cac_d))

        (ldc, lac, cdc, cac, i16m, cm, cls, m4) = _unpack(packed)

        # P_Skip: zero residual + MV equals the skip predictor (P16x16)
        skip_pred, _ = self._mv_preds(mb_class, mv, mv8)
        is_skip = (no_res & ~use_intra & (part == 0)
                   & (mv[:, 0] == skip_pred[:, 0])
                   & (mv[:, 1] == skip_pred[:, 1]))
        mb_class[is_skip] = 11

        mb_class[use_intra & (cls == 0)] = 0  # I4x4 fallback MBs
        if self._cur_is_ref:
            self.ref = (recY, recU, recV)  # device arrays
        data = self._write(0, mb_class, mv, i16m, cm, ldc, lac, cdc, cac,
                           mb_qp=(self._qp_plane if (self.aq or self.gom_rc or self.bgd) else None),
                           i4_modes=m4, mv8=mv8)
        self._apply_deblock(mb_class, lac, mv, mv8)
        return data

    def force_intra_frame(self):
        """Make the next encoded frame an IDR (the reference's
        ISVCEncoder::ForceIntraFrame, codec_api.h)."""
        self._force_idr = True

    def encode_frame(self, Y, U, V, timestamp_ms=None):
        """Encode one frame; returns the Annex-B bytes, or b"" when the
        rate controller drops the frame (reference CheckFrameSkipBasedMaxbr
        -> the frame is never encoded and no state advances)."""
        from . import processing as proc
        is_idr = (self.ref is None or self.intra_only or self._force_idr
                  or (self.gop and self.frame_idx % self.gop == 0))
        if self.rc is not None:
            if is_idr:
                self.rc.tick(timestamp_ms)  # IDRs drain the buffer too
            elif self.rc.should_skip(timestamp_ms):
                return b""
        self._force_idr = False
        # temporal layer of this frame (T1 = odd frames, non-reference)
        t1 = (self.temporal_layers == 2 and not is_idr
              and self.frame_idx % 2 == 1)
        self._cur_is_ref = not t1
        self._rplr_diff, self._mmco_drops = 0, None
        hier = self.temporal_layers >= 3
        layer = 0
        if hier and not is_idr:
            # dyadic position: layer from trailing zeros, parent = the
            # previous frame of the next-lower layer (pos - lowest bit)
            p = self._gop_pos
            layer = self.temporal_layers - 1 - min(
                (p & -p).bit_length() - 1, self.temporal_layers - 1)
            self._cur_is_ref = layer < self.temporal_layers - 1
            parent = next(e for e in self._dpb
                          if e["pos"] == p - (p & -p))
            self.ref = parent["recon"]
            newest = max(e["fn"] for e in self._dpb)
            if parent["fn"] != newest:
                # parent isn't the default L0[0]: reorder it to front
                self._rplr_diff = (self._frame_num - parent["fn"]) & 0xff
            if self._cur_is_ref:
                stale = [e for e in self._dpb if e["layer"] >= layer]
                if stale:
                    self._mmco_drops = [
                        ((self._frame_num - e["fn"]) & 0xff) - 1
                        for e in stale]
                    self._dpb = [e for e in self._dpb
                                 if e["layer"] < layer]
        cur_src = None
        if (self.scene_cut or self.rc or self.aq or self.bgd
                or self.scroll_me):
            Yp = (np.pad(Y, ((0, self.pad_h), (0, self.pad_w)), mode="edge")
                  if (self.pad_w or self.pad_h) else Y)
            cur_src = jnp.asarray(Yp)
        scene_idc = ratectl.SCENE_IDC_NONE
        if ((self.scene_cut or self.rc is not None)
                and self._prev_src is not None):
            score = float(proc.scene_change_score(cur_src, self._prev_src))
            if score > proc.SCENE_CHANGE_RATIO_LARGE:
                scene_idc = ratectl.SCENE_IDC_LARGE
            elif score > proc.SCENE_CHANGE_RATIO_MEDIUM:
                scene_idc = ratectl.SCENE_IDC_MEDIUM
        if (self.scene_cut and not is_idr
                and scene_idc == ratectl.SCENE_IDC_LARGE):
            is_idr = True
        if self.rc is not None:
            cx = (float(proc.frame_complexity(cur_src, self._prev_src))
                  if self._prev_src is not None else
                  float(jnp.abs(cur_src.astype(jnp.int32) - 128).sum()))
            self.qp = int(self.rc.frame_qp(cx, is_idr,
                                           timestamp_ms=timestamp_ms,
                                           scene_idc=scene_idc))
            self.qp = max(10, min(self.qp, 51))
            self.qpc = int(dn.CHROMA_QP[self.qp])
        if self.scroll_me and not is_idr and self._prev_src is not None:
            det, dy = proc.scroll_detect(cur_src, self._prev_src)
            # clamp so integer MVs stay inside the PAD-pixel gather
            # window of the subpel kernels (|mv_int| <= radius + |dy|)
            self._scroll_dy = (int(np.clip(int(dy), -(PAD - 4 - self.ME_RADIUS - 1),
                                           PAD - 4 - self.ME_RADIUS - 1))
                               if bool(det) else 0)
        else:
            self._scroll_dy = 0
        if is_idr:
            self._frame_num = 0
            self._idr_id += 1
            self._ref2 = None  # IDR empties the DPB
        if self._use_ltr_next and not is_idr:
            # predict this frame from the long-term reference; its own
            # recon then re-seeds the short-term chain (loss recovery)
            self.ref = self._ltr_ref
        if self.slice_max_bytes:
            self._plan_dynamic_slices()
            ref_before = self.ref
            ref2_before = self._ref2
            data = (self._encode_i(Y, U, V) if is_idr
                    else self._encode_p(Y, U, V))
            if self._dyn_slice_violated() and self._plan_dynamic_slices():
                # a slice blew the cap: replan from this frame's
                # measured row costs and re-encode once. Restore BOTH
                # reference planes — with refs=2 the first encode
                # already rotated _ref2, and re-encoding against a
                # [prev, prev] stack while signalling two references
                # would silently drift from the decoder's DPB.
                self.ref = ref_before
                self._ref2 = ref2_before
                data = (self._encode_i(Y, U, V) if is_idr
                        else self._encode_p(Y, U, V))
        else:
            data = (self._encode_i(Y, U, V) if is_idr
                    else self._encode_p(Y, U, V))
        if hier:
            if is_idr:
                self._gop_pos = 0
                self._dpb = [{"pos": 0, "fn": self._frame_num,
                              "layer": 0, "recon": self.ref}]
            elif self._cur_is_ref:
                self._dpb.append({"pos": self._gop_pos,
                                  "fn": self._frame_num,
                                  "layer": layer, "recon": self.ref})
            self._gop_pos += 1
        self._use_ltr_next = False
        if self.ltr and self._cur_is_ref and (is_idr or self._mark_ltr_next):
            self._ltr_ref = self.ref  # this frame's recon is the LTR
            self._mark_ltr_next = False
        if self._cur_is_ref:  # 7.4.3: frame_num advances per ref frame
            self._frame_num = (self._frame_num + 1) & 0xff
        if self.rc is not None:
            self.rc.update(8 * len(data))
        self._prev_src = cur_src
        self.frame_idx += 1
        return data

    @property
    def recon(self):
        """Host copies of the reconstruction planes (testing/inspection)."""
        return tuple(np.asarray(p) for p in self.ref)


def encode_yuv(frames, width, height, qp=28, gop=0, intra_only=False):
    enc = JaxEncoder(width, height, qp=qp, gop=gop, intra_only=intra_only)
    return b"".join(enc.encode_frames(list(frames)))
