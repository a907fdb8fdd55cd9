"""Fully-vectorized deblock wavefront: one lax.scan over slope-2
diagonals with NO per-MB serial work.

The Pallas/lax wavefronts spend most of each diagonal step in serial
per-MB window gathers and read-modify-write scatters (the windows of a
diagonal are disjoint, but they sit at unaligned plane offsets). This
formulation removes both:

- every MB window is pre-extracted with two regular takes + one
  transpose (no generic gather), stacked in diagonal order, and fed to
  the scan as xs — a step just slices its [K, 24, 24] batch;
- the only pixels a step needs from earlier filtering are the left /
  above / above-right neighbors' updates, which live in the previous two
  steps' window tensors. Those ride the scan carry and are applied as
  three statically-shaped shifted copies (the per-diagonal k-alignment
  offsets are precomputed scalars);
- the spec's 8.7 sequential edge order is preserved, but each edge is
  ONE slice + ONE fused write (and U/V ride one batched tensor);
- no plane is updated in place: the scan stacks every diagonal's
  filtered windows and ONE precomputed ownership gather assembles the
  output frame — plane pixel (i, j) is last written by the filtering of
  MB ((i+3)//16, (j+3)//16) for luma ((i+1)//8 for chroma), because an
  MB's left/top edges write at most 3 (1) pixels into its neighbors.

Reference: WelsDeblockingFilterSlice / WelsDeblockingMb
(decoder/core/src/deblocking.cpp:815-872) — a serial per-MB CPU loop.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _schedule(mb_w, mb_h):
    """Static wavefront schedule + gather maps for one frame geometry."""
    nd = 2 * (mb_h - 1) + mb_w
    # first/last y on each slope-2 diagonal (x = d - 2y in [0, mb_w))
    y0 = np.maximum(0, -(-(np.arange(nd) - (mb_w - 1)) // 2))
    y1 = np.minimum(mb_h - 1, np.arange(nd) // 2)
    K = int((y1 - y0 + 1).max())

    ks = np.arange(K)
    ys = y0[:, None] + ks[None, :]                      # [nd, K]
    xs = np.arange(nd)[:, None] - 2 * ys
    valid = ys <= y1[:, None]
    ysc = np.where(valid, ys, 0)
    xsc = np.where(valid, xs, 0)
    mb = ysc * mb_w + xsc                               # [nd, K]
    # window-extraction take indices (regular row/col takes beat a
    # generic gather on TPU): padded-plane row r of window y = 16y + r
    wrow = (16 * np.arange(mb_h)[:, None]
            + np.arange(24)[None, :]).reshape(-1).astype(np.int32)
    wcol = (16 * np.arange(mb_w)[:, None]
            + np.arange(24)[None, :]).reshape(-1).astype(np.int32)
    crow = (8 * np.arange(mb_h)[:, None]
            + np.arange(16)[None, :]).reshape(-1).astype(np.int32)
    ccol = (8 * np.arange(mb_w)[:, None]
            + np.arange(16)[None, :]).reshape(-1).astype(np.int32)

    # k-alignment offsets into the previous diagonals' window stacks
    # (carries are padded by one row on each side, so slice starts are
    # 1 + off and always land in [0, 2])
    off_l = np.zeros(nd, np.int32)
    off_a = np.zeros(nd, np.int32)
    off_ar = np.zeros(nd, np.int32)
    off_l[1:] = y0[1:] - y0[:-1]
    off_ar[1:] = y0[1:] - 1 - y0[:-1]
    off_a[2:] = y0[2:] - 1 - y0[:-2]

    v_left = valid & (xs > 0)
    v_above = valid & (ys > 0)
    v_ar = valid & (ys > 0) & (xs < mb_w - 1)

    # raster -> stacked-window position: inv[mb] = d * K + k (output
    # assembly slices whole windows, so only a first-axis permutation
    # is needed — a per-pixel flat gather costs ~9 ms at 720p on TPU)
    ys_r = np.arange(mb_h * mb_w) // mb_w
    xs_r = np.arange(mb_h * mb_w) % mb_w
    d_r = 2 * ys_r + xs_r
    inv = (d_r * K + (ys_r - y0[d_r])).astype(np.int32)

    return dict(nd=nd, K=K, mb=mb.astype(np.int32),
                wrow=wrow, wcol=wcol, crow=crow, ccol=ccol,
                off_l=off_l, off_a=off_a, off_ar=off_ar,
                v_left=v_left, v_above=v_above, v_ar=v_ar,
                inv=inv)


_LUMA_KEYS = ("bs_v", "bs_h", "alpha_v", "beta_v", "tc0_v", "alpha_h",
              "beta_h", "tc0_h")
_CHROMA_KEYS = ("bs_cv", "bs_ch", "alpha_cv", "beta_cv", "tc0_cv",
                "alpha_ch", "beta_ch", "tc0_ch")


def _luma_edges(win, bs_v, bs_h, a_v, b_v, tc_v, a_h, b_h, tc_h):
    """Spec edge order on a [K, 24, 24] window batch; each edge is one
    slice + one fused write."""
    from .deblock import filter_luma
    for k in range(4):
        ex = 8 + 4 * k
        seg = win[:, 8:24, ex - 4:ex + 4]                 # [K,16,8]
        p = jnp.moveaxis(seg[:, :, 3::-1], -1, 0)         # [4,K,16]
        q = jnp.moveaxis(seg[:, :, 4:], -1, 0)
        (p0, p1, p2), (q0, q1, q2) = filter_luma(
            p, q, bs_v[:, k, :], a_v[:, k, None], b_v[:, k, None],
            tc_v[:, k, :])
        win = win.at[:, 8:24, ex - 3:ex + 3].set(
            jnp.stack([p2, p1, p0, q0, q1, q2],
                      axis=-1).astype(win.dtype))
    for k in range(4):
        ey = 8 + 4 * k
        seg = win[:, ey - 4:ey + 4, 8:24]                 # [K,8,16]
        p = jnp.moveaxis(seg[:, 3::-1, :], 1, 0)          # [4,K,16]
        q = jnp.moveaxis(seg[:, 4:, :], 1, 0)
        (p0, p1, p2), (q0, q1, q2) = filter_luma(
            p, q, bs_h[:, k, :], a_h[:, k, None], b_h[:, k, None],
            tc_h[:, k, :])
        win = win.at[:, ey - 3:ey + 3, 8:24].set(
            jnp.stack([p2, p1, p0, q0, q1, q2],
                      axis=1).astype(win.dtype))
    return win


def _chroma_edges(win, bs_cv, bs_ch, a_cv, b_cv, tc_cv, a_ch, b_ch,
                  tc_ch):
    """U and V batched on one [2, K, 16, 16] tensor (same params)."""
    from .deblock import filter_chroma
    for j in range(2):
        ex = 8 + 4 * j
        seg = win[:, :, 8:16, ex - 2:ex + 2]              # [2,K,8,4]
        p = jnp.moveaxis(seg[..., 1::-1], -1, 0)          # [2,2,K,8]
        q = jnp.moveaxis(seg[..., 2:], -1, 0)
        p0, q0 = filter_chroma(p, q, bs_cv[:, j, :], a_cv[:, j, None],
                               b_cv[:, j, None], tc_cv[:, j, :])
        win = win.at[:, :, 8:16, ex - 1:ex + 1].set(
            jnp.stack([p0, q0], axis=-1).astype(win.dtype))
    for j in range(2):
        ey = 8 + 4 * j
        seg = win[:, :, ey - 2:ey + 2, 8:16]              # [2,K,4,8]
        p = jnp.moveaxis(seg[:, :, 1::-1, :], 2, 0)
        q = jnp.moveaxis(seg[:, :, 2:, :], 2, 0)
        p0, q0 = filter_chroma(p, q, bs_ch[:, j, :], a_ch[:, j, None],
                               b_ch[:, j, None], tc_ch[:, j, :])
        win = win.at[:, :, ey - 1:ey + 1, 8:16].set(
            jnp.stack([p0, q0], axis=2).astype(win.dtype))
    return win


def deblock_wavefront_scan(mb_w, mb_h, Yw, Uw, Vw, params):
    """Filter WPAD-padded int32 planes; returns filtered planes.

    Equivalent to the serial MB wavefront but with every diagonal step
    fully vectorized (see module docstring).
    """
    from .deblock import WPAD

    S = _schedule(mb_w, mb_h)
    nd, K = S["nd"], S["K"]
    H, W = 16 * mb_h, 16 * mb_w

    mbc = jnp.asarray(S["mb"])
    # int16 WINDOWS (storage, carries, halo copies — the bulk of the
    # wavefront's vector traffic — at half width) with int32 PARAMS:
    # the filters promote to int32 on the param operands, so the edge
    # math itself runs in int32 (a pure-int16 filter chain measured
    # real divergence inside the scan; the isolated filter is i16-exact
    # but the composed edge sequence is not worth the risk), and the
    # results cast back to i16 on the window writeback.
    lum = [jnp.asarray(params[k])[mbc] for k in _LUMA_KEYS]     # [nd,K,..]
    chr_ = [jnp.asarray(params[k])[mbc] for k in _CHROMA_KEYS]

    def all_windows(plane, rows, cols, t):
        # [n, t+8, t+8] MB windows via two regular takes + one transpose
        a = jnp.take(plane, jnp.asarray(rows), axis=0)
        a = jnp.take(a, jnp.asarray(cols), axis=1)
        w = t + 8
        return a.reshape(mb_h, w, mb_w, w).transpose(0, 2, 1, 3) \
            .reshape(mb_h * mb_w, w, w)

    win_y = all_windows(Yw, S["wrow"], S["wcol"], 16) \
        .astype(jnp.int16)[mbc]                             # [nd,K,24,24]
    win_c = jnp.stack(
        [all_windows(Uw, S["crow"], S["ccol"], 8).astype(jnp.int16)[mbc],
         all_windows(Vw, S["crow"], S["ccol"], 8).astype(jnp.int16)[mbc]],
        axis=1)                                             # [nd,2,K,16,16]

    xs = dict(
        wy=win_y, wc=win_c,
        off_l=jnp.asarray(S["off_l"]), off_a=jnp.asarray(S["off_a"]),
        off_ar=jnp.asarray(S["off_ar"]),
        v_left=jnp.asarray(S["v_left"]), v_above=jnp.asarray(S["v_above"]),
        v_ar=jnp.asarray(S["v_ar"]),
        lum=lum, chr=chr_,
    )

    def halo_y(win, prev, off, mask, dst_r, dst_c, src_r, src_c):
        src = jax.lax.dynamic_slice(prev, (1 + off, 0, 0), (K, 24, 24))
        patch = src[:, src_r[0]:src_r[1], src_c[0]:src_c[1]]
        cur = win[:, dst_r[0]:dst_r[1], dst_c[0]:dst_c[1]]
        return win.at[:, dst_r[0]:dst_r[1], dst_c[0]:dst_c[1]].set(
            jnp.where(mask[:, None, None], patch, cur))

    def halo_c(win, prev, off, mask, dst_r, dst_c, src_r, src_c):
        src = jax.lax.dynamic_slice(prev, (0, 1 + off, 0, 0),
                                    (2, K, 16, 16))
        patch = src[:, :, src_r[0]:src_r[1], src_c[0]:src_c[1]]
        cur = win[:, :, dst_r[0]:dst_r[1], dst_c[0]:dst_c[1]]
        return win.at[:, :, dst_r[0]:dst_r[1], dst_c[0]:dst_c[1]].set(
            jnp.where(mask[None, :, None, None], patch, cur))

    def step(carry, x):
        w1y, w1c, w2y, w2c = carry
        wy, wc = x["wy"], x["wc"]

        # halo refresh: LEFT (d-1) right columns, ABOVE (d-2) bottom
        # rows, then ABOVE-RIGHT (d-1) overwrites the fresher top-right
        # (its vertical edge 0 touched the above MB's last columns).
        # The LEFT copy starts at row 5 (chroma 7), not 8: the output
        # ownership map assigns the 3x3 corner above-left of an MB
        # (window [5:8, 5:8]) to THIS window, and the left neighbor's
        # top-edge horizontal filtering is the serial-order last writer
        # of those pixels (its p-writes reach 3 rows above the MB edge) —
        # rows 8:24 alone left the corner stale.
        wy = halo_y(wy, w1y, x["off_l"], x["v_left"], (5, 24), (0, 8),
                    (5, 24), (16, 24))
        wy = halo_y(wy, w2y, x["off_a"], x["v_above"], (4, 8), (8, 24),
                    (20, 24), (8, 24))
        wy = halo_y(wy, w1y, x["off_ar"], x["v_ar"], (4, 8), (16, 24),
                    (20, 24), (0, 8))
        wc = halo_c(wc, w1c, x["off_l"], x["v_left"], (7, 16), (0, 8),
                    (7, 16), (8, 16))
        wc = halo_c(wc, w2c, x["off_a"], x["v_above"], (6, 8), (8, 16),
                    (14, 16), (8, 16))
        wc = halo_c(wc, w1c, x["off_ar"], x["v_ar"], (6, 8), (14, 16),
                    (14, 16), (6, 8))

        wy = _luma_edges(wy, *x["lum"])
        wc = _chroma_edges(wc, *x["chr"])

        new_carry = (jnp.pad(wy, ((1, 1), (0, 0), (0, 0))),
                     jnp.pad(wc, ((0, 0), (1, 1), (0, 0), (0, 0))),
                     w1y, w1c)
        return new_carry, (wy, wc)

    # Seed the carry's varying-manual-axes from an xs leaf: under
    # shard_map the scan body's outputs are {V:axis}-varying, so a
    # plain jnp.zeros initial carry would mismatch (scan-vma rule).
    # Adding 0*varying is a no-op outside shard_map and makes the
    # carry varying inside it, without needing jax.lax.pcast.
    zy = win_y.ravel()[0] * 0
    zc = win_c.ravel()[0] * 0
    carry0 = (jnp.zeros((K + 2, 24, 24), jnp.int16) + zy,
              jnp.zeros((2, K + 2, 16, 16), jnp.int16) + zc,
              jnp.zeros((K + 2, 24, 24), jnp.int16) + zy,
              jnp.zeros((2, K + 2, 16, 16), jnp.int16) + zc)
    _, (Wy, Wc) = jax.lax.scan(step, carry0, xs)

    # output assembly: plane pixel (i, j) is last written by the
    # filtering of MB ((i+3)//16, (j+3)//16) for luma ((i+1)//8 chroma,
    # both clamped at the borders), because an MB's left/top edges write
    # at most 3 (1) pixels into its neighbors — so each MB owns the
    # contiguous t x t window region [8-shift : 8-shift+t] and the frame
    # is rebuilt from whole-window slices (reshape/transpose, no
    # per-pixel gather).
    inv = jnp.asarray(S["inv"])
    n = mb_h * mb_w

    def assemble(Wst, t, shift):
        w = t + 8
        Wr = Wst.reshape(-1, w, w)[inv] \
            .astype(jnp.int32)                   # [n, w, w] raster order
        lo, hi = 8 - shift, 8 - shift + t
        core = (Wr[:, lo:hi, lo:hi].reshape(mb_h, mb_w, t, t)
                .transpose(0, 2, 1, 3).reshape(mb_h * t, mb_w * t))
        right = (Wr[mb_w - 1::mb_w, lo:hi, hi:hi + shift]
                 .reshape(mb_h * t, shift))
        bot = (Wr[(mb_h - 1) * mb_w:, hi:hi + shift, lo:hi]
               .transpose(1, 0, 2).reshape(shift, mb_w * t))
        corner = Wr[n - 1, hi:hi + shift, hi:hi + shift]
        top = jnp.concatenate([core[shift:, shift:], right[shift:]], 1)
        bottom = jnp.concatenate([bot[:, shift:], corner], 1)
        return jnp.concatenate([top, bottom], 0)

    outY = assemble(Wy, 16, 3)
    outU = assemble(Wc[:, 0], 8, 1)
    outV = assemble(Wc[:, 1], 8, 1)
    return (Yw.at[WPAD:WPAD + H, WPAD:WPAD + W].set(outY),
            Uw.at[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].set(outU),
            Vw.at[WPAD:WPAD + H // 2, WPAD:WPAD + W // 2].set(outV))
