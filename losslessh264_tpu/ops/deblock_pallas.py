"""Pallas TPU wavefront kernel for in-loop deblocking.

The H.264 loop filter is a strict MB wavefront (an MB's edges read
pixels its LEFT/ABOVE neighbors may have filtered, and the spec's edge
order is sequential within the MB — 8.7). The lax.scan formulation pays
per-HLO dispatch overhead on tiny shapes for every one of the ~170
diagonals; here the WHOLE wavefront is ONE Mosaic kernel:

- grid = (n_diagonals,) — the TPU grid is sequential, which IS the
  wavefront order;
- the three output buffers double as the VMEM-resident working planes
  (constant-index blocks persist across the sequential grid and flush
  to HBM once at the end); step 0 seeds them from the HBM inputs;
- per-diagonal filter parameters (bS, alpha, beta, tc0 — precomputed
  batched in ops/deblock._edge_params) ride in ONE packed [K, 384] row
  per step (tiny trailing dims would tile-pad to (8,128) each and blow
  VMEM), and every field access is a static 2D slice;
- each step gathers the diagonal's disjoint 24x24 luma / 16x16 chroma
  windows into scratch, runs the same edge order + filter math as the
  lax path (shared filter_luma/filter_chroma), and scatters the windows
  back. Mosaic requires 128-aligned dynamic lane offsets, so window
  loads/stores go through a 128-aligned [rows, 256] strip plus a
  dynamic lane roll.

Reference: WelsDeblockingFilterSlice / WelsDeblockingMb
(decoder/core/src/deblocking.cpp:815-872) — a serial per-MB CPU loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed param row layout (int32 lanes)
_OFF_BSV = 0        # [4,16] flattened
_OFF_BSH = 64
_OFF_TCV = 128
_OFF_TCH = 192
_OFF_AV = 256       # [4]
_OFF_BV = 260
_OFF_AH = 264
_OFF_BH = 268
_OFF_BSCV = 272     # [2,8] flattened
_OFF_BSCH = 288
_OFF_TCCV = 304
_OFF_TCCH = 320
_OFF_ACV = 336      # [2]
_OFF_BCV = 338
_OFF_ACH = 340
_OFF_BCH = 342
_PW = 384           # padded row width (lane multiple of 128)


def _kernel(mb_w, mb_h, nd, K, diag_ref, pref,
            Yin, Uin, Vin, Ys, Us, Vs,
            ywin, uwin, vwin, sems):
    from .deblock import filter_chroma as _fc
    from .deblock import filter_luma as _fl

    d = pl.program_id(0)

    # the outputs ARE the VMEM-resident working planes (constant-index
    # blocks persist across the sequential grid and flush once at the
    # end); step 0 seeds them from the HBM inputs
    @pl.when(d == 0)
    def _load_planes():
        for src, dst, s in ((Yin, Ys, 0), (Uin, Us, 1), (Vin, Vs, 2)):
            cp = pltpu.make_async_copy(src, dst, sems.at[s])
            cp.start()
            cp.wait()

    def _load_win(plane, y0, x0, rows, cols):
        base = pl.multiple_of((x0 // 128) * 128, 128)
        strip = plane[pl.ds(y0, rows), pl.ds(base, 256)]
        return pltpu.roll(strip, -(x0 - base), 1)[:, :cols]

    def _store_win(plane, y0, x0, rows, cols, win):
        base = pl.multiple_of((x0 // 128) * 128, 128)
        off = x0 - base
        strip = plane[pl.ds(y0, rows), pl.ds(base, 256)]
        wpad = jnp.pad(win, ((0, 0), (0, 256 - cols)))
        wroll = pltpu.roll(wpad, off, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 256), 1)
        mask = (lane >= off) & (lane < off + cols)
        plane[pl.ds(y0, rows), pl.ds(base, 256)] = jnp.where(
            mask, wroll, strip)

    def gather(k, _):
        mb = jnp.maximum(diag_ref[d, k], 0)
        y0 = (mb // mb_w) * 16
        x0 = (mb % mb_w) * 16
        ywin[pl.ds(k, 1)] = _load_win(Ys, y0, x0, 24, 24)[None]
        cy = (mb // mb_w) * 8
        cx = (mb % mb_w) * 8
        uwin[pl.ds(k, 1)] = _load_win(Us, cy, cx, 16, 16)[None]
        vwin[pl.ds(k, 1)] = _load_win(Vs, cy, cx, 16, 16)[None]
        return 0

    jax.lax.fori_loop(0, K, gather, 0)

    P = pref[0]  # [K, _PW]

    # same edge order + filter math as the lax path; every param access
    # is a static 2D slice of the packed row
    for k4 in range(4):
        ex = 8 + 4 * k4
        pc = jnp.stack([ywin[:, 8:24, ex - 1 - i] for i in range(4)])
        qc = jnp.stack([ywin[:, 8:24, ex + i] for i in range(4)])
        (p0, p1, p2), (q0, q1, q2) = _fl(
            pc, qc, P[:, _OFF_BSV + k4 * 16:_OFF_BSV + (k4 + 1) * 16],
            P[:, _OFF_AV + k4:_OFF_AV + k4 + 1],
            P[:, _OFF_BV + k4:_OFF_BV + k4 + 1],
            P[:, _OFF_TCV + k4 * 16:_OFF_TCV + (k4 + 1) * 16])
        ywin[:, 8:24, ex - 1] = p0
        ywin[:, 8:24, ex - 2] = p1
        ywin[:, 8:24, ex - 3] = p2
        ywin[:, 8:24, ex] = q0
        ywin[:, 8:24, ex + 1] = q1
        ywin[:, 8:24, ex + 2] = q2
    for k4 in range(4):
        ey = 8 + 4 * k4
        pr = jnp.stack([ywin[:, ey - 1 - i, 8:24] for i in range(4)])
        qr = jnp.stack([ywin[:, ey + i, 8:24] for i in range(4)])
        (p0, p1, p2), (q0, q1, q2) = _fl(
            pr, qr, P[:, _OFF_BSH + k4 * 16:_OFF_BSH + (k4 + 1) * 16],
            P[:, _OFF_AH + k4:_OFF_AH + k4 + 1],
            P[:, _OFF_BH + k4:_OFF_BH + k4 + 1],
            P[:, _OFF_TCH + k4 * 16:_OFF_TCH + (k4 + 1) * 16])
        ywin[:, ey - 1, 8:24] = p0
        ywin[:, ey - 2, 8:24] = p1
        ywin[:, ey - 3, 8:24] = p2
        ywin[:, ey, 8:24] = q0
        ywin[:, ey + 1, 8:24] = q1
        ywin[:, ey + 2, 8:24] = q2
    for cwin in (uwin, vwin):
        for j in range(2):
            ex = 8 + 4 * j
            pc = jnp.stack([cwin[:, 8:16, ex - 1 - i] for i in range(2)])
            qc = jnp.stack([cwin[:, 8:16, ex + i] for i in range(2)])
            p0, q0 = _fc(
                pc, qc, P[:, _OFF_BSCV + j * 8:_OFF_BSCV + (j + 1) * 8],
                P[:, _OFF_ACV + j:_OFF_ACV + j + 1],
                P[:, _OFF_BCV + j:_OFF_BCV + j + 1],
                P[:, _OFF_TCCV + j * 8:_OFF_TCCV + (j + 1) * 8])
            cwin[:, 8:16, ex - 1] = p0
            cwin[:, 8:16, ex] = q0
        for j in range(2):
            ey = 8 + 4 * j
            pr = jnp.stack([cwin[:, ey - 1 - i, 8:16] for i in range(2)])
            qr = jnp.stack([cwin[:, ey + i, 8:16] for i in range(2)])
            p0, q0 = _fc(
                pr, qr, P[:, _OFF_BSCH + j * 8:_OFF_BSCH + (j + 1) * 8],
                P[:, _OFF_ACH + j:_OFF_ACH + j + 1],
                P[:, _OFF_BCH + j:_OFF_BCH + j + 1],
                P[:, _OFF_TCCH + j * 8:_OFF_TCCH + (j + 1) * 8])
            cwin[:, ey - 1, 8:16] = p0
            cwin[:, ey, 8:16] = q0

    def scatter(k, _):
        mb = diag_ref[d, k]

        @pl.when(mb >= 0)
        def _():
            mbc = jnp.maximum(mb, 0)
            y0 = (mbc // mb_w) * 16
            x0 = (mbc % mb_w) * 16
            _store_win(Ys, y0, x0, 24, 24, ywin[pl.ds(k, 1)][0])
            cy = (mbc // mb_w) * 8
            cx = (mbc % mb_w) * 8
            _store_win(Us, cy, cx, 16, 16, uwin[pl.ds(k, 1)][0])
            _store_win(Vs, cy, cx, 16, 16, vwin[pl.ds(k, 1)][0])

        return 0

    jax.lax.fori_loop(0, K, scatter, 0)


def _pack_params(params, mbc):
    """One [nd, K, _PW] int32 row per (diagonal, lane)."""
    n = params["bs_v"].shape[0]
    fields = [
        params["bs_v"].reshape(n, 64), params["bs_h"].reshape(n, 64),
        params["tc0_v"].reshape(n, 64), params["tc0_h"].reshape(n, 64),
        params["alpha_v"], params["beta_v"],
        params["alpha_h"], params["beta_h"],
        params["bs_cv"].reshape(n, 16), params["bs_ch"].reshape(n, 16),
        params["tc0_cv"].reshape(n, 16), params["tc0_ch"].reshape(n, 16),
        params["alpha_cv"], params["beta_cv"],
        params["alpha_ch"], params["beta_ch"],
    ]
    P = jnp.concatenate([f.astype(jnp.int32) for f in fields], axis=1)
    P = jnp.pad(P, ((0, 0), (0, _PW - P.shape[1])))
    return P[mbc]


def deblock_wavefront(mb_w, mb_h, Yw, Uw, Vw, params, diags):
    """Run the whole-frame deblock wavefront as one Pallas kernel.

    Yw/Uw/Vw int32 planes padded by ops.deblock.WPAD (= 8, so windows
    start at plane offsets 16*mb). params: _edge_params() output. diags:
    the [nd, K] slope-2 schedule (-1 padding).
    """
    nd, K = diags.shape
    n = mb_w * mb_h
    mbc = jnp.clip(diags, 0, n - 1)
    Pd = _pack_params(params, mbc)

    # pad plane widths so the kernel's 128-aligned [rows, 256] strip
    # accesses stay in bounds: max strip end = (max window x)//128*128+256
    def _padw(p, max_x0):
        wp = max((max_x0 // 128) * 128 + 256, p.shape[1])
        return jnp.pad(p.astype(jnp.int32), ((0, 0), (0, wp - p.shape[1])))

    shapes = [p.shape for p in (Yw, Uw, Vw)]
    Yp = _padw(Yw, 16 * (mb_w - 1))
    Up = _padw(Uw, 8 * (mb_w - 1))
    Vp = _padw(Vw, 8 * (mb_w - 1))

    def _imap(d, *_srefs):
        return (d, 0, 0)

    def _const_imap(ndim):
        def f(d, *_srefs):
            return (0,) * ndim
        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nd,),
        in_specs=(
            [pl.BlockSpec((1, K, _PW), _imap, memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        ),
        out_specs=[
            pl.BlockSpec(p.shape, _const_imap(p.ndim),
                         memory_space=pltpu.VMEM)
            for p in (Yp, Up, Vp)
        ],
        scratch_shapes=[
            pltpu.VMEM((K, 24, 24), jnp.int32),
            pltpu.VMEM((K, 16, 16), jnp.int32),
            pltpu.VMEM((K, 16, 16), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kern = functools.partial(_kernel, mb_w, mb_h, nd, K)
    out_shape = [jax.ShapeDtypeStruct(p.shape, jnp.int32)
                 for p in (Yp, Up, Vp)]
    Yo, Uo, Vo = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(diags.astype(jnp.int32), Pd, Yp, Up, Vp)
    return (Yo[:, :shapes[0][1]], Uo[:, :shapes[1][1]],
            Vo[:, :shapes[2][1]])
