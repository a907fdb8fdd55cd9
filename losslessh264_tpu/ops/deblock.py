"""In-loop deblocking (JAX, TPU-first).

Boundary strengths and filter thresholds are computed fully batched over
every edge of the frame (pure per-cell functions of the symbol planes);
the filtering itself runs as the same slope-2 MB wavefront as intra
prediction (an MB's filter reads pixels its left/above/above-right
neighbors may have modified — reference: serial per-MB loop in
deblocking.cpp WelsDeblockingFilterSlice/WelsDeblockingMb).

Element-exact vs decoder_np._deblock.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import decoder_np as _dn
from .wavefront import scatter_tiles

# numpy at module scope: numpy closures bake in as trace-time program
# constants; captured jax Arrays become runtime buffer arguments pinned
# to live device allocations. jnp.asarray at the traced-index use site.
ALPHA = np.asarray(_dn.ALPHA_TABLE)
BETA = np.asarray(_dn.BETA_TABLE)
TC0 = np.asarray(_dn.TC0_TABLE)
CHROMA_QP = np.asarray(_dn.CHROMA_QP)


# ---------------------------------------------------------------------------
# batched boundary strengths
# ---------------------------------------------------------------------------
def compute_bs(mb_w, mb_h, mb_class, nnz, mv, ref, slice_id, deblock_idc):
    """Returns (bs_v [n,4,16], bs_h [n,4,16]) int32 boundary strengths.

    nnz: [n,16] per-cell nonzero flags/counts; mv [n,16,2]; ref [n,16].
    Edges whose filtering is disabled get bS 0.

    Formulated on full-frame 4x4-cell grids where every neighbor access
    is a static roll/shift — the per-edge fancy-index gathers of the
    obvious formulation cost ~30 ms/frame at 720p on TPU (scalar
    gathers), the shifted-grid one is pure vector work.
    """
    intra = ((mb_class == 0) | (mb_class == 1) | (mb_class == 2)
             | (mb_class == 8))
    ch, cw = 4 * mb_h, 4 * mb_w

    def cellgrid(a):  # [n, 16, ...] -> [ch, cw, ...]
        rest = a.shape[2:]
        return (a.reshape((mb_h, mb_w, 4, 4) + rest)
                .transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(rest))))
                .reshape((ch, cw) + rest))

    def mbgrid(a):    # [n] per-MB -> [ch, cw] per-cell
        return jnp.repeat(jnp.repeat(a.reshape(mb_h, mb_w), 4, 0), 4, 1)

    nzg = cellgrid((nnz > 0).astype(jnp.int32))
    refg = cellgrid(ref)
    mvg = cellgrid(mv.astype(jnp.int32))
    intrag = mbgrid(intra)
    sliceg = mbgrid(slice_id)
    idcg = mbgrid(deblock_idc)
    colg = jnp.broadcast_to(jnp.arange(cw)[None, :], (ch, cw))
    rowg = jnp.broadcast_to(jnp.arange(ch)[:, None], (ch, cw))

    def bs_dir(axis):
        """bs of each cell's left (axis=1) / top (axis=0) edge."""
        shp = lambda g: jnp.roll(g, 1, axis)                 # noqa: E731
        pos = colg if axis == 1 else rowg
        mb_edge = (pos % 4) == 0
        nzp, rp, mvp = shp(nzg), shp(refg), shp(mvg)
        mv_far = ((jnp.abs(mvp[..., 0] - mvg[..., 0]) >= 4)
                  | (jnp.abs(mvp[..., 1] - mvg[..., 1]) >= 4))
        b = jnp.where((nzp | nzg) > 0, 2,
                      jnp.where((rp != refg) | mv_far, 1, 0))
        b = jnp.where(shp(intrag) | intrag,
                      jnp.where(mb_edge, 4, 3), b)
        cross = shp(sliceg) != sliceg
        off = ((idcg == 1)
               | (mb_edge & ((pos == 0) | ((idcg == 2) & cross))))
        return jnp.where(off, 0, b)

    def per_mb(bsg, axis):
        """[ch, cw] cell-edge grid -> [n, 4 edges, 16 sample lines]."""
        a = bsg.reshape(mb_h, 4, mb_w, 4)
        if axis == 1:   # vertical: edge = cell col, line = sample row
            a = a.transpose(0, 2, 3, 1)     # [mb_h, mb_w, edge, cellrow]
        else:           # horizontal: edge = cell row, line = sample col
            a = a.transpose(0, 2, 1, 3)     # [mb_h, mb_w, edge, cellcol]
        a = a.reshape(mb_h * mb_w, 4, 4)
        return jnp.repeat(a, 4, axis=2)     # cell -> 4 sample lines

    return per_mb(bs_dir(1), 1), per_mb(bs_dir(0), 0)


# ---------------------------------------------------------------------------
# edge filters (vectorized along the edge)
# ---------------------------------------------------------------------------
def filter_luma(p, q, bs, alpha, beta, tc0):
    """p,q: [4,E] int32 (p[0] nearest). Returns filtered (p0..p2, q0..q2)."""
    p0, p1, p2, p3 = p[0], p[1], p[2], p[3]
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    strong = filt & (bs == 4)
    normal = filt & (bs < 4)
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    tc = tc0 + (ap < beta) + (aq < beta)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.where(normal, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(normal, jnp.clip(q0 - delta, 0, 255), q0)
    dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0)
    np1 = jnp.where(normal & (ap < beta), p1 + dp1, p1)
    dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0)
    nq1 = jnp.where(normal & (aq < beta), q1 + dq1, q1)
    cond = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = cond & (ap < beta)
    sq = cond & (aq < beta)
    np0 = jnp.where(strong & sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    jnp.where(strong & ~sp, (2 * p1 + p0 + q1 + 2) >> 2, np0))
    np1 = jnp.where(strong & sp, (p2 + p1 + p0 + q0 + 2) >> 2, np1)
    np2 = jnp.where(strong & sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    nq0 = jnp.where(strong & sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    jnp.where(strong & ~sq, (2 * q1 + q0 + p1 + 2) >> 2, nq0))
    nq1 = jnp.where(strong & sq, (q2 + q1 + q0 + p0 + 2) >> 2, nq1)
    nq2 = jnp.where(strong & sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    return (np0, np1, np2), (nq0, nq1, nq2)


def filter_chroma(p, q, bs, alpha, beta, tc0):
    p0, p1 = p[0], p[1]
    q0, q1 = q[0], q[1]
    filt = ((bs > 0) & (jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    strong = filt & (bs == 4)
    normal = filt & (bs < 4)
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.where(normal, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(normal, jnp.clip(q0 - delta, 0, 255), q0)
    np0 = jnp.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, np0)
    nq0 = jnp.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, nq0)
    return np0, nq0


# ---------------------------------------------------------------------------
# whole-frame deblock wavefront (shared by the decoder and the encoder's
# in-loop reconstruction)
# ---------------------------------------------------------------------------
WPAD = 8  # working-plane margin the padded planes must carry

# planes larger than this stay on the lax.scan path (the Pallas kernel
# keeps all three working planes resident in VMEM)
_PALLAS_VMEM_BUDGET = 10 * 1024 * 1024


def _edge_params(mb_w, mb_h, cls, qp, nnz, mv, ref_idx, slice_id,
                 deblock_idc, alpha_off, beta_off, transform8,
                 chroma_qp_offset):
    """Per-MB, per-edge filter parameters, fully batched.

    Returns dict of planes: bs_v/bs_h [n,4,16] (transform-8x8 masking
    already applied), alpha/beta [n,4] and tc0 [n,4,16] per direction,
    chroma alpha/beta [n,2] + tc0 [n,2,8] per direction, chroma bs
    [n,2,8] per direction. Everything downstream is pure filtering.
    """
    n = mb_w * mb_h
    bs_v, bs_h = compute_bs(mb_w, mb_h, cls, nnz, mv, ref_idx, slice_id,
                            deblock_idc.astype(jnp.int32))
    qps = jnp.where(cls == 8, 0, qp)
    aoff = alpha_off.astype(jnp.int32)
    boff = beta_off.astype(jnp.int32)
    t8f = (transform8 != 0)[:, None]
    coff = chroma_qp_offset

    # neighbor QP via grid shifts (no index gathers; border lanes are
    # junk but their edges carry bS 0 from compute_bs)
    qg = qps.reshape(mb_h, mb_w)
    qp_left = jnp.roll(qg, 1, 1).reshape(n)
    qp_top = jnp.roll(qg, 1, 0).reshape(n)
    # interior-edge mask for transform-8x8 MBs (edges 1 and 3 off)
    kmask = jnp.asarray([False, True, False, True])
    bs_v = jnp.where(t8f[:, :, None] & kmask[None, :, None], 0, bs_v)
    bs_h = jnp.where(t8f[:, :, None] & kmask[None, :, None], 0, bs_h)

    alpha_t = jnp.asarray(ALPHA)
    beta_t = jnp.asarray(BETA)
    tc0_t = jnp.asarray(TC0)
    cqp_t = jnp.asarray(CHROMA_QP)
    # tc0 lookup flattened to one small-table take (a two-axis fancy
    # gather is a scalar gather on TPU)
    tc0_flat = jnp.asarray(TC0.reshape(-1))

    def luma_dir(qp_nbr):
        edge0 = (qp_nbr + qps + 1) >> 1                    # [n]
        qpa = jnp.concatenate(
            [edge0[:, None], jnp.broadcast_to(qps[:, None], (n, 3))], 1)
        ia = jnp.clip(qpa + aoff[:, None], 0, 51)
        ib = jnp.clip(qpa + boff[:, None], 0, 51)
        return jnp.take(alpha_t, ia), jnp.take(beta_t, ib), ia

    def chroma_dir(qp_nbr):
        qcp = jnp.take(cqp_t, jnp.clip(
            jnp.stack([qp_nbr, qps], 1) + coff, 0, 51))    # [n,2]
        qcq = jnp.take(cqp_t, jnp.clip(qps + coff, 0, 51))[:, None]
        qpa = (qcp + qcq + 1) >> 1
        ia = jnp.clip(qpa + aoff[:, None], 0, 51)
        ib = jnp.clip(qpa + boff[:, None], 0, 51)
        return jnp.take(alpha_t, ia), jnp.take(beta_t, ib), ia

    p = {"bs_v": bs_v, "bs_h": bs_h}
    for d, qp_nbr, bs in (("v", qp_left, bs_v), ("h", qp_top, bs_h)):
        al, be, ia = luma_dir(qp_nbr)
        p["alpha_" + d] = al
        p["beta_" + d] = be
        p["tc0_" + d] = jnp.take(
            tc0_flat, ia[:, :, None] * 3 + jnp.clip(bs, 1, 3) - 1)
        bs_c = bs[:, ::2, ::2]                             # [n,2,8]
        alc, bec, iac = chroma_dir(qp_nbr)
        p["bs_c" + d] = bs_c
        p["alpha_c" + d] = alc
        p["beta_c" + d] = bec
        p["tc0_c" + d] = jnp.take(
            tc0_flat, iac[:, :, None] * 3 + jnp.clip(bs_c, 1, 3) - 1)
    return p


def _filter_mb_luma(Yl, bs_v, bs_h, a_v, b_v, tc_v, a_h, b_h, tc_h):
    """Filter one MB's 4 vertical then 4 horizontal luma edges over a
    [..., 24, 24] local window (leading dims broadcast). The spec's
    sequential edge order (8.7: later edges consume already-filtered
    samples) is preserved; only the lanes are batched."""
    for k in range(4):
        ex = 8 + 4 * k
        pc = jnp.stack([Yl[..., 8:24, ex - 1 - i] for i in range(4)])
        qc = jnp.stack([Yl[..., 8:24, ex + i] for i in range(4)])
        (p0, p1, p2), (q0, q1, q2) = filter_luma(
            pc, qc, bs_v[..., k, :], a_v[..., k, None], b_v[..., k, None],
            tc_v[..., k, :])
        Yl = Yl.at[..., 8:24, ex - 1].set(p0) \
               .at[..., 8:24, ex - 2].set(p1) \
               .at[..., 8:24, ex - 3].set(p2) \
               .at[..., 8:24, ex].set(q0) \
               .at[..., 8:24, ex + 1].set(q1) \
               .at[..., 8:24, ex + 2].set(q2)
    for k in range(4):
        ey = 8 + 4 * k
        pr = jnp.stack([Yl[..., ey - 1 - i, 8:24] for i in range(4)])
        qr = jnp.stack([Yl[..., ey + i, 8:24] for i in range(4)])
        (p0, p1, p2), (q0, q1, q2) = filter_luma(
            pr, qr, bs_h[..., k, :], a_h[..., k, None], b_h[..., k, None],
            tc_h[..., k, :])
        Yl = Yl.at[..., ey - 1, 8:24].set(p0) \
               .at[..., ey - 2, 8:24].set(p1) \
               .at[..., ey - 3, 8:24].set(p2) \
               .at[..., ey, 8:24].set(q0) \
               .at[..., ey + 1, 8:24].set(q1) \
               .at[..., ey + 2, 8:24].set(q2)
    return Yl


def _filter_mb_chroma(Cl, bs_cv, bs_ch, a_cv, b_cv, tc_cv, a_ch, b_ch,
                      tc_ch):
    """Filter one chroma plane's 2+2 edges over a [..., 16, 16] window."""
    for j in range(2):
        ex = 8 + 4 * j
        pc = jnp.stack([Cl[..., 8:16, ex - 1 - i] for i in range(2)])
        qc = jnp.stack([Cl[..., 8:16, ex + i] for i in range(2)])
        p0, q0 = filter_chroma(pc, qc, bs_cv[..., j, :],
                               a_cv[..., j, None], b_cv[..., j, None],
                               tc_cv[..., j, :])
        Cl = Cl.at[..., 8:16, ex - 1].set(p0).at[..., 8:16, ex].set(q0)
    for j in range(2):
        ey = 8 + 4 * j
        pr = jnp.stack([Cl[..., ey - 1 - i, 8:16] for i in range(2)])
        qr = jnp.stack([Cl[..., ey + i, 8:16] for i in range(2)])
        p0, q0 = filter_chroma(pr, qr, bs_ch[..., j, :],
                               a_ch[..., j, None], b_ch[..., j, None],
                               tc_ch[..., j, :])
        Cl = Cl.at[..., ey - 1, 8:16].set(p0).at[..., ey, 8:16].set(q0)
    return Cl


_LUMA_KEYS = ("bs_v", "bs_h", "alpha_v", "beta_v", "tc0_v", "alpha_h",
              "beta_h", "tc0_h")
_CHROMA_KEYS = ("bs_cv", "bs_ch", "alpha_cv", "beta_cv", "tc0_cv",
                "alpha_ch", "beta_ch", "tc0_ch")


@functools.lru_cache(maxsize=None)
def _deblock_diagonals(mb_w, mb_h):
    """Slope-2 wavefront schedule (2*row + col = const). The loop filter
    DOES depend on the ABOVE-RIGHT MB: an MB's horizontal edge 0 filters
    the bottom rows of the MB above at columns 13-15, which that MB's
    right neighbor's vertical edge 0 modified — so slope 1 would race.
    Slope-2 diagonal members' 24x24 windows are provably disjoint."""
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


def deblock_frame(mb_w, mb_h, Yw, Uw, Vw, cls, qp, nnz, mv, ref_idx,
                  slice_id, deblock_idc, alpha_off, beta_off, transform8,
                  chroma_qp_offset):
    """Filter one frame in place over the slope-1 MB wavefront.

    Yw/Uw/Vw: int32 working planes padded by WPAD on every side. cls/qp/
    nnz/mv/ref_idx/slice_id/deblock_idc/alpha_off/beta_off/transform8 are
    the per-MB symbol planes (decoder layout); chroma_qp_offset is the
    PPS scalar. Returns filtered planes.

    Reference: the serial per-MB loop WelsDeblockingFilterSlice /
    WelsDeblockingMb (decoder/core/src/deblocking.cpp:815-872).
    """
    n = mb_w * mb_h
    diags = jnp.asarray(_deblock_diagonals(mb_w, mb_h))
    p = _edge_params(mb_w, mb_h, cls, qp, nnz, mv, ref_idx, slice_id,
                     deblock_idc, alpha_off, beta_off, transform8,
                     chroma_qp_offset)

    # impl selection (PIP_DEBLOCK): "auto" = the vectorized scan (pure
    # XLA, runs everywhere, element-exact vs the serial oracle on both
    # CPU and TPU). "pallas" forces the Mosaic whole-wavefront kernel:
    # re-validated element-exact on TPU at 9x4 / 12x7 / 22x18 / 45x30 /
    # 80x45 MBs x multiple seeds (the round-2 sparse-mismatch quarantine
    # no longer reproduces after the toolchain update), but measured
    # SLOWER than the scan at 720p (29.4 vs 22.7 ms — its per-diagonal
    # window gathers run in a serial fori_loop while the scan's are one
    # batched gather), so the scan stays the auto choice on speed, not
    # correctness. "scan" / "legacy" force those paths.
    import os
    impl = os.environ.get("PIP_DEBLOCK", "auto")
    plane_bytes = 4 * sum(
        a.shape[0] * ((-(-a.shape[1] // 128)) * 128 + 128)
        for a in (Yw, Uw, Vw))  # kernel pads widths for aligned strips
    if impl == "auto":
        impl = "scan"
    if impl == "scan":
        from . import deblock_scan as _ds
        return _ds.deblock_wavefront_scan(mb_w, mb_h, Yw, Uw, Vw, p)
    if impl == "pallas" and _pallas_ok() \
            and plane_bytes <= _PALLAS_VMEM_BUDGET:
        from . import deblock_pallas as _dp
        return _dp.deblock_wavefront(mb_w, mb_h, Yw, Uw, Vw, p, diags)

    def deblock_diag(carry, mb_list):
        Yw, Uw, Vw = carry
        mb_c = jnp.clip(mb_list, 0, n - 1)

        def compute(mb):
            y0 = (mb // mb_w) * 16 + WPAD - 8
            x0 = (mb % mb_w) * 16 + WPAD - 8
            Yl = jax.lax.dynamic_slice(Yw, (y0, x0), (24, 24))
            cy = (mb // mb_w) * 8 + WPAD - 8
            cx = (mb % mb_w) * 8 + WPAD - 8
            Ul = jax.lax.dynamic_slice(Uw, (cy, cx), (16, 16))
            Vl = jax.lax.dynamic_slice(Vw, (cy, cx), (16, 16))
            return Yl, Ul, Vl, y0, x0, cy, cx

        Yl, Ul, Vl, y0s, x0s, cys, cxs = jax.vmap(compute)(mb_c)
        lp = [p[k][mb_c] for k in _LUMA_KEYS]
        cp = [p[k][mb_c] for k in _CHROMA_KEYS]
        # lanes-batched filtering: leading dim = diagonal members
        Yl = _filter_mb_luma(Yl, *lp)
        Ul = _filter_mb_chroma(Ul, *cp)
        Vl = _filter_mb_chroma(Vl, *cp)

        do = mb_list >= 0
        Yw = scatter_tiles(Yw, Yl, y0s, x0s, do)
        Uw = scatter_tiles(Uw, Ul, cys, cxs, do)
        Vw = scatter_tiles(Vw, Vl, cys, cxs, do)
        return (Yw, Uw, Vw), 0

    (Yw, Uw, Vw), _ = jax.lax.scan(deblock_diag, (Yw, Uw, Vw), diags)
    return Yw, Uw, Vw


def _pallas_ok():
    """Pallas TPU kernels only on a real TPU backend.

    PIP_FORCE_LAX_DEBLOCK=1 forces the lax path regardless — needed when
    tracing for a CPU device mesh while a TPU backend is also loaded
    (multi-chip dryrun on virtual host devices)."""
    import os
    if os.environ.get("PIP_FORCE_LAX_DEBLOCK"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
