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

import jax
import jax.numpy as jnp
import numpy as np

from .. import decoder_np as _dn
from .wavefront import scatter_tiles

ALPHA = jnp.asarray(_dn.ALPHA_TABLE)
BETA = jnp.asarray(_dn.BETA_TABLE)
TC0 = jnp.asarray(_dn.TC0_TABLE)
CHROMA_QP = jnp.asarray(_dn.CHROMA_QP)


# ---------------------------------------------------------------------------
# batched boundary strengths
# ---------------------------------------------------------------------------
def compute_bs(mb_w, mb_h, mb_class, nnz, mv, ref, slice_id, deblock_idc):
    """Returns (bs_v [n,4,16], bs_h [n,4,16]) int32 boundary strengths.

    nnz: [n,16] per-cell nonzero flags/counts; mv [n,16,2]; ref [n,16].
    Edges whose filtering is disabled get bS 0.
    """
    n = mb_w * mb_h
    intra = (mb_class == 0) | (mb_class == 1) | (mb_class == 2) | (mb_class == 8)

    cell_nz = nnz > 0

    def pair_bs(ip, cp, iq, cq, intra_p, intra_q, mb_edge):
        # ip/iq: [E] mb indices; cp/cq: [E] cell indices
        b_intra = jnp.where(mb_edge, 4, 3)
        nzp = cell_nz[ip, cp]
        nzq = cell_nz[iq, cq]
        rp = ref[ip, cp]
        rq = ref[iq, cq]
        mvp = mv[ip, cp].astype(jnp.int32)
        mvq = mv[iq, cq].astype(jnp.int32)
        mv_far = (jnp.abs(mvp[..., 0] - mvq[..., 0]) >= 4) | \
                 (jnp.abs(mvp[..., 1] - mvq[..., 1]) >= 4)
        b = jnp.where(nzp | nzq, 2, jnp.where((rp != rq) | mv_far, 1, 0))
        return jnp.where(intra_p | intra_q, b_intra, b)

    mbi = jnp.arange(n)
    mbx = mbi % mb_w
    mby = mbi // mb_w

    rows16 = jnp.arange(16)
    cy = rows16 // 4  # cell row for a given sample row

    bs_v = []
    for k in range(4):
        if k == 0:
            ip = mbi - 1
            valid = mbx > 0
            cp = cy * 4 + 3
        else:
            ip = mbi
            valid = jnp.full((n,), True)
            cp = cy * 4 + (k - 1)
        cq = cy * 4 + k
        ip_c = jnp.clip(ip, 0, n - 1)
        b = pair_bs(ip_c[:, None], cp[None, :], mbi[:, None], cq[None, :],
                    intra[ip_c][:, None], intra[:, None],
                    jnp.full((n, 16), k == 0))
        # disable: idc==1; k==0 crossing slice boundary with idc==2
        off = deblock_idc == 1
        if k == 0:
            cross = slice_id[ip_c] != slice_id
            off = off | ~valid | ((deblock_idc == 2) & cross)
        b = jnp.where(off[:, None], 0, b)
        bs_v.append(b)
    bs_h = []
    for k in range(4):
        if k == 0:
            ip = mbi - mb_w
            valid = mby > 0
            cp = 12 + rows16 // 4
        else:
            ip = mbi
            valid = jnp.full((n,), True)
            cp = (k - 1) * 4 + rows16 // 4
        cq = k * 4 + rows16 // 4
        ip_c = jnp.clip(ip, 0, n - 1)
        b = pair_bs(ip_c[:, None], cp[None, :], mbi[:, None], cq[None, :],
                    intra[ip_c][:, None], intra[:, None],
                    jnp.full((n, 16), k == 0))
        off = deblock_idc == 1
        if k == 0:
            cross = slice_id[ip_c] != slice_id
            off = off | ~valid | ((deblock_idc == 2) & cross)
        b = jnp.where(off[:, None], 0, b)
        bs_h.append(b)
    return jnp.stack(bs_v, 1), jnp.stack(bs_h, 1)


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


def deblock_frame(mb_w, mb_h, Yw, Uw, Vw, cls, qp, nnz, mv, ref_idx,
                  slice_id, deblock_idc, alpha_off, beta_off, transform8,
                  chroma_qp_offset, diags):
    """Filter one frame in place over the slope-2 MB wavefront.

    Yw/Uw/Vw: int32 working planes padded by WPAD on every side. cls/qp/
    nnz/mv/ref_idx/slice_id/deblock_idc/alpha_off/beta_off/transform8 are
    the per-MB symbol planes (decoder layout); chroma_qp_offset is the
    PPS scalar; diags the _diagonals() schedule. Returns filtered planes.

    Reference: the serial per-MB loop WelsDeblockingFilterSlice /
    WelsDeblockingMb (decoder/core/src/deblocking.cpp:815-872).
    """
    n = mb_w * mb_h
    mbi = jnp.arange(n)
    bs_v, bs_h = compute_bs(mb_w, mb_h, cls, nnz, mv, ref_idx, slice_id,
                            deblock_idc.astype(jnp.int32))
    qps = jnp.where(cls == 8, 0, qp)
    aoff = alpha_off.astype(jnp.int32)
    boff = beta_off.astype(jnp.int32)
    t8f = transform8 != 0
    coff = chroma_qp_offset

    left_mb = jnp.clip(mbi - 1, 0, n - 1)
    top_mb = jnp.clip(mbi - mb_w, 0, n - 1)

    def mb_deblock(Yl, Ul, Vl, mb):
        """Yl [24,24] / Ul,Vl [16,16] local windows with the MB interior
        starting at (8,8); filters the MB's 8 luma + 4+4 chroma edges."""
        # luma vertical edges
        for k in range(4):
            pmb = jnp.where(k == 0, left_mb[mb], mb)
            qpa = (qps[pmb] + qps[mb] + 1) >> 1
            ia = jnp.clip(qpa + aoff[mb], 0, 51)
            ib = jnp.clip(qpa + boff[mb], 0, 51)
            bs = bs_v[mb, k]
            if k in (1, 3):
                bs = jnp.where(t8f[mb], 0, bs)
            ex = 8 + 4 * k  # local x of edge (MB starts at local 8)
            pcols = jnp.stack([Yl[8:24, ex - 1 - i] for i in range(4)])
            qcols = jnp.stack([Yl[8:24, ex + i] for i in range(4)])
            tc0 = TC0[ia][jnp.clip(bs, 1, 3) - 1]
            (p0, p1, p2), (q0, q1, q2) = filter_luma(
                pcols, qcols, bs, ALPHA[ia], BETA[ib], tc0)
            Yl = Yl.at[8:24, ex - 1].set(p0).at[8:24, ex - 2].set(p1) \
                 .at[8:24, ex - 3].set(p2).at[8:24, ex].set(q0) \
                 .at[8:24, ex + 1].set(q1).at[8:24, ex + 2].set(q2)
        # luma horizontal edges
        for k in range(4):
            pmb = jnp.where(k == 0, top_mb[mb], mb)
            qpa = (qps[pmb] + qps[mb] + 1) >> 1
            ia = jnp.clip(qpa + aoff[mb], 0, 51)
            ib = jnp.clip(qpa + boff[mb], 0, 51)
            bs = bs_h[mb, k]
            if k in (1, 3):
                bs = jnp.where(t8f[mb], 0, bs)
            ey = 8 + 4 * k
            prow = jnp.stack([Yl[ey - 1 - i, 8:24] for i in range(4)])
            qrow = jnp.stack([Yl[ey + i, 8:24] for i in range(4)])
            tc0 = TC0[ia][jnp.clip(bs, 1, 3) - 1]
            (p0, p1, p2), (q0, q1, q2) = filter_luma(
                prow, qrow, bs, ALPHA[ia], BETA[ib], tc0)
            Yl = Yl.at[ey - 1, 8:24].set(p0).at[ey - 2, 8:24].set(p1) \
                 .at[ey - 3, 8:24].set(p2).at[ey, 8:24].set(q0) \
                 .at[ey + 1, 8:24].set(q1).at[ey + 2, 8:24].set(q2)
        # chroma edges (k 0 and 2 of luma -> chroma 0 and 4)
        for k in (0, 2):
            pmb = jnp.where(k == 0, left_mb[mb], mb)
            qcp = CHROMA_QP[jnp.clip(qps[pmb] + coff, 0, 51)]
            qcq = CHROMA_QP[jnp.clip(qps[mb] + coff, 0, 51)]
            qpa = (qcp + qcq + 1) >> 1
            ia = jnp.clip(qpa + aoff[mb], 0, 51)
            ib = jnp.clip(qpa + boff[mb], 0, 51)
            bs = bs_v[mb, k][::2]
            ex = 8 + 2 * k
            pc = jnp.stack([Ul[8:16, ex - 1 - i] for i in range(2)])
            qc = jnp.stack([Ul[8:16, ex + i] for i in range(2)])
            tc0 = TC0[ia][jnp.clip(bs, 1, 3) - 1]
            p0, q0 = filter_chroma(pc, qc, bs, ALPHA[ia], BETA[ib], tc0)
            Ul = Ul.at[8:16, ex - 1].set(p0).at[8:16, ex].set(q0)
            pc = jnp.stack([Vl[8:16, ex - 1 - i] for i in range(2)])
            qc = jnp.stack([Vl[8:16, ex + i] for i in range(2)])
            p0, q0 = filter_chroma(pc, qc, bs, ALPHA[ia], BETA[ib], tc0)
            Vl = Vl.at[8:16, ex - 1].set(p0).at[8:16, ex].set(q0)
        for k in (0, 2):
            pmb = jnp.where(k == 0, top_mb[mb], mb)
            qcp = CHROMA_QP[jnp.clip(qps[pmb] + coff, 0, 51)]
            qcq = CHROMA_QP[jnp.clip(qps[mb] + coff, 0, 51)]
            qpa = (qcp + qcq + 1) >> 1
            ia = jnp.clip(qpa + aoff[mb], 0, 51)
            ib = jnp.clip(qpa + boff[mb], 0, 51)
            bs = bs_h[mb, k][::2]
            ey = 8 + 2 * k
            pc = jnp.stack([Ul[ey - 1 - i, 8:16] for i in range(2)])
            qc = jnp.stack([Ul[ey + i, 8:16] for i in range(2)])
            tc0 = TC0[ia][jnp.clip(bs, 1, 3) - 1]
            p0, q0 = filter_chroma(pc, qc, bs, ALPHA[ia], BETA[ib], tc0)
            Ul = Ul.at[ey - 1, 8:16].set(p0).at[ey, 8:16].set(q0)
            pc = jnp.stack([Vl[ey - 1 - i, 8:16] for i in range(2)])
            qc = jnp.stack([Vl[ey + i, 8:16] for i in range(2)])
            p0, q0 = filter_chroma(pc, qc, bs, ALPHA[ia], BETA[ib], tc0)
            Vl = Vl.at[ey - 1, 8:16].set(p0).at[ey, 8:16].set(q0)
        return Yl, Ul, Vl

    def deblock_diag(carry, mb_list):
        Yw, Uw, Vw = carry

        def compute(mb):
            mb_c = jnp.clip(mb, 0, n - 1)
            y0 = (mb_c // mb_w) * 16 + WPAD - 8
            x0 = (mb_c % mb_w) * 16 + WPAD - 8
            Yl = jax.lax.dynamic_slice(Yw, (y0, x0), (24, 24))
            cy = (mb_c // mb_w) * 8 + WPAD - 8
            cx = (mb_c % mb_w) * 8 + WPAD - 8
            Ul = jax.lax.dynamic_slice(Uw, (cy, cx), (16, 16))
            Vl = jax.lax.dynamic_slice(Vw, (cy, cx), (16, 16))
            Yl, Ul, Vl = mb_deblock(Yl, Ul, Vl, mb_c)
            return Yl, Ul, Vl, y0, x0, cy, cx

        Yls, Uls, Vls, y0s, x0s, cys, cxs = jax.vmap(compute)(mb_list)

        do = mb_list >= 0
        Yw = scatter_tiles(Yw, Yls, y0s, x0s, do)
        Uw = scatter_tiles(Uw, Uls, cys, cxs, do)
        Vw = scatter_tiles(Vw, Vls, cys, cxs, do)
        return (Yw, Uw, Vw), 0

    (Yw, Uw, Vw), _ = jax.lax.scan(deblock_diag, (Yw, Uw, Vw), diags)
    return Yw, Uw, Vw
