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
    mbi = jnp.arange(n)
    bs_v, bs_h = compute_bs(mb_w, mb_h, cls, nnz, mv, ref_idx, slice_id,
                            deblock_idc.astype(jnp.int32))
    qps = jnp.where(cls == 8, 0, qp)
    aoff = alpha_off.astype(jnp.int32)
    boff = beta_off.astype(jnp.int32)
    t8f = (transform8 != 0)[:, None]
    coff = chroma_qp_offset

    left_mb = jnp.clip(mbi - 1, 0, n - 1)
    top_mb = jnp.clip(mbi - mb_w, 0, n - 1)
    # interior-edge mask for transform-8x8 MBs (edges 1 and 3 off)
    kmask = jnp.asarray([False, True, False, True])
    bs_v = jnp.where(t8f[:, :, None] & kmask[None, :, None], 0, bs_v)
    bs_h = jnp.where(t8f[:, :, None] & kmask[None, :, None], 0, bs_h)

    alpha_t = jnp.asarray(ALPHA)
    beta_t = jnp.asarray(BETA)
    tc0_t = jnp.asarray(TC0)
    cqp_t = jnp.asarray(CHROMA_QP)

    def luma_dir(nbr):
        pmb = jnp.stack([nbr, mbi, mbi, mbi], axis=1)      # [n,4]
        qpa = (qps[pmb] + qps[:, None] + 1) >> 1
        ia = jnp.clip(qpa + aoff[:, None], 0, 51)
        ib = jnp.clip(qpa + boff[:, None], 0, 51)
        return alpha_t[ia], beta_t[ib], ia

    def chroma_dir(nbr):
        pmb = jnp.stack([nbr, mbi], axis=1)                # [n,2]
        qcp = cqp_t[jnp.clip(qps[pmb] + coff, 0, 51)]
        qcq = cqp_t[jnp.clip(qps[:, None] + coff, 0, 51)]
        qpa = (qcp + qcq + 1) >> 1
        ia = jnp.clip(qpa + aoff[:, None], 0, 51)
        ib = jnp.clip(qpa + boff[:, None], 0, 51)
        return alpha_t[ia], beta_t[ib], ia

    p = {"bs_v": bs_v, "bs_h": bs_h}
    for d, nbr, bs in (("v", left_mb, bs_v), ("h", top_mb, bs_h)):
        al, be, ia = luma_dir(nbr)
        p["alpha_" + d] = al
        p["beta_" + d] = be
        p["tc0_" + d] = tc0_t[ia[:, :, None], jnp.clip(bs, 1, 3) - 1]
        bs_c = bs[:, ::2, ::2]                             # [n,2,8]
        alc, bec, iac = chroma_dir(nbr)
        p["bs_c" + d] = bs_c
        p["alpha_c" + d] = alc
        p["beta_c" + d] = bec
        p["tc0_c" + d] = tc0_t[iac[:, :, None], jnp.clip(bs_c, 1, 3) - 1]
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
    # CPU and TPU, and measured at parity with the Pallas kernel on TPU
    # at 720p: 40.1 vs 39.5 ms). "pallas" forces the Mosaic wavefront
    # kernel — QUARANTINED from auto: it produces sparse 1-80 px
    # mismatches vs the oracle on TPU (size-dependent; smallest repro
    # 9x4 MBs) with no measured speed advantage. "scan" / "legacy"
    # force those paths.
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
