"""Baseline H.264 encoder (round 1: all-intra I16x16/I4x4, fixed QP).

Analysis side (mode decision, forward transform, quantization) here —
numpy now, batched JAX kernels as they land in ops/ — with entropy/NAL
assembly in the native layer (pip_encode_frame), reusing the exact CAVLC
writer the recompression recode path uses.

Reference parity (behavior, partial): codec/encoder/core encode pipeline
(encode_mb_aux.cpp forward DCT/quant, md.cpp intra MD, au_set.cpp +
svc_encode_slice.cpp NAL/slice framing). ME/inter/rate-control follow in
later rounds (SURVEY.md §7 step 8).
"""
from __future__ import annotations

import ctypes

import numpy as np

from . import decoder_np as dn
from . import native

# quant multiplier table MF[qp%6][class] (class as in dn._POS4)
_MF = np.array([
    [13107, 5243, 8066],
    [11916, 4660, 7490],
    [10082, 4194, 6554],
    [9362, 3647, 5825],
    [8192, 3355, 5243],
    [7282, 2893, 4559],
], np.int64)
_ZZ4 = dn._ZZ4


def fdct4x4(block):
    """Forward 4x4 core transform. block: [4,4] int."""
    C = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
                 np.int64)
    return C @ block.astype(np.int64) @ C.T


def quant4x4(W, qp, intra=True, skip_dc=False):
    """Quantize transformed block; returns [4,4] levels."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3 if intra else (1 << qbits) // 6
    mf = _MF[qp % 6][dn._POS4]
    Z = (np.abs(W) * mf + f) >> qbits
    Z = np.sign(W) * Z
    if skip_dc:
        Z[0, 0] = 0
    return Z.astype(np.int64)


def quant_dc4(Yd, qp):
    """Quantize the Hadamard-transformed I16 luma DC [4,4]."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf = int(_MF[qp % 6][0])
    Z = (np.abs(Yd) * mf + 2 * f) >> (qbits + 1)
    return (np.sign(Yd) * Z).astype(np.int64)


def quant_dc2(Yd, qpc):
    qbits = 15 + qpc // 6
    f = (1 << qbits) // 3
    mf = int(_MF[qpc % 6][0])
    Z = (np.abs(Yd) * mf + 2 * f) >> (qbits + 1)
    return (np.sign(Yd) * Z).astype(np.int64)


def fhadamard4(X):
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
                 np.int64)
    return (H @ X.astype(np.int64) @ H) // 2


def _zz(block4):
    return block4.reshape(16)[_ZZ4]


def _i16_mb(Y, recY, mbi, mb_w, qp, w4, i16_mode, luma_dc, luma_ac):
    """Encode one I16x16 luma MB in place (mode decision + quant + recon)."""
    my, mx = divmod(mbi, mb_w)
    y0, x0 = my * 16, mx * 16
    availL = mx > 0
    availT = my > 0
    src = Y[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
    left = recY[y0:y0 + 16, x0 - 1].astype(np.int32) if availL else None
    top = recY[y0 - 1, x0:x0 + 16].astype(np.int32) if availT else None
    tl = int(recY[y0 - 1, x0 - 1]) if (availL and availT) else 0

    # --- I16 luma mode decision (legal modes only) ---
    cands = []
    if availT:
        cands.append((0, np.tile(top, (16, 1))))
    if availL:
        cands.append((1, np.tile(left[:, None], (1, 16))))
    if availL and availT:
        dc = (int(left.sum()) + int(top.sum()) + 16) >> 5
    elif availL:
        dc = (int(left.sum()) + 8) >> 4
    elif availT:
        dc = (int(top.sum()) + 8) >> 4
    else:
        dc = 128
    cands.append((2, np.full((16, 16), dc, np.int32)))
    if availL and availT:
        cands.append((3, dn._plane_pred(left, top, tl, 16, 0)))
    mode, pred = min(cands, key=lambda c: np.abs(src - c[1]).sum())
    i16_mode[mbi] = mode

    # --- transform + quant ---
    resid = src - pred
    Wdc = np.zeros((4, 4), np.int64)
    qac = np.zeros((16, 16), np.int64)
    for b in range(16):
        by, bx = divmod(b, 4)
        W = fdct4x4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
        Wdc[by, bx] = W[0, 0]
        Z = quant4x4(W, qp, intra=True, skip_dc=True)
        qac[b] = _zz(Z)
    Yd = fhadamard4(Wdc)
    qdc = quant_dc4(Yd, qp)
    luma_dc[mbi] = _zz(qdc)
    luma_ac[mbi] = qac

    # --- reconstruct (exactly as the decoder will) ---
    dct = dn.hadamard4x4(qdc)
    dcd = dn.luma_dc_dequant(dct, qp, w4)
    rec = np.zeros((16, 16), np.int64)
    for b in range(16):
        by, bx = divmod(b, 4)
        blk = np.zeros(16, np.int64)
        blk[_ZZ4] = qac[b]
        blk = dn.dequant4(blk.reshape(4, 4), qp, w4)
        blk[0, 0] = dcd[by, bx]
        rec[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = dn.idct4x4(blk)
    recY[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + rec, 0, 255)


def _chroma_intra_mb(U, V, recU, recV, mbi, mb_w, qpc, w4, chroma_dc,
                     chroma_ac):
    """Encode one intra-chroma MB (DC mode), updating recon in place."""
    my, mx = divmod(mbi, mb_w)
    availL = mx > 0
    availT = my > 0
    cy0, cx0 = my * 8, mx * 8
    for ci, (P, R) in enumerate(((U, recU), (V, recV))):
        csrc = P[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32)
        lft = R[cy0:cy0 + 8, cx0 - 1].astype(np.int32) if availL else None
        tp = R[cy0 - 1, cx0:cx0 + 8].astype(np.int32) if availT else None
        predc = np.zeros((8, 8), np.int32)
        for qy in range(2):
            for qx in range(2):
                ls = lft[qy * 4:qy * 4 + 4] if availL else None
                ts = tp[qx * 4:qx * 4 + 4] if availT else None
                if (qy, qx) in ((0, 0), (1, 1)):
                    if availL and availT:
                        d = (int(ls.sum()) + int(ts.sum()) + 4) >> 3
                    elif availT:
                        d = (int(ts.sum()) + 2) >> 2
                    elif availL:
                        d = (int(ls.sum()) + 2) >> 2
                    else:
                        d = 128
                elif (qy, qx) == (0, 1):
                    d = ((int(ts.sum()) + 2) >> 2) if availT else (
                        ((int(ls.sum()) + 2) >> 2) if availL else 128)
                else:
                    d = ((int(ls.sum()) + 2) >> 2) if availL else (
                        ((int(ts.sum()) + 2) >> 2) if availT else 128)
                predc[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = d
        _chroma_block(csrc, predc, R, cy0, cx0, mbi, ci, qpc, w4, chroma_dc,
                      chroma_ac, intra=True)


def _chroma_block(csrc, predc, R, cy0, cx0, mbi, ci, qpc, w4, chroma_dc,
                  chroma_ac, intra):
    """Transform+quant+recon one 8x8 chroma block against `predc`."""
    residc = csrc - predc
    Wd2 = np.zeros((2, 2), np.int64)
    qacs = np.zeros((4, 16), np.int64)
    for b in range(4):
        by, bx = divmod(b, 2)
        W = fdct4x4(residc[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
        Wd2[by, bx] = W[0, 0]
        qacs[b] = _zz(quant4x4(W, qpc, intra=intra, skip_dc=True))
    a, b_, c, d_ = (int(Wd2[0, 0]), int(Wd2[0, 1]), int(Wd2[1, 0]),
                    int(Wd2[1, 1]))
    Yd2 = np.array([[a + b_ + c + d_, a - b_ + c - d_],
                    [a + b_ - c - d_, a - b_ - c + d_]], np.int64)
    qd2 = quant_dc2(Yd2, qpc)
    chroma_dc[mbi, ci] = qd2.reshape(4)
    chroma_ac[mbi, ci * 4:(ci + 1) * 4] = qacs
    # recon
    aa, bb, cc, dd = (int(qd2[0, 0]), int(qd2[0, 1]),
                      int(qd2[1, 0]), int(qd2[1, 1]))
    ht = np.array([[aa + bb + cc + dd, aa - bb + cc - dd],
                   [aa + bb - cc - dd, aa - bb - cc + dd]], np.int64)
    dcd2 = dn.chroma_dc_dequant(ht, qpc, w4)
    recc = np.zeros((8, 8), np.int64)
    for b in range(4):
        by, bx = divmod(b, 2)
        blk = np.zeros(16, np.int64)
        blk[_ZZ4] = qacs[b]
        blk = dn.dequant4(blk.reshape(4, 4), qpc, w4)
        blk[0, 0] = dcd2[by, bx]
        recc[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = dn.idct4x4(blk)
    R[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(predc + recc, 0, 255)


def _cfg_lib():
    lib = native.load()
    if not hasattr(lib.pip_encode_frame, "_cfg"):
        lib.pip_encode_frame.restype = ctypes.c_int
        lib.pip_encode_frame.argtypes = [ctypes.c_int] * 6 + \
            [ctypes.c_void_p] * 11 + [ctypes.c_int] * 11 + \
            [ctypes.c_void_p, ctypes.c_int, ctypes.c_int] + \
            [ctypes.c_void_p] * 4 + \
            [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
             ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
             ctypes.c_size_t]
        lib.pip_encode_mv_preds.restype = ctypes.c_int
        lib.pip_encode_mv_preds.argtypes = [ctypes.c_int] * 3 + \
            [ctypes.c_void_p] * 7 + [ctypes.c_char_p, ctypes.c_size_t]
        lib.pip_encode_frame._cfg = True
    return lib


class IntraEncoder:
    """All-intra fixed-QP encoder producing Annex-B .264."""

    def __init__(self, width, height, qp=28):
        assert width % 16 == 0 and height % 16 == 0, "pad input to MB size"
        self.mb_w = width // 16
        self.mb_h = height // 16
        self.qp = qp
        self.frame_idx = 0
        self._w4 = dn._weights4(dn._FLAT4)
        self._lib = _cfg_lib()

    def encode_frame(self, Y, U, V):
        """Encode one frame; returns Annex-B bytes (SPS/PPS on first)."""
        mw, mh, qp = self.mb_w, self.mb_h, self.qp
        n = mw * mh
        qpc = int(dn.CHROMA_QP[qp])
        recY = np.zeros((mh * 16, mw * 16), np.uint8)
        recU = np.zeros((mh * 8, mw * 8), np.uint8)
        recV = np.zeros((mh * 8, mw * 8), np.uint8)

        mb_class = np.ones(n, np.uint8)  # all I16
        mv = np.zeros((n, 2), np.int16)
        i16_mode = np.zeros(n, np.uint8)
        chroma_mode = np.zeros(n, np.uint8)
        i4_modes = np.full((n, 16), 2, np.int8)
        luma_dc = np.zeros((n, 16), np.int16)
        luma_ac = np.zeros((n, 16, 16), np.int16)
        chroma_dc = np.zeros((n, 2, 4), np.int16)
        chroma_ac = np.zeros((n, 8, 16), np.int16)

        for mbi in range(n):
            _i16_mb(Y, recY, mbi, mw, qp, self._w4, i16_mode, luma_dc, luma_ac)
            _chroma_intra_mb(U, V, recU, recV, mbi, mw, qpc, self._w4,
                             chroma_dc, chroma_ac)

        data = _write_frame(self._lib, mw, mh, qp, self.frame_idx,
                            slice_type=1, mb_class=mb_class, mv=mv,
                            i16_mode=i16_mode, chroma_mode=chroma_mode,
                            i4_modes=i4_modes, luma_dc=luma_dc,
                            luma_ac=luma_ac, chroma_dc=chroma_dc,
                            chroma_ac=chroma_ac,
                            include_params=self.frame_idx == 0)
        self.frame_idx += 1
        self._recon = (recY, recU, recV)
        return data


def _write_frame(lib, mw, mh, qp, frame_idx, slice_type, mb_class, mv,
                 i16_mode, chroma_mode, i4_modes, luma_dc, luma_ac,
                 chroma_dc, chroma_ac, include_params, mb_qp=None,
                 cabac=False, n_slices=1, mv8=None, deblock_idc=1,
                 out_qp=None, crop_r=0, crop_b=0, is_ref=True,
                 frame_num=None, idr_id=0, ltr_flags=0, n_refs=1,
                 ref_plane=None, sps_refs=0, rplr_diff=0,
                 mmco_drops=None, param_id=0, row_slice=None,
                 out_row_bits=None):
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_size_t()
    err = ctypes.create_string_buffer(512)
    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    mv16 = np.ascontiguousarray(mv, np.int16)
    luma_ac16 = np.ascontiguousarray(luma_ac, np.int16)
    chroma_ac16 = np.ascontiguousarray(chroma_ac, np.int16)
    luma_dc16 = np.ascontiguousarray(luma_dc, np.int16)
    chroma_dc16 = np.ascontiguousarray(chroma_dc, np.int16)
    if mb_qp is not None:
        mb_qp = np.ascontiguousarray(mb_qp, np.uint8)
    if mv8 is not None:
        mv8 = np.ascontiguousarray(mv8, np.int16)
    if ref_plane is not None:
        ref_plane = np.ascontiguousarray(ref_plane, np.int8)
    if frame_num is None:
        frame_num = frame_idx
    mmco_arr = (None if mmco_drops is None or not len(mmco_drops)
                else np.ascontiguousarray(mmco_drops, np.intc))
    if row_slice is not None:
        row_slice = np.ascontiguousarray(row_slice, np.intc)
    if out_row_bits is not None:
        assert out_row_bits.dtype == np.uint32 and out_row_bits.flags["C_CONTIGUOUS"]
    rc = lib.pip_encode_frame(
        mw, mh, qp, frame_num, idr_id & 1, slice_type,
        ptr(mb_class), ptr(mv16), ptr(i16_mode), ptr(chroma_mode),
        ptr(i4_modes), ptr(luma_dc16), ptr(luma_ac16), ptr(chroma_dc16),
        ptr(chroma_ac16), None if mb_qp is None else ptr(mb_qp),
        None if mv8 is None else ptr(mv8),
        1 if include_params else 0, 1 if cabac else 0, int(n_slices),
        int(deblock_idc), int(crop_r), int(crop_b), 1 if is_ref else 0,
        int(ltr_flags), int(n_refs), int(sps_refs), int(rplr_diff),
        None if mmco_arr is None else ptr(mmco_arr),
        0 if mmco_arr is None else len(mmco_arr), int(param_id),
        None if ref_plane is None else ptr(ref_plane),
        None if row_slice is None else ptr(row_slice),
        None if out_row_bits is None else ptr(out_row_bits),
        None if out_qp is None else ptr(out_qp),
        ctypes.byref(out), ctypes.byref(out_size), err, len(err))
    if rc != 0:
        raise RuntimeError(f"pip_encode_frame: {err.value.decode()}")
    try:
        return ctypes.string_at(out, out_size.value)
    finally:
        lib.pip_free(out)


class Encoder:
    """IPPP fixed-QP encoder: TPU-batched full-search ME (ops/me.py),
    P16x16 / P_Skip / I16 mode decision, CAVLC entropy via the native
    writer. Streams carry disable_deblocking_filter_idc=1 so the in-loop
    recon here matches any conformant decoder bit-exactly.

    Reference parity (behavior): codec/encoder/core encode pipeline —
    svc_motion_estimate.cpp (ME), svc_base_layer_md.cpp (P MD incl.
    skip detection), svc_encode_slice.cpp (skip-run slice framing).
    """

    ME_RADIUS = 16

    def __init__(self, width, height, qp=28, gop=0):
        assert width % 16 == 0 and height % 16 == 0, "pad input to MB size"
        self.width, self.height = width, height
        self.mb_w = width // 16
        self.mb_h = height // 16
        self.qp = qp
        self.gop = gop  # 0: single IDR then all P
        self.frame_idx = 0
        self.ref = None  # (Y,U,V) recon of the previous frame
        self._w4 = dn._weights4(dn._FLAT4)
        self._lib = _cfg_lib()
        self._intra = IntraEncoder(width, height, qp)

    def encode_frame(self, Y, U, V):
        if self.ref is None or (self.gop and self.frame_idx % self.gop == 0):
            self._intra.frame_idx = self.frame_idx
            data = self._intra.encode_frame(Y, U, V)
            self.ref = self._intra._recon
            self.frame_idx += 1
            return data
        data = self._encode_p(Y, U, V)
        self.frame_idx += 1
        return data

    def _mv_preds(self, mb_class, mv):
        n = self.mb_w * self.mb_h
        skip_pred = np.zeros((n, 2), np.int16)
        p16_pred = np.zeros((n, 2), np.int16)
        err = ctypes.create_string_buffer(512)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        mv16 = np.ascontiguousarray(mv, np.int16)
        rc = self._lib.pip_encode_mv_preds(
            self.mb_w, self.mb_h, 1, None, ptr(mb_class), ptr(mv16), None,
            None, ptr(skip_pred), ptr(p16_pred), err, len(err))
        if rc != 0:
            raise RuntimeError(f"pip_encode_mv_preds: {err.value.decode()}")
        return skip_pred, p16_pred

    def _encode_p(self, Y, U, V):
        from .ops import me as jme

        mw, mh, qp = self.mb_w, self.mb_h, self.qp
        n = mw * mh
        qpc = int(dn.CHROMA_QP[qp])
        R = self.ME_RADIUS
        refY, refU, refV = self.ref

        # ---- TPU motion search ----
        cur = Y.astype(np.int32).reshape(mh, 16, mw, 16).transpose(0, 2, 1, 3) \
            .reshape(n, 16, 16)
        ref_pad = np.pad(refY, R, mode="edge").astype(np.int32)
        ys = (np.arange(n) // mw * 16).astype(np.int32)
        xs = (np.arange(n) % mw * 16).astype(np.int32)
        dy, dx, best_sad, zero_sad = (np.asarray(a) for a in
                                      jme.full_search_sad(cur, ref_pad, ys,
                                                          xs, R))
        intra_cost = np.asarray(jme.intra_sad_proxy(cur))

        # ---- mode decisions (intra fallback first; final preds after) ----
        mb_class = np.full(n, 3, np.uint8)  # P16x16
        use_intra = best_sad > intra_cost + 2048
        mb_class[use_intra] = 1
        mv = np.zeros((n, 2), np.int16)
        mv[:, 0] = dx * 4
        mv[:, 1] = dy * 4
        mv[use_intra] = 0
        skip_pred, _ = self._mv_preds(mb_class, mv)

        recY = np.zeros_like(refY)
        recU = np.zeros_like(refU)
        recV = np.zeros_like(refV)
        PADC = R // 2 + 4
        refU_pad = np.pad(refU, PADC, mode="edge")
        refV_pad = np.pad(refV, PADC, mode="edge")

        i16_mode = np.zeros(n, np.uint8)
        chroma_mode = np.zeros(n, np.uint8)
        i4_modes = np.full((n, 16), 2, np.int8)
        luma_dc = np.zeros((n, 16), np.int16)
        luma_ac = np.zeros((n, 16, 16), np.int16)
        chroma_dc = np.zeros((n, 2, 4), np.int16)
        chroma_ac = np.zeros((n, 8, 16), np.int16)

        for mbi in range(n):
            my, mx = divmod(mbi, mw)
            y0, x0 = my * 16, mx * 16
            if mb_class[mbi] == 1:
                _i16_mb(Y, recY, mbi, mw, qp, self._w4, i16_mode, luma_dc,
                        luma_ac)
                _chroma_intra_mb(U, V, recU, recV, mbi, mw, qpc, self._w4,
                                 chroma_dc, chroma_ac)
                continue
            mvx, mvy = int(mv[mbi, 0]), int(mv[mbi, 1])
            # integer-pel luma prediction from padded reference
            py = y0 + (mvy >> 2)
            px = x0 + (mvx >> 2)
            pred = ref_pad[py + R:py + R + 16, px + R:px + R + 16]
            src = Y[y0:y0 + 16, x0:x0 + 16].astype(np.int32)
            resid = src - pred
            qac = np.zeros((16, 16), np.int64)
            rec = np.zeros((16, 16), np.int64)
            for b in range(16):
                by, bx = divmod(b, 4)
                W = fdct4x4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
                Z = quant4x4(W, qp, intra=False)
                qac[b] = _zz(Z)
                blk = np.zeros(16, np.int64)
                blk[_ZZ4] = qac[b]
                blk = dn.dequant4(blk.reshape(4, 4), qp, self._w4)
                rec[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = dn.idct4x4(blk)
            # chroma MC prediction (bilinear, decoder-exact)
            cy0, cx0 = y0 // 2, x0 // 2
            predu = dn.mc_chroma_block(refU_pad, PADC, cy0, cx0, mvx, mvy,
                                       8, 8)
            predv = dn.mc_chroma_block(refV_pad, PADC, cy0, cx0, mvx, mvy,
                                       8, 8)
            _chroma_block(U[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32), predu,
                          recU, cy0, cx0, mbi, 0, qpc, self._w4, chroma_dc,
                          chroma_ac, intra=False)
            _chroma_block(V[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int32), predv,
                          recV, cy0, cx0, mbi, 1, qpc, self._w4, chroma_dc,
                          chroma_ac, intra=False)
            luma_ac[mbi] = qac
            recY[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + rec, 0, 255)
            # P_Skip: predictor MV and an all-zero residual
            no_res = (not qac.any() and not chroma_dc[mbi].any()
                      and not chroma_ac[mbi].any())
            if (no_res and mvx == int(skip_pred[mbi, 0])
                    and mvy == int(skip_pred[mbi, 1])):
                mb_class[mbi] = 11
        data = _write_frame(self._lib, mw, mh, qp, self.frame_idx,
                            slice_type=0, mb_class=mb_class, mv=mv,
                            i16_mode=i16_mode, chroma_mode=chroma_mode,
                            i4_modes=i4_modes, luma_dc=luma_dc,
                            luma_ac=luma_ac, chroma_dc=chroma_dc,
                            chroma_ac=chroma_ac, include_params=False)
        self.ref = (recY, recU, recV)
        return data


def encode_yuv(frames, width, height, qp=28, inter=False, gop=0):
    """Encode a list of (Y,U,V) frames; returns Annex-B bytes."""
    enc = (Encoder(width, height, qp, gop=gop) if inter
           else IntraEncoder(width, height, qp))
    out = b""
    for (Y, U, V) in frames:
        out += enc.encode_frame(Y, U, V)
    return out
