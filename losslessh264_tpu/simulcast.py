"""Spatial simulcast encoding: N dyadic resolution layers of the same
source, each an independent AVC stream with its own SPS/PPS id,
interleaved low-resolution-first inside every access unit.

This is the AVC-compatible spatial-scalability mode of the reference
encoder (SEncParamExt.sSpatialLayers, codec_app_def.h; layer setup in
encoder_ext.cpp WelsInitEncoderExt; the dyadic source pyramid comes
from the preprocess downsampler, wels_preprocess.cpp /
downsample/*.cpp). A receiver picks the layer it can handle by
filtering slices on pps_id; every layer decodes standalone.

The recompression engine keeps one FreqImage (temporal prior store)
per resolution (engine.cc WalkState::fi_pool), so an interleaved
simulcast stream keeps its PAST priors per layer and still
recompresses losslessly.
"""
from __future__ import annotations

import numpy as np

from .encoder_jax import JaxEncoder

# ---------------------------------------------------------------------------
# Per-MB inter-layer mode plane, carried as a standard SEI
# user_data_unregistered NAL (type 6, payload 5) prepended to each
# enhancement-layer AU. Any AVC decoder skips it; the recompression
# engine passes SEI through losslessly; SimulcastDecoder reads it.
# Bit 1 = residual mode (display = up(base) + pixel - 128), bit 0 =
# source mode (display = pixel). Reference analog: the per-MB
# inter-layer vs temporal mode decision of svc_mode_decision.cpp:1-684,
# re-transported AVC-compatibly instead of via Annex-G slice extensions.
# ---------------------------------------------------------------------------
_ILP_UUID = b"pip-ilp-mb-mask\x01"  # 16 bytes


def _ebsp_escape(b):
    out = bytearray()
    zeros = 0
    for byte in b:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def _ebsp_unescape(b):
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(b):
        if zeros >= 2 and b[i] == 3:
            zeros = 0
            i += 1
            continue
        out.append(b[i])
        zeros = zeros + 1 if b[i] == 0 else 0
        i += 1
    return bytes(out)


def _sei_mask_nal(mask_bits, au_idx):
    """SEI user_data_unregistered NAL carrying the packed per-MB mode
    plane (raster order, MSB-first per byte) for access unit au_idx.
    Emitted ONLY for AUs that are not all-residual (absent SEI =
    all-residual, the common case on correlated content), so the
    steady-state overhead is zero."""
    idx = bytearray()
    v = int(au_idx)
    while v >= 0x80:
        idx.append(0x80 | (v & 0x7f))
        v >>= 7
    idx.append(v)
    payload = (_ILP_UUID + bytes(idx)
               + np.packbits(mask_bits.astype(np.uint8)).tobytes())
    size = b""
    n = len(payload)
    while n >= 255:
        size += b"\xff"
        n -= 255
    size += bytes([n])
    body = bytes([5]) + size + payload + b"\x80"  # type 5 + rbsp stop
    return b"\x00\x00\x00\x01\x06" + _ebsp_escape(body)


def _split_ilp_seis(stream):
    """Extract our ILP-mask SEIs from an Annex-B stream: returns
    (stream_without_them, {au_idx: mask_bytes}). AUs without an entry
    are all-residual."""
    masks = {}
    out = bytearray()
    i = 0
    n = len(stream)
    spans = []
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        k = stream.find(b"\x00\x00\x01", j + 3)
        # back off trailing zeros that form the NEXT start code's prefix
        # (at most one for a 4-byte start code) — further zeros can
        # legally belong to this NAL (cabac_zero_words) and must stay
        end = n if k < 0 else k
        if k >= 0 and end > j + 3 and stream[end - 1] == 0:
            end -= 1
        spans.append((j, j + 3, end))
        if k < 0:
            break
        i = j + 3
    pos = 0
    for (sc, ps, pe) in spans:
        nal = stream[ps:pe]
        if len(nal) > 20 and (nal[0] & 0x1f) == 6:
            rbsp = _ebsp_unescape(nal[1:])
            # payload type 5, then size bytes, then UUID
            if rbsp[:1] == b"\x05":
                q = 1
                size = 0
                while q < len(rbsp) and rbsp[q] == 0xff:
                    size += 255
                    q += 1
                if q < len(rbsp):
                    size += rbsp[q]
                    q += 1
                if rbsp[q:q + 16] == _ILP_UUID:
                    body = rbsp[q + 16:q + size]
                    au_idx = 0
                    shift = 0
                    b = 0
                    while b < len(body):
                        au_idx |= (body[b] & 0x7f) << shift
                        shift += 7
                        b += 1
                        if not body[b - 1] & 0x80:
                            break
                    masks[au_idx] = body[b:]
                    # drop exactly the bytes _sei_mask_nal emitted: the
                    # 4-byte start code (one zero before "00 00 01")
                    # through the last payload byte.  Zeros further back
                    # belong to the preceding NAL and are preserved.
                    drop = sc - 1 if sc > 0 and stream[sc - 1] == 0 else sc
                    out += stream[pos:drop]
                    pos = pe
                    continue
        out += stream[pos:pe]
        pos = pe
    out += stream[pos:]
    return bytes(out), masks


def _pad_mb(a, t):
    """Edge-pad a plane up to a whole multiple of t (the MB grid), the
    same boundary policy JaxEncoder uses for non-aligned dims."""
    h, w = a.shape
    ph, pw = -(-h // t) * t - h, -(-w // t) * t - w
    if ph == 0 and pw == 0:
        return a
    return np.pad(a, ((0, ph), (0, pw)), mode="edge")


def _mbgrid(a, t):
    """(H, W) plane -> (mb_h, mb_w, t, t) MB grid (dims must be
    t-aligned; callers pad first)."""
    h, w = a.shape
    return a.reshape(h // t, t, w // t, t).transpose(0, 2, 1, 3)


_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)


def _satd_mb(plane):
    """Per-MB DC-excluded 4x4 Hadamard SATD of a 16-aligned int32 plane:
    sum over each MB's 16 4x4 blocks of (sum|H b H^T| - |dc|).  The
    standard texture/rate proxy (reference satd_sad.asm; SampleSatd in
    sample.cpp)."""
    mb = _mbgrid(plane, 16)                              # (mh,mw,16,16)
    mh, mw = mb.shape[:2]
    b = mb.reshape(mh, mw, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
    t = np.einsum("ij,mnpqjk,lk->mnpqil", _H4, b.astype(np.int64), _H4)
    return (np.abs(t).sum(axis=(2, 3, 4, 5))
            - np.abs(t[..., 0, 0]).sum(axis=(2, 3)))


class SimulcastEncoder:
    """Encode N dyadic spatial layers per frame (layer 0 = lowest res,
    layer N-1 = full res). Every JaxEncoder option applies per layer.

    `inter_layer=True` switches layers > 0 from independent simulcast to
    INTER-LAYER PREDICTION (the reference is a true spatial-SVC encoder:
    svc_mode_decision.cpp inter-layer MD, encoder_ext.cpp:2420 layer
    setup). TPU-first redesign with AVC-compatible transport: instead of
    Annex-G coded-slice-extension NALs, each enhancement layer codes the
    RESIDUAL DOMAIN — clip(src - upsample2x(base recon) + 128) — as a
    standard AVC stream. The upsampled base recon is the inter-layer
    intra prediction everywhere (what SVC's ILP intra mode provides
    per-MB), and P frames over the residual domain combine temporal and
    inter-layer prediction (SVC's residual prediction). A receiver
    reconstructs with SimulcastDecoder: up(base) + (residual - 128).
    Every layer stream is plain AVC, so the recompression engine
    round-trips the whole bundle losslessly."""

    def __init__(self, width, height, spatial_layers=2, qp=28,
                 inter_layer=False, **kw):
        assert 1 <= spatial_layers <= 4, "1..4 spatial layers"
        scale = 1 << (spatial_layers - 1)
        assert width % (2 * scale) == 0 and height % (2 * scale) == 0, \
            "source dims must divide by 2^layers (dyadic 4:2:0 pyramid)"
        assert width >= 16 * scale and height >= 16 * scale, \
            "lowest layer must be at least one macroblock"
        self.width, self.height = width, height
        self.inter_layer = bool(inter_layer)
        self._au_idx = 0          # per-bundle AU counter (SEI alignment)
        self.dims = []
        self.encs = []
        for i in range(spatial_layers):
            sh = spatial_layers - 1 - i
            w, h = width >> sh, height >> sh
            self.dims.append((w, h))
            self.encs.append(JaxEncoder(w, h, qp=qp, param_id=i, **kw))

    def _pyramid(self, Y, U, V):
        """Low-res-first list of per-layer (Y, U, V) source planes
        (dyadic bilinear downsample, the reference's preprocess path)."""
        from . import processing as proc
        planes = [(np.asarray(Y), np.asarray(U), np.asarray(V))]
        for _ in range(len(self.encs) - 1):
            planes.append(tuple(np.asarray(proc.downsample2x(p))
                                for p in planes[-1]))
        planes.reverse()
        out = []
        for (w, h), (Yl, Ul, Vl) in zip(self.dims, planes):
            out.append((np.ascontiguousarray(Yl[:h, :w]),
                        np.ascontiguousarray(Ul[:h // 2, :w // 2]),
                        np.ascontiguousarray(Vl[:h // 2, :w // 2])))
        return out

    def encode_frame_layers(self, Y, U, V):
        """Per-layer bytes for one source frame, low-res first."""
        if not self.inter_layer:
            return [enc.encode_frame(*src)
                    for enc, src in zip(self.encs, self._pyramid(Y, U, V))]
        from . import processing as proc
        srcs = self._pyramid(Y, U, V)
        out = []
        prev_recon = None
        for li, (enc, src) in enumerate(zip(self.encs, srcs)):
            if li == 0:
                out.append(enc.encode_frame(*src))
            else:
                # per-MB adaptive inter-layer prediction (VERDICT r3
                # #7): each MB picks residual mode (code src - up(base)
                # + 128) or source mode (code the pixels directly).
                # Saturating MBs (|residual| > 127 anywhere — the old
                # whole-frame clip() silently flattened them) and MBs
                # whose source is flatter than their residual fall back
                # to source mode, so ILP is never worse than simulcast
                # per-MB. The mode plane ships as an SEI ahead of the AU.
                pred = [np.asarray(proc.upsample2x(p))[:s.shape[0],
                                                       :s.shape[1]]
                        for p, s in zip(prev_recon, src)]
                mask = self._ilp_decide(src, pred)
                mixed = self._ilp_mix(src, pred, mask)
                sei = (b"" if mask.all()
                       else _sei_mask_nal(mask.reshape(-1),
                                          self._au_idx))
                out.append(sei + enc.encode_frame(*mixed))
            w, h = self.dims[li]
            rY, rU, rV = enc.recon
            prev_recon = (rY[:h, :w], rU[:h // 2, :w // 2],
                          rV[:h // 2, :w // 2])
            if li > 0:
                # the layer's true recon (what a receiver displays):
                # residual MBs add up(base) - 128, source MBs are the
                # coded pixels; feed THAT upward so deeper layers
                # predict from displayed pixels
                prev_recon = tuple(_ilp_combine(
                    pred, (rY[:h, :w], rU[:h // 2, :w // 2],
                           rV[:h // 2, :w // 2]), mask))
        self._au_idx += 1
        return out

    @staticmethod
    def _ilp_decide(src, pred):
        """Per-MB residual-vs-source mode: residual only when it cannot
        saturate (luma AND chroma fit in [-127, 127]) and the luma
        residual is CHEAPER TO CODE than the source by a transform-domain
        rate proxy — DC-excluded 4x4 Hadamard SATD, the same texture-cost
        measure the reference's mode decision uses
        (svc_mode_decision.cpp:1-684 cost-based MD; satd_sad.asm).
        Variance was the old proxy and is wrong on structured content: a
        pixel-scale checkerboard residual has LOW variance but HIGH coded
        cost, while a blocky high-contrast source has HIGH variance but
        near-zero AC energy.  Partial edge MBs (non-multiple-of-16 dims)
        are edge-padded to whole MBs for the decision."""
        sy = _pad_mb(src[0], 16).astype(np.int32)
        py = _pad_mb(pred[0], 16).astype(np.int32)
        sat = np.zeros((sy.shape[0] // 16, sy.shape[1] // 16), bool)
        for i, (s, p) in enumerate(zip(src, pred)):
            t = 16 if i == 0 else 8
            r = _mbgrid(_pad_mb(s, t).astype(np.int32)
                        - _pad_mb(p, t).astype(np.int32), t)
            sat |= (np.abs(r) > 127).any(axis=(2, 3))
        cost_r = _satd_mb(sy - py)
        cost_s = _satd_mb(sy)
        return (~sat) & (cost_r <= cost_s)

    @staticmethod
    def _ilp_mix(src, pred, mask):
        """Build the enhancement encoder's input: residual+128 on mask
        MBs, source pixels elsewhere.  The ceil-sized MB mask covers
        partial edge MBs, so the kron expansion always reaches the full
        plane before the crop."""
        out = []
        for i, (s, p) in enumerate(zip(src, pred)):
            t = 16 if i == 0 else 8
            m = np.kron(mask, np.ones((t, t), bool))[:s.shape[0],
                                                     :s.shape[1]]
            resid = np.clip(s.astype(np.int32) - p.astype(np.int32)
                            + 128, 0, 255)
            out.append(np.where(m, resid, s).astype(np.uint8))
        return out

    def encode_frame(self, Y, U, V):
        """One access unit: all spatial layers' NALs, low-res first."""
        return b"".join(self.encode_frame_layers(Y, U, V))

    def encode_frames(self, frames, batch=8):
        """Per-AU encode of a frame sequence (CLI driver interface)."""
        return [self.encode_frame(*f) for f in frames]

    def force_intra_frame(self):
        for enc in self.encs:
            enc.force_intra_frame()


def _ilp_combine(pred, coded, mask):
    """display = up(base) + coded - 128 on residual-mode MBs, coded
    pixels on source-mode MBs."""
    out = []
    for i, (pr, rr) in enumerate(zip(pred, coded)):
        t = 16 if i == 0 else 8
        h2, w2 = min(pr.shape[0], rr.shape[0]), min(pr.shape[1],
                                                    rr.shape[1])
        pr, rr = pr[:h2, :w2], rr[:h2, :w2]
        m = np.kron(mask, np.ones((t, t), bool))[:h2, :w2]
        resid = np.clip(pr.astype(np.int32) + rr.astype(np.int32) - 128,
                        0, 255)
        out.append(np.where(m, resid, rr).astype(np.uint8))
    return tuple(out)


class SimulcastDecoder:
    """Receiver for inter-layer scalable bundles: N per-layer AVC
    streams, low-res first. Layer 0 decodes standalone; each higher
    layer carries a per-MB mode plane in a leading SEI (residual mode:
    display = clip(up(lower) + coded - 128); source mode: display =
    coded pixels)."""

    def __init__(self, layer_streams, error_concealment=True):
        from . import decoder_np as dnp
        self._dnp = dnp
        self.decs = []
        self.masks = []   # per layer: {au_idx: packed mask bytes}
        for li, s in enumerate(layer_streams):
            clean, masks = _split_ilp_seis(s) if li > 0 else (s, {})
            self.decs.append(
                dnp.NpDecoder(clean, error_concealment=error_concealment))
            self.masks.append(masks)

    def frames(self):
        from . import processing as proc
        its = [d.frames() for d in self.decs]
        while True:
            try:
                layers = [next(it) for it in its]
            except StopIteration:
                return
            cropped = [self._dnp.crop_yuv(f, d.crop_px)
                       for f, d in zip(layers, self.decs)]
            recon = cropped[0]
            for li, coded in enumerate(cropped[1:], start=1):
                # ceil MB grid (masks cover partial edge MBs too)
                mh = -(-coded[0].shape[0] // 16)
                mw = -(-coded[0].shape[1] // 16)
                # key mask lookup on the layer's true AU index — with
                # freeze-output error concealment the yielded-frame
                # count lags the AU count, so a yield counter would
                # apply masks to the wrong frames.  NpDecoder appends
                # every decoded AU to .outputs before yielding, so the
                # AU index of the frame just pulled is len(outputs)-1
                # (the SEI embeds au_idx precisely for this alignment).
                au_idx = len(self.decs[li].outputs) - 1
                mb = self.masks[li].get(au_idx)
                if mb is not None:
                    bits = np.unpackbits(np.frombuffer(mb, np.uint8))
                    mask = bits[:mh * mw].reshape(mh, mw).astype(bool)
                else:  # no SEI for this AU: all-residual (common case)
                    mask = np.ones((mh, mw), bool)
                pred = [np.asarray(proc.upsample2x(lo))
                        for lo in recon]
                recon = _ilp_combine(pred, coded, mask)
            yield recon
