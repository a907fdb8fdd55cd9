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
                # inter-layer prediction: code the residual vs the
                # upsampled LOWER layer recon (recon, not source — the
                # decoder only has the recon)
                pred = [np.asarray(proc.upsample2x(p)) for p in prev_recon]
                resid = []
                for s, pr in zip(src, pred):
                    pr = pr[:s.shape[0], :s.shape[1]]
                    resid.append(np.clip(
                        s.astype(np.int32) - pr.astype(np.int32) + 128,
                        0, 255).astype(np.uint8))
                out.append(enc.encode_frame(*resid))
            w, h = self.dims[li]
            rY, rU, rV = enc.recon
            prev_recon = (rY[:h, :w], rU[:h // 2, :w // 2],
                          rV[:h // 2, :w // 2])
            if li > 0:
                # the layer's true recon (what a receiver displays) is
                # up(base) + (residual recon - 128); feed THAT upward so
                # deeper layers predict from the displayed pixels
                full = []
                for pr, rr in zip(pred, (rY, rU, rV)):
                    h2, w2 = pr.shape
                    rr = rr[:h2, :w2]
                    full.append(np.clip(
                        pr.astype(np.int32) + rr.astype(np.int32) - 128,
                        0, 255).astype(np.uint8))
                prev_recon = tuple(full)
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


class SimulcastDecoder:
    """Receiver for inter-layer (residual-domain) scalable bundles: N
    per-layer AVC streams, low-res first. Layer 0 decodes standalone;
    each higher layer adds its residual stream onto the upsampled
    reconstruction below it (the SimulcastEncoder inter_layer contract:
    display = clip(up(lower) + (residual - 128)))."""

    def __init__(self, layer_streams, error_concealment=True):
        from . import decoder_np as dnp
        self._dnp = dnp
        self.decs = [dnp.NpDecoder(s, error_concealment=error_concealment)
                     for s in layer_streams]

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
            for up in cropped[1:]:
                out = []
                for lo, res in zip(recon, up):
                    pr = np.asarray(proc.upsample2x(lo))
                    pr = pr[:res.shape[0], :res.shape[1]]
                    out.append(np.clip(
                        pr.astype(np.int32) + res.astype(np.int32) - 128,
                        0, 255).astype(np.uint8))
                recon = tuple(out)
            yield recon
