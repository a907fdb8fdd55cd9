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
    layer N-1 = full res). Every JaxEncoder option applies per layer."""

    def __init__(self, width, height, spatial_layers=2, qp=28, **kw):
        assert 1 <= spatial_layers <= 4, "1..4 spatial layers"
        scale = 1 << (spatial_layers - 1)
        assert width % (2 * scale) == 0 and height % (2 * scale) == 0, \
            "source dims must divide by 2^layers (dyadic 4:2:0 pyramid)"
        assert width >= 16 * scale and height >= 16 * scale, \
            "lowest layer must be at least one macroblock"
        self.width, self.height = width, height
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
        return [enc.encode_frame(*src)
                for enc, src in zip(self.encs, self._pyramid(Y, U, V))]

    def encode_frame(self, Y, U, V):
        """One access unit: all spatial layers' NALs, low-res first."""
        return b"".join(self.encode_frame_layers(Y, U, V))

    def encode_frames(self, frames, batch=8):
        """Per-AU encode of a frame sequence (CLI driver interface)."""
        return [self.encode_frame(*f) for f in frames]

    def force_intra_frame(self):
        for enc in self.encs:
            enc.force_intra_frame()
