"""Pixel-decode parity vs the reference decoder.

Golden data: tests/data/ref_yuv_crc.json holds per-frame CRC32 of the
reference decoder's (OpenH264 h264dec) YUV output for a spread of
conformance streams — all-intra, P-frames with multi-ref + explicit
weighted prediction (tibbycabac), 8x8 transform (tibby8x8cavlc),
multi-slice (BA_MW_D), PCM (CVPCMNL1), FMO (SVA_FM1_E).

The decode must match the reference decoder BIT-EXACTLY (reference:
the whole decoder core, decode_slice.cpp + rec_mb.cpp + deblocking.cpp),
including its known deviations from spec that we deliberately mirror
(ref-idx-based deblock bS, quarter-size weighted chroma region,
reorder-abort ref list handling).
"""
import json
import os
import zlib

import numpy as np
import pytest

from losslessh264_tpu import decoder_np

REF = "/root/reference"
GOLD = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                   "ref_yuv_crc.json")))


@pytest.mark.parametrize("name", sorted(GOLD.keys()))
def test_decode_matches_reference(name):
    g = GOLD[name]
    path = os.path.join(REF, g["stream"])
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    data = open(path, "rb").read()
    dec = decoder_np.NpDecoder(data)
    it = dec.frames()
    for i in range(g["frames"]):
        Y, U, V = next(it)
        got = zlib.crc32(Y.tobytes() + U.tobytes() + V.tobytes())
        assert got == g["crc32"][i], f"{name} frame {i}: CRC mismatch"
