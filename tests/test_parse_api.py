"""Parse-only decode API (reference ISVCDecoder::DecodeParser,
codec_api.h:416-437): AU splitting, NAL re-assembly, and the
re-decode-to-identical-symbols contract."""
import glob
import os

import numpy as np
import pytest

from losslessh264_tpu import native
from losslessh264_tpu.parse import DecodeParser

REF = "/root/reference"

STREAMS = [
    "roundtriptest/black.264",
    "roundtriptest/tibby.264",
    "roundtriptest/tibbycabac.264",
    "res/BA1_FT_C.264",
    "res/SVA_FM1_E.264",       # FMO
    "res/CVPCMNL1_SVA_C.264",  # PCM
]


def _sym_equal(a, b):
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb, err_msg=k)
        else:
            assert va == vb, k


@pytest.mark.parametrize("rel", STREAMS)
def test_parse_roundtrip(rel):
    path = os.path.join(REF, rel)
    data = open(path, "rb").read()
    aus = list(DecodeParser(data))
    # every AU maps to a symbol frame; raw spans cover the input
    n_frames = sum(1 for _ in native.SymbolDecoder(data))
    assert len(aus) == n_frames
    assert b"".join(au.annexb for au in aus) == data
    assert aus[0].is_idr
    assert aus[0].width > 0 and aus[0].height > 0
    # the DecodeParser contract: re-assembled NALs re-decode to
    # IDENTICAL symbols (VERDICT r4 #7 'done' criterion)
    re_stream = b"".join(au.reassembled() for au in aus)
    re_syms = list(native.SymbolDecoder(re_stream))
    assert len(re_syms) == n_frames
    for au, rf in zip(aus, re_syms):
        _sym_equal(au.symbols, rf)


def test_parse_sps_pps():
    data = open(os.path.join(REF, "roundtriptest/tibby.264"), "rb").read()
    ps = DecodeParser(data).sps_pps()
    types = [t for t, _ in ps]
    assert 7 in types and 8 in types
    # payloads start with the NAL header byte for their type
    for t, p in ps:
        assert (p[0] & 0x1f) == t
