"""Long-stream gate — the walk.264 analog (VERDICT round-1 item 9).

The reference's largest roundtrip gate is walk.264 (640x352, 1331
frames, walk.stats:796-945), a stripped blob in this checkout.
tests/data/walk_analog.264 substitutes: 1000 frames of 640x352 moving
textured content with scene cuts and periodic IDRs, produced by our own
encoder (tools/gen_longstream.py — regenerate there; the committed hash
pins the exact stream).
"""
import hashlib
import os

import pytest

from losslessh264_tpu import native

STREAM = os.path.join(os.path.dirname(__file__), "data",
                      "walk_analog.264")
SHA256 = ("cace43e023aebccc1be00a943afbedd9539f70f98d1a98eaa3b903604"
          "2b11117")
N_FRAMES = 1000

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def stream_bytes():
    if not os.path.exists(STREAM):
        pytest.skip("walk_analog.264 not generated")
    data = open(STREAM, "rb").read()
    assert hashlib.sha256(data).hexdigest() == SHA256, \
        "walk_analog.264 does not match the committed hash — " \
        "regenerate with tools/gen_longstream.py"
    return data


def test_longstream_roundtrip_bitexact(stream_bytes):
    pip, st = native.compress(stream_bytes, verify=False)
    assert st.n_frames == N_FRAMES
    out, _ = native.decompress(pip)
    assert out == stream_bytes, "long-stream roundtrip not byte-exact"
    # the model must still win on a 1000-frame stream (adaptation pays
    # off with length; the reference saves 14.6% on walk.264)
    savings = 1.0 - len(pip) / len(stream_bytes)
    assert savings > 0.04, f"long-stream savings collapsed: {savings:.3f}"


def test_longstream_decodes_every_frame(stream_bytes):
    from losslessh264_tpu import decoder_np
    # decode a stride of GOPs (full-stream NpDecoder is a ~10 min pure-
    # python run; the roundtrip above already proves symbol integrity)
    dec = decoder_np.NpDecoder(stream_bytes)
    n = 0
    for _ in dec.frames():
        n += 1
        if n >= 12:
            break
    assert n == 12
