"""Dynamic size-limited slicing — the reference's SM_DYN_SLICE analog
(codec_app_def.h:275, svc_encode_slice.cpp dynamic slicing).

Design difference (documented in JaxEncoder): boundaries are
row-granular and planned from the previous frame's measured per-row bit
costs (batched device analysis needs the slice map before writing);
a frame whose slice blows the cap is replanned from its own measured
costs and re-encoded once.
"""
import numpy as np
import pytest

from losslessh264_tpu import decoder_np, native
from losslessh264_tpu.encoder_jax import JaxEncoder

pytestmark = pytest.mark.slow  # compile-heavy


def _frames(n, W, H, seed=5):
    rng = np.random.RandomState(seed)
    pad = 48
    yy, xx = np.indices((H + pad, W + pad))
    sc = (((yy * 3 + xx * 2) // 3 + rng.randint(0, 30, (H + pad, W + pad)))
          % 256).astype(np.uint8)
    out = []
    for i in range(n):
        s = (i * 3) % 32
        Y = np.ascontiguousarray(sc[s:s + H, s:s + W])
        U = np.ascontiguousarray(sc[:H // 2, :W // 2])
        V = np.ascontiguousarray(sc[1:H // 2 + 1, :W // 2])
        out.append((Y, U, V))
    return out


def _nal_sizes(data):
    """[(type, payload_bytes)] split on Annex-B start codes."""
    out = []
    i = 0
    starts = []
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else len(data)
        while e > s and data[e - 1] == 0 and k + 1 < len(starts):
            e -= 1  # start-code zero prefix belongs to the next NAL
        out.append((data[s] & 0x1F, e - s))
    return out


def test_dynamic_slices_respect_cap_and_decode():
    W, H = 128, 96
    CAP = 900
    frames = _frames(10, W, H)
    enc = JaxEncoder(W, H, qp=30, slice_max_bytes=CAP)
    chunks = [enc.encode_frame(*f) for f in frames]
    data = b"".join(chunks)

    # slice NALs (type 1/5) after the adaptation warm-up frame must
    # respect the cap up to the row-granularity floor: a slice never
    # exceeds the cap by more than the writer's boundary context drift
    # (allow 10%); a frame cheap enough to fit one slice legitimately
    # does not split
    split_somewhere = False
    for fi, ch in enumerate(chunks[1:], 1):
        sizes = [sz for t, sz in _nal_sizes(ch) if t in (1, 5)]
        split_somewhere |= len(sizes) >= 2
        for sz in sizes:
            assert sz <= CAP * 1.10 + 32, \
                f"frame {fi}: slice {sz}B blew the {CAP}B cap"
    assert split_somewhere, "no frame ever needed more than one slice " \
        "— the cap is not exercising dynamic slicing"

    # decoder parity: the multi-slice stream reconstructs exactly the
    # encoder's recon (slice-boundary prediction resets honored on both
    # sides)
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    for a, b in zip(last, enc.recon):
        np.testing.assert_array_equal(a, b)

    # and the stream recompresses losslessly
    pip, _ = native.compress(data, verify=True)
    out, _ = native.decompress(pip)
    assert out == data


def test_dynamic_slice_cap_shrinks_slices():
    """A tighter cap must produce more slices per frame."""
    W, H = 128, 96
    frames = _frames(4, W, H)
    ns = {}
    for cap in (700, 2400):
        enc = JaxEncoder(W, H, qp=30, slice_max_bytes=cap)
        chunks = [enc.encode_frame(*f) for f in frames]
        ns[cap] = len([1 for t, _ in _nal_sizes(chunks[-1])
                       if t in (1, 5)])
    assert ns[700] > ns[2400]
