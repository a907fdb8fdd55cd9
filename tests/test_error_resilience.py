"""Error resilience: corrupt/truncated inputs must never break the
lossless contract (raw-fallback slices) and the pixel decoder must
conceal rather than crash (reference: error_concealment.cpp,
dsBitstreamError handling)."""
import numpy as np
import pytest

from losslessh264_tpu import decoder_np, native


@pytest.fixture(scope="module")
def tibby_bytes():
    return open("/root/reference/roundtriptest/tibby.264", "rb").read()


def _roundtrip(data):
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    return out, st


def test_corrupt_slice_data_roundtrips(tibby_bytes):
    bad = bytearray(tibby_bytes)
    bad[50000] ^= 0x55
    bad = bytes(bad)
    out, st = _roundtrip(bad)
    assert out == bad
    assert st.n_fallback_slices >= 1


def test_corrupt_sps_roundtrips(tibby_bytes):
    bad = bytearray(tibby_bytes)
    bad[6] ^= 0xFF
    bad = bytes(bad)
    out, _ = _roundtrip(bad)
    assert out == bad


def test_truncated_stream_roundtrips(tibby_bytes):
    tr = tibby_bytes[:60000]
    out, st = _roundtrip(tr)
    assert out == tr


@pytest.mark.parametrize("blob", [
    b"",                      # empty input
    b"\x00" * 100,            # zeros, no start code
    b"junk\x01\x02no start",  # garbage, no start code
    b"\x00\x00\x01",          # bare start code, empty NAL
    b"GARBAGE\x00\x00\x01\x41" + bytes(range(256)) * 4,  # leading junk
])
def test_arbitrary_bytes_roundtrip(blob):
    """Lossless contract holds for ANY byte string (raw passthrough of
    pre-start-code junk / start-code-free inputs)."""
    out, _ = _roundtrip(blob)
    assert out == blob


def test_leading_junk_keeps_compression(tibby_bytes):
    j = b"\xde\xad" + tibby_bytes
    pip, _ = native.compress(j, verify=True)
    out, _ = native.decompress(pip)
    assert out == j
    assert len(pip) < len(j) * 0.95
    # sharded path handles the junk-owning first segment too
    pip2, _ = native.compress_sharded(j, 4)
    out2, _ = native.decompress(pip2)
    assert out2 == j


def test_garbage_nal_roundtrips():
    rng = np.random.RandomState(0)
    g = b"\x00\x00\x01\x41" + rng.randint(0, 255, 5000).astype(np.uint8).tobytes()
    out, st = _roundtrip(g)
    assert out == g
    assert st.n_fallback_slices == 1


@pytest.mark.slow
def test_decoder_conceals_corrupt_frame(tibby_bytes):
    bad = bytearray(tibby_bytes)
    bad[50000] ^= 0x55
    bad = bytes(bad)
    dec = decoder_np.NpDecoder(bad)
    outs = list(dec.frames())
    # slice-copy concealment keeps decoding: all 94 frames come out
    assert len(outs) == 94
    assert dec.concealed >= 1


@pytest.mark.slow
def test_jax_decoder_conceals(tibby_bytes):
    from losslessh264_tpu import decoder_jax
    bad = bytearray(tibby_bytes)
    # corrupt an early P slice so concealment triggers within a few
    # frames (CPU-JAX pays seconds per decoded frame)
    bad[8000] ^= 0x55
    dec = decoder_jax.JaxDecoder(bytes(bad))
    for i, _ in enumerate(dec.frames()):
        if dec.concealed or i > 20:
            break
    assert dec.concealed >= 1


@pytest.mark.slow
def test_decoder_strict_mode_raises(tibby_bytes):
    bad = bytearray(tibby_bytes)
    bad[50000] ^= 0x55
    dec = decoder_np.NpDecoder(bytes(bad), error_concealment=False)
    with pytest.raises(Exception):
        list(dec.frames())
