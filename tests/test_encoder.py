"""Encoder tests: encode -> own decoder roundtrip + recompression.

(The reference-decoder cross-check runs in integration, not here — it
needs the slow reference binary.)"""
import numpy as np

from losslessh264_tpu import decoder_np, encoder, native


def _test_frames(W=64, H=48, n=2):
    frames = []
    for i in range(n):
        ys, xs = np.mgrid[0:H, 0:W]
        Y = ((xs * 3 + ys * 2 + i * 17) % 256).astype(np.uint8)
        U = ((xs[: H // 2, : W // 2] + 64) % 256).astype(np.uint8)
        V = np.full((H // 2, W // 2), 200 - i, np.uint8)
        frames.append((Y, U, V))
    return frames


def test_encode_decode_psnr():
    frames = _test_frames()
    data = encoder.encode_yuv(frames, 64, 48, qp=24)
    outs = decoder_np.decode_to_yuv(data)
    assert len(outs) == len(frames)
    for (Y, U, V), (sy, su, sv) in zip(outs, frames):
        mse = np.mean((Y.astype(float) - sy) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 38.0


def test_encoder_recon_matches_decoder():
    # the encoder's in-loop reconstruction must equal the decoder's
    # pre-deblock reconstruction bit-exactly
    frames = _test_frames(n=1)
    enc = encoder.IntraEncoder(64, 48, qp=30)
    data = enc.encode_frame(*frames[0])
    recY = enc._recon[0]
    dec = decoder_np.NpDecoder(data)
    dec._deblock = lambda *a, **k: None
    Y, U, V = next(dec.frames())
    np.testing.assert_array_equal(Y, recY)


def test_encode_then_recompress():
    frames = _test_frames(n=3)
    data = encoder.encode_yuv(frames, 64, 48, qp=28)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data
    assert st.n_fallback_slices == 0
