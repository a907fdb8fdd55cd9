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


def test_inter_encode_decode():
    # IPPP: P frames with TPU full-search ME + P_Skip; decoder roundtrip
    rng = np.random.RandomState(7)
    H, W = 48, 64
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    frames = []
    for i in range(4):
        Y = bg[i * 2:i * 2 + H, i * 3:i * 3 + W]
        U = np.full((H // 2, W // 2), 100 + i, np.uint8)
        V = np.full((H // 2, W // 2), 200, np.uint8)
        frames.append((Y, U, V))
    data = encoder.encode_yuv(frames, W, H, qp=26, inter=True)
    outs = decoder_np.decode_to_yuv(data)
    assert len(outs) == len(frames)
    for (Y, U, V), (sy, su, sv) in zip(outs, frames):
        mse = np.mean((Y.astype(float) - sy) ** 2)
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30.0
    # and the lossless recompressor must roundtrip our own P streams
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data
    assert st.n_fallback_slices == 0


def test_inter_encode_static_scene_skips():
    # identical frames: every P MB should become P_Skip -> tiny P frames
    rng = np.random.RandomState(3)
    H, W = 48, 64
    Y = rng.randint(0, 255, (H, W)).astype(np.uint8)
    U = np.full((H // 2, W // 2), 90, np.uint8)
    V = np.full((H // 2, W // 2), 160, np.uint8)
    enc = encoder.Encoder(W, H, qp=26)
    first = enc.encode_frame(Y, U, V)
    second = enc.encode_frame(Y, U, V)
    assert len(second) < len(first) // 10
    outs = decoder_np.decode_to_yuv(first + second)
    # P frame re-codes the residual vs the source, so frame 1 is at least
    # as close to the source as frame 0 — not necessarily identical to it
    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr(outs[1][0], Y) >= psnr(outs[0][0], Y) - 1.0
