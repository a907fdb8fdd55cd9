"""TPU-batched encoder (encoder_jax): decode roundtrip, bit-exact in-loop
recon vs the decoder, subpel ME/MC parity, recompression of own streams.
(Reference test model: EncUT_* encoder units + decode_encode_test.cpp.)"""
import pytest

import numpy as np

from losslessh264_tpu import decoder_np, encoder_jax, native
from losslessh264_tpu.ops import mc as jmc

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


def _moving_frames(n=4, W=64, H=48, seed=7):
    rng = np.random.RandomState(seed)
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    frames = []
    for i in range(n):
        Y = np.ascontiguousarray(bg[i * 2:i * 2 + H, i * 3:i * 3 + W])
        U = np.full((H // 2, W // 2), 100 + i, np.uint8)
        V = np.full((H // 2, W // 2), 200, np.uint8)
        frames.append((Y, U, V))
    return frames


def test_mc_luma_mbs_matches_decoder():
    rng = np.random.default_rng(3)
    H, W, PAD = 64, 96, 32
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = np.pad(ref, PAD, mode="edge")
    planes = jmc.halfpel_planes(ref_pad)
    n = 80
    y0 = rng.integers(0, H // 16, n) * 16
    x0 = rng.integers(0, W // 16, n) * 16
    mvx = rng.integers(-68, 69, n)
    mvy = rng.integers(-68, 69, n)
    got = np.asarray(jmc.mc_luma_mbs(planes, PAD, y0, x0, mvx, mvy))
    for i in range(n):
        want = decoder_np.mc_luma_block(ref_pad, PAD, int(y0[i]), int(x0[i]),
                                        int(mvx[i]), int(mvy[i]), 16, 16)
        np.testing.assert_array_equal(got[i], want,
                                      err_msg=f"mv=({mvx[i]},{mvy[i]})")


def test_mc_chroma_mbs_matches_decoder():
    rng = np.random.default_rng(4)
    H, W, PAD = 32, 48, 16
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref_pad = np.pad(ref, PAD, mode="edge")
    n = 80
    y0 = rng.integers(0, H // 8, n) * 8
    x0 = rng.integers(0, W // 8, n) * 8
    mvx = rng.integers(-60, 61, n)
    mvy = rng.integers(-60, 61, n)
    got = np.asarray(jmc.mc_chroma_mbs(ref_pad, PAD, y0, x0, mvx, mvy))
    for i in range(n):
        want = decoder_np.mc_chroma_block(ref_pad, PAD, int(y0[i]),
                                          int(x0[i]), int(mvx[i]),
                                          int(mvy[i]), 8, 8)
        np.testing.assert_array_equal(got[i], want)


def test_jax_encode_recon_matches_decoder():
    """In-loop recon (I and P frames, incl. subpel MVs, in-loop
    deblocking) must equal the decoder's reconstruction bit-exactly."""
    frames = _moving_frames(4)
    enc = encoder_jax.JaxEncoder(64, 48, qp=26)
    data = b""
    for f in frames:
        data += enc.encode_frame(*f)
    dec = decoder_np.NpDecoder(data)
    last = None
    for fr in dec.frames():
        last = fr
    recY, recU, recV = enc.recon
    np.testing.assert_array_equal(last[0], recY)
    np.testing.assert_array_equal(last[1], recU)
    np.testing.assert_array_equal(last[2], recV)


def test_jax_encode_decode_psnr_and_recompress():
    frames = _moving_frames(4)
    data = encoder_jax.encode_yuv(frames, 64, 48, qp=24)
    outs = decoder_np.decode_to_yuv(data)
    assert len(outs) == len(frames)
    for (Y, U, V), (sy, su, sv) in zip(outs, frames):
        mse = np.mean((Y.astype(float) - sy) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 30.0
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data
    assert st.n_fallback_slices == 0


def test_jax_encode_static_scene_skips():
    rng = np.random.RandomState(3)
    H, W = 48, 64
    Y = rng.randint(0, 255, (H, W)).astype(np.uint8)
    U = np.full((H // 2, W // 2), 90, np.uint8)
    V = np.full((H // 2, W // 2), 160, np.uint8)
    enc = encoder_jax.JaxEncoder(W, H, qp=26)
    first = enc.encode_frame(Y, U, V)
    second = enc.encode_frame(Y, U, V)
    assert len(second) < len(first) // 10


def test_jax_encoder_gop_structure():
    frames = _moving_frames(5)
    enc = encoder_jax.JaxEncoder(64, 48, qp=28, gop=2)
    sizes = [len(enc.encode_frame(*f)) for f in frames]
    data = encoder_jax.encode_yuv(frames, 64, 48, qp=28, gop=2)
    outs = decoder_np.decode_to_yuv(data)
    assert len(outs) == 5
    # frames 0,2,4 are IDR (larger), 1,3 are P
    assert sizes[1] < sizes[0] and sizes[3] < sizes[2]


def test_adaptive_quantization_end_to_end():
    """aq=True codes a per-MB QP plane (mb_qp_delta); recon must stay
    bit-exact vs the decoder and the stream must recompress losslessly."""
    rng = np.random.RandomState(7)
    H, W = 48, 64
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    bg[:, :W // 2 + 16] //= 8  # flat half + textured half
    frames = []
    for i in range(3):
        Y = np.ascontiguousarray(bg[i * 2:i * 2 + H, i * 3:i * 3 + W])
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 200, np.uint8)
        frames.append((Y, U, V))
    enc = encoder_jax.JaxEncoder(W, H, qp=30, aq=True)
    data = b""
    for f in frames:
        data += enc.encode_frame(*f)
    assert len(np.unique(enc._qp_plane)) > 1  # AQ actually varied QP
    dec = decoder_np.NpDecoder(data)
    last = None
    for fr in dec.frames():
        last = fr
    recY, recU, recV = enc.recon
    np.testing.assert_array_equal(last[0], recY)
    np.testing.assert_array_equal(last[1], recU)
    np.testing.assert_array_equal(last[2], recV)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_cabac_encode_end_to_end():
    """cabac=True emits CABAC slices through the same writer the recode
    path uses; recon stays bit-exact and the stream recompresses."""
    frames = _moving_frames(4)
    enc = encoder_jax.JaxEncoder(64, 48, qp=26, cabac=True)
    data = b""
    for f in frames:
        data += enc.encode_frame(*f)
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    recY, recU, recV = enc.recon
    np.testing.assert_array_equal(last[0], recY)
    np.testing.assert_array_equal(last[1], recU)
    np.testing.assert_array_equal(last[2], recV)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0
    # CABAC should not be larger than CAVLC on the same content
    cavlc = encoder_jax.encode_yuv(frames, 64, 48, qp=26)
    assert len(data) <= len(cavlc) * 1.02


def test_multi_slice_encode():
    """slices=k emits k row-aligned slices per frame with the same-slice
    availability rule respected in mode decision (reference
    SM_FIXEDSLCNUM_SLICE); recon stays decoder-exact for CAVLC and CABAC."""
    rng = np.random.RandomState(7)
    H, W = 96, 64
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    frames = []
    for i in range(3):
        Y = np.ascontiguousarray(bg[i * 2:i * 2 + H, i * 3:i * 3 + W])
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 200, np.uint8)
        frames.append((Y, U, V))
    for cab in (False, True):
        enc = encoder_jax.JaxEncoder(W, H, qp=26, slices=3, cabac=cab)
        data = b""
        for f in frames:
            data += enc.encode_frame(*f)
        dec = decoder_np.NpDecoder(data, error_concealment=False)
        last = None
        for fr in dec.frames():
            last = fr
        recY, recU, recV = enc.recon
        np.testing.assert_array_equal(last[0], recY)
        np.testing.assert_array_equal(last[1], recU)
        pip, st = native.compress(data, verify=False)
        out, _ = native.decompress(pip)
        assert out == data and st.n_fallback_slices == 0
        assert st.n_slices == 9  # 3 slices x 3 frames


def test_p8x8_partitions():
    """MBs whose quadrants move differently should pick P8x8 (4 MVs,
    sequential 8.4.1.3 predictors) and stay decoder-exact."""
    rng = np.random.RandomState(11)
    H, W = 64, 64
    bg = rng.randint(0, 255, (H * 3, W * 3)).astype(np.uint8)
    f0 = np.ascontiguousarray(bg[:H, :W])
    f1 = f0.copy()
    f1[:H // 2, :W // 2] = bg[2:H // 2 + 2, 3:W // 2 + 3]
    f1[:H // 2, W // 2:] = bg[5:H // 2 + 5, W // 2 - 4:W - 4]
    f1[H // 2:, :W // 2] = bg[H // 2 - 3:H - 3, 1:W // 2 + 1]
    f1[H // 2:, W // 2:] = bg[H // 2 + 6:H + 6, W // 2 + 2:W + 2]
    U = np.full((H // 2, W // 2), 100, np.uint8)
    V = np.full((H // 2, W // 2), 200, np.uint8)
    enc = encoder_jax.JaxEncoder(W, H, qp=30)
    data = enc.encode_frame(f0, U, V)
    data += enc.encode_frame(np.ascontiguousarray(f1), U, V)
    frames = list(native.SymbolDecoder(data))
    assert (frames[1]["mb_class"] == 6).any()  # some MBs chose P8x8
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    recY, recU, recV = enc.recon
    np.testing.assert_array_equal(last[0], recY)
    np.testing.assert_array_equal(last[1], recU)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_in_loop_deblock():
    """deblock=True runs the shared loop-filter wavefront encoder-side
    (slice header idc=0): on smooth gradient content the filter must
    actually fire, recon must equal the decoder's filtered output, and
    deblock=False (idc=1) must keep the unfiltered contract."""
    H, W = 48, 64
    yy, xx = np.mgrid[:H, :W]
    frames = []
    for i in range(3):
        Y = ((yy * 3 + xx * 2 + i * 7) // 4 % 200 + 20).astype(np.uint8)
        U = np.full((H // 2, W // 2), 90 + i, np.uint8)
        V = np.full((H // 2, W // 2), 160, np.uint8)
        frames.append((Y, U, V))
    enc = encoder_jax.JaxEncoder(W, H, qp=38)
    enc_off = encoder_jax.JaxEncoder(W, H, qp=38, deblock=False)
    data = b""
    for f in frames:
        data += enc.encode_frame(*f)
        enc_off.encode_frame(*f)
    # the filter changed pixels somewhere (QP 38 alpha/beta are wide open)
    assert not np.array_equal(enc.recon[0], enc_off.recon[0])
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    np.testing.assert_array_equal(last[0], enc.recon[0])
    np.testing.assert_array_equal(last[1], enc.recon[1])
    np.testing.assert_array_equal(last[2], enc.recon[2])
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_arbitrary_resolution_crop():
    """Non-multiple-of-16 sources pad to whole MBs and signal the true
    size via SPS frame cropping (7.4.2.1.1); decoders expose crop_px and
    the stream recompresses losslessly."""
    rng = np.random.RandomState(3)
    W, H = 100, 62
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    frames = [(np.ascontiguousarray(bg[i * 2:i * 2 + H, i * 3:i * 3 + W]),
               np.full((H // 2, W // 2), 100, np.uint8),
               np.full((H // 2, W // 2), 200, np.uint8)) for i in range(3)]
    enc = encoder_jax.JaxEncoder(W, H, qp=28)
    data = b"".join(enc.encode_frame(*f) for f in frames)
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    n = 0
    for yuv in dec.frames():
        Yc, Uc, Vc = decoder_np.crop_yuv(yuv, dec.crop_px)
        assert Yc.shape == (H, W) and Uc.shape == (H // 2, W // 2)
        n += 1
    assert n == 3 and dec.crop_px == (0, 12, 0, 2)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_temporal_layers():
    """temporal_layers=2: odd frames are non-reference (nal_ref_idc 0,
    no dec_ref_pic_marking); dropping them leaves a decodable T0
    substream with bit-identical T0 reconstruction (the reference's
    dyadic temporal scalability, ref_list_mgr_svc.cpp)."""
    rng = np.random.RandomState(5)
    bg = rng.randint(0, 255, (120, 120)).astype(np.uint8)
    frames = [(np.ascontiguousarray(bg[i * 2:i * 2 + 48, i * 3:i * 3 + 64]),
               np.full((24, 32), 100, np.uint8),
               np.full((24, 32), 200, np.uint8)) for i in range(6)]
    enc = encoder_jax.JaxEncoder(64, 48, qp=28, temporal_layers=2)
    data = b"".join(enc.encode_frame(*f) for f in frames)
    refs = [f["is_ref"] for f in native.SymbolDecoder(data)]
    assert refs == [True, False, True, False, True, False]
    full = list(decoder_np.NpDecoder(data, error_concealment=False).frames())
    # drop every nal_ref_idc==0 NAL -> T0-only substream
    nals, i = [], 0
    while True:
        j = data.find(b"\x00\x00\x00\x01", i + 1)
        if j < 0:
            nals.append(data[i:])
            break
        nals.append(data[i:j])
        i = j
    t0 = b"".join(nal for nal in nals if (nal[4] >> 5) != 0)
    sub = list(decoder_np.NpDecoder(t0, error_concealment=False).frames())
    assert len(full) == 6 and len(sub) == 3
    for a, b in zip(full[::2], sub):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_gom_rate_control():
    """gom_rc=True plans a per-MB-row delta-QP plane from per-GOM
    complexity (the reference's GOM-level RC, ratectl.cpp, decided up
    front instead of by serial in-frame feedback): textured rows take
    higher QP than flat rows, recon stays decoder-exact and the stream
    recompresses losslessly."""
    from losslessh264_tpu import ratectl
    rng = np.random.RandomState(9)
    H, W = 96, 64
    frames = []
    for i in range(4):
        Y = np.zeros((H, W), np.uint8)
        Y[:H // 2] = 60 + i
        Y[H // 2:] = rng.randint(0, 255, (H // 2, W))
        frames.append((Y, np.full((H // 2, W // 2), 100, np.uint8),
                       np.full((H // 2, W // 2), 200, np.uint8)))
    rc = ratectl.RateControl(200_000, 25.0, qp_init=30)
    enc = encoder_jax.JaxEncoder(W, H, qp=30, rc=rc, gom_rc=True)
    data = b"".join(enc.encode_frame(*f) for f in frames)
    rows = np.asarray(enc._qp_plane).reshape(6, 4)[:, 0]
    assert rows[5] > rows[0]  # textured rows carry higher QP
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    for a, b in zip(last, enc.recon):
        np.testing.assert_array_equal(a, b)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_long_term_reference():
    """ltr=True keeps a second DPB slot: IDRs seed the LTR
    (long_term_reference_flag), mark_ltr() re-marks via MMCO 4+6, and
    recover_from_ltr() predicts the next P from the LTR via RPLR — so
    frames after a loss reconstruct identically even when intermediate
    frames are dropped (the reference's LTR recovery,
    ref_list_mgr_svc.cpp)."""
    rng = np.random.RandomState(11)
    bg = rng.randint(0, 255, (120, 140)).astype(np.uint8)
    frames = [(np.ascontiguousarray(bg[i * 2:i * 2 + 48, i * 3:i * 3 + 64]),
               np.full((24, 32), 100, np.uint8),
               np.full((24, 32), 200, np.uint8)) for i in range(7)]
    enc = encoder_jax.JaxEncoder(64, 48, qp=28, ltr=True)
    data = b""
    for i, f in enumerate(frames):
        if i == 2:
            enc.mark_ltr()
        if i == 5:
            enc.recover_from_ltr()
        data += enc.encode_frame(*f)
    outs = list(decoder_np.NpDecoder(data, error_concealment=False).frames())
    assert len(outs) == 7
    for a, b in zip(outs[-1], enc.recon):
        np.testing.assert_array_equal(a, b)
    # drop frames 3-4 entirely: the recovery frame predicts from the LTR
    nals, i = [], 0
    while True:
        j = data.find(b"\x00\x00\x00\x01", i + 1)
        if j < 0:
            nals.append(data[i:])
            break
        nals.append(data[i:j])
        i = j
    d2 = b"".join(nals[:5] + nals[7:])
    outs2 = list(decoder_np.NpDecoder(d2, error_concealment=False).frames())
    assert len(outs2) == 5
    for a, b in zip(outs[5:], outs2[-2:]):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_p16x8_p8x16_partitions():
    """Content whose halves move differently should pick two-partition
    shapes (P16x8/P8x16 with 8.4.1.3.1 directional predictors) and stay
    decoder-exact."""
    rng = np.random.RandomState(2)
    H, W = 64, 64
    bg = rng.randint(0, 255, (H * 3, W * 3)).astype(np.uint8)
    f0 = np.ascontiguousarray(bg[:H, :W])
    fh = f0.copy()   # horizontal band splits -> P16x8
    fh[:8] = bg[3:11, 2:W + 2]
    fh[8:32] = bg[13:37, 1:W + 1]
    fh[32:40] = bg[34:42, 4:W + 4]
    fh[40:] = bg[46:H + 6, 3:W + 3]
    fv = f0.copy()   # vertical band splits -> P8x16
    fv[:, :8] = bg[2:H + 2, 3:11]
    fv[:, 8:32] = bg[1:H + 1, 13:37]
    fv[:, 32:40] = bg[4:H + 4, 34:42]
    fv[:, 40:] = bg[3:H + 3, 46:W + 6]
    U = np.full((H // 2, W // 2), 100, np.uint8)
    V = np.full((H // 2, W // 2), 200, np.uint8)
    enc = encoder_jax.JaxEncoder(W, H, qp=30)
    data = enc.encode_frame(f0, U, V)
    data += enc.encode_frame(np.ascontiguousarray(fh), U, V)
    data += enc.encode_frame(np.ascontiguousarray(fv), U, V)
    frames = list(native.SymbolDecoder(data))
    assert (frames[1]["mb_class"] == 4).any()   # P16x8 used
    assert (frames[2]["mb_class"] == 5).any()   # P8x16 used
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    for a, b in zip(last, enc.recon):
        np.testing.assert_array_equal(a, b)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_two_reference_frames():
    """refs=2: every MB picks its reference by ME cost (te-coded
    ref_idx, partitions inherit it); alternating-occlusion content
    collapses to near-zero P frames via the t-2 reference, recon stays
    decoder-exact and the stream recompresses losslessly."""
    rng = np.random.RandomState(4)
    H, W = 48, 64
    A = rng.randint(0, 255, (H, W)).astype(np.uint8)
    B = rng.randint(0, 255, (H, W)).astype(np.uint8)
    U = np.full((H // 2, W // 2), 100, np.uint8)
    V = np.full((H // 2, W // 2), 200, np.uint8)
    seq = [A, A, B, A, B, A]
    enc = encoder_jax.JaxEncoder(W, H, qp=30, refs=2)
    recs, sizes, data = [], [], b""
    for Y in seq:
        d = enc.encode_frame(Y, U, V)
        data += d
        sizes.append(len(d))
        recs.append(enc.recon)
    frames = list(native.SymbolDecoder(data))
    assert (frames[3]["ref_idx"] == 1).any()      # t-2 reference used
    assert sizes[3] < sizes[2] // 10              # and it pays off
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    for i, fr in enumerate(dec.frames()):
        for a, b in zip(fr, recs[i]):
            np.testing.assert_array_equal(a, b)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0


def test_batched_p_run_bitexact():
    """encode_frames batches runs of P frames through one scanned device
    program (_p_batch); output must be byte-identical to per-frame
    encode_frame calls, recon must stay decoder-exact, and the stream
    must recompress losslessly."""
    frames = _moving_frames(n=10, W=64, H=48, seed=11)
    # force some intra-fallback MBs mid-run: a hard scene change
    rng = np.random.RandomState(12)
    Y6 = rng.randint(0, 255, (48, 64)).astype(np.uint8)
    frames[6] = (Y6, frames[6][1], frames[6][2])
    W, H = 64, 48
    ref = encoder_jax.JaxEncoder(W, H, qp=30)
    want = b"".join(ref.encode_frame(*f) for f in frames)
    enc = encoder_jax.JaxEncoder(W, H, qp=30)
    got = b"".join(enc.encode_frames(frames, batch=4))
    assert got == want
    for a, b in zip(ref.recon, enc.recon):
        np.testing.assert_array_equal(a, b)
    dec = decoder_np.NpDecoder(got, error_concealment=False)
    last = None
    for fr in dec.frames():
        last = fr
    for a, b in zip(last, enc.recon):
        np.testing.assert_array_equal(a, b)
    pip, st = native.compress(got, verify=False)
    out, _ = native.decompress(pip)
    assert out == got and st.n_fallback_slices == 0


def test_batched_p_run_gop_boundaries():
    """Batched runs must respect GOP IDR placement and frame_num
    sequencing exactly as the per-frame path."""
    frames = _moving_frames(n=9, W=48, H=48, seed=13)
    ref = encoder_jax.JaxEncoder(48, 48, qp=32, gop=4)
    want = b"".join(ref.encode_frame(*f) for f in frames)
    enc = encoder_jax.JaxEncoder(48, 48, qp=32, gop=4)
    got = b"".join(enc.encode_frames(frames, batch=3))
    assert got == want


def test_force_intra_and_denoise():
    """force_intra_frame() (ISVCEncoder::ForceIntraFrame analog) inserts
    an IDR mid-stream; denoise=True preprocesses luma (denoise.cpp
    flat-region filter) and the stream still decodes/recompresses."""
    frames = _moving_frames(n=6, W=64, H=48, seed=21)
    enc = encoder_jax.JaxEncoder(64, 48, qp=30, denoise=True)
    data = b""
    for i, f in enumerate(frames):
        if i == 3:
            enc.force_intra_frame()
        data += enc.encode_frame(*f)
    # NAL type 5 (IDR slice) count: frame 0 and frame 3
    idr_nals = 0
    i = 0
    while True:
        i = data.find(b"\x00\x00\x01", i)
        if i < 0:
            break
        if data[i + 3] & 0x1F == 5:
            idr_nals += 1
        i += 3
    assert idr_nals == 2
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    assert sum(1 for _ in dec.frames()) == 6
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0
    # denoise=True must encode exactly what the flat-region filter
    # produces: equal bytes to a plain encode of the pre-filtered source
    from losslessh264_tpu import processing as proc
    rng = np.random.RandomState(22)
    noisy = (np.full((48, 64), 90) + rng.randint(-8, 9, (48, 64))) \
        .astype(np.uint8)
    U = np.full((24, 32), 100, np.uint8)
    V = np.full((24, 32), 200, np.uint8)
    den = encoder_jax.JaxEncoder(64, 48, qp=30,
                                 denoise=True).encode_frame(noisy, U, V)
    pre = np.asarray(proc.denoise(noisy))
    assert not np.array_equal(pre, noisy)  # the filter actually acted
    want = encoder_jax.JaxEncoder(64, 48, qp=30).encode_frame(pre, U, V)
    assert den == want


def test_hierarchical_temporal_layers():
    """temporal_layers=4 hierarchical-P (reference ref_list_mgr_svc up to
    4 dyadic layers): every frame predicts from its dyadic parent via
    RPLR reordering, MMCO 1 evicts stale refs, T3 frames are droppable,
    recon is decoder-exact and the stream recompresses losslessly."""
    frames = _moving_frames(n=10, W=64, H=48, seed=31)
    enc = encoder_jax.JaxEncoder(64, 48, qp=30, temporal_layers=4)
    data, recs, ref_flags = b"", [], []
    for f in frames:
        data += enc.encode_frame(*f)
        recs.append(enc.recon if enc._cur_is_ref else None)
        ref_flags.append(enc._cur_is_ref)
    # dyadic layering: odd frames (T3) are non-references
    assert ref_flags == [True, False, True, False, True, False, True,
                         False, True, False]
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == 10
    for i, rec in enumerate(recs):
        if rec is None:
            continue
        for a, b in zip(outs[i], rec):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data and st.n_fallback_slices == 0
    # droppability: strip all nal_ref_idc==0 slices -> T0..T2 stream
    # still decodes (frames 0,2,4,6,8)
    nals, i = [], 0
    while True:
        j = data.find(b"\x00\x00\x00\x01", i + 1)
        nals.append(data[i:j if j > 0 else len(data)])
        if j < 0:
            break
        i = j
    kept = b"".join(n for n in nals
                    if (n[4] >> 5) != 0 or (n[4] & 0x1F) not in (1, 5))
    dec2 = decoder_np.NpDecoder(kept, error_concealment=False)
    outs2 = list(dec2.frames())
    assert len(outs2) == 5
    for k, i in enumerate(range(0, 10, 2)):
        for a, b in zip(outs2[k], recs[i]):
            np.testing.assert_array_equal(a, b, err_msg=f"T0-T2 frame {i}")


def test_hierarchical_layers_l3_gop():
    """temporal_layers=3 with a GOP: IDRs reset the dyadic chain; parity
    with the numpy decoder on every reference frame."""
    frames = _moving_frames(n=9, W=48, H=48, seed=32)
    enc = encoder_jax.JaxEncoder(48, 48, qp=32, temporal_layers=3, gop=6)
    data, recs = b"", []
    for f in frames:
        data += enc.encode_frame(*f)
        recs.append(enc.recon if enc._cur_is_ref else None)
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == 9
    for i, rec in enumerate(recs):
        if rec is None:
            continue
        for a, b in zip(outs[i], rec):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
    pip, _ = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data


def test_scroll_me_end_to_end():
    """Vertically scrolling content with scroll_me=True: decode parity
    and emitted MVs tracking the scroll (ADVICE r2: the recentered
    dynamic_slice window and dy sign convention had no encoder-level
    coverage)."""
    rng = np.random.RandomState(11)
    H, W = 96, 64
    dy = 7
    tall = rng.randint(0, 255, (H + 5 * dy, W)).astype(np.uint8)
    tallc = rng.randint(0, 255, (H // 2 + 4 * dy, W // 2)).astype(np.uint8)
    frames = []
    for i in range(3):
        Y = tall[i * dy:i * dy + H]
        U = tallc[i * dy // 2:i * dy // 2 + H // 2]
        V = tallc[2 + i * dy // 2:2 + i * dy // 2 + H // 2]
        frames.append((np.ascontiguousarray(Y), np.ascontiguousarray(U),
                       np.ascontiguousarray(V)))
    enc = encoder_jax.JaxEncoder(W, H, qp=24, scroll_me=True)
    data = b"".join(enc.encode_frame(*f) for f in frames)
    # scroll detection must have recentered ME on the global dy
    assert enc._scroll_dy != 0
    # bit-exact decode parity through the numpy oracle decoder
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == 3
    got = outs[-1][0][:H, :W]
    psnr = 10 * np.log10(255.0 ** 2 / max(
        np.mean((got.astype(np.float64) - frames[-1][0]) ** 2), 1e-9))
    assert psnr > 32, f"scrolling content PSNR {psnr:.1f} too low"
    # emitted MVs track the scroll: content shifts up by dy rows per
    # frame, so cur[r] == prev[r + dy] and the dominant vertical MV is
    # +dy pel (ref sample = cur + mv, quarter-pel units)
    fr = list(native.SymbolDecoder(data))
    mvy = fr[-1]["mv"][:, :, 1].reshape(-1)
    med = np.median(mvy[mvy != 0]) if (mvy != 0).any() else 0
    assert abs(med / 4.0 - dy) <= 2.5, f"median MVy {med/4.0} vs dy {dy}"


def test_bgd_qp_plane_end_to_end():
    """Static background + moving foreground with bgd=True: the +QP
    background plane must roundtrip (decode parity) and not corrupt the
    static region (ADVICE r2: mb_qp write path untested with bgd)."""
    rng = np.random.RandomState(12)
    H, W = 64, 64
    bg = rng.randint(0, 255, (H, W)).astype(np.uint8)
    U = np.full((H // 2, W // 2), 100, np.uint8)
    V = np.full((H // 2, W // 2), 150, np.uint8)
    frames = []
    for i in range(3):
        Y = bg.copy()
        Y[24:40, 8 * i:8 * i + 16] = 255 - Y[24:40, 8 * i:8 * i + 16]
        frames.append((Y, U.copy(), V.copy()))
    enc = encoder_jax.JaxEncoder(W, H, qp=26, bgd=True)
    data = b"".join(enc.encode_frame(*f) for f in frames)
    dec = decoder_np.NpDecoder(data, error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == 3
    # decoded output must equal the encoder's own recon bit-exactly
    gY, gU, gV = enc.recon
    np.testing.assert_array_equal(outs[-1][0][:H, :W], gY[:H, :W])
    np.testing.assert_array_equal(outs[-1][1][:H // 2, :W // 2],
                                  gU[:H // 2, :W // 2])
