"""Spatial simulcast layers (the reference's SEncParamExt spatial
scalability, AVC-compatible mode): per-layer decodability, interleaved
access units, lossless recompression with per-resolution temporal
priors (engine fi_pool)."""
import pytest

import numpy as np

from losslessh264_tpu import decoder_np, native
from losslessh264_tpu.simulcast import SimulcastEncoder

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


def _frames(n=5, W=96, H=64, seed=9):
    rng = np.random.RandomState(seed)
    bg = rng.randint(0, 255, (H + 32, W + 32)).astype(np.uint8)
    out = []
    for i in range(n):
        Y = np.ascontiguousarray(bg[i * 2:i * 2 + H, i * 3:i * 3 + W])
        U = np.full((H // 2, W // 2), 90 + i, np.uint8)
        V = np.full((H // 2, W // 2), 170, np.uint8)
        out.append((Y, U, V))
    return out


def test_simulcast_two_layers():
    frames = _frames()
    sim = SimulcastEncoder(96, 64, spatial_layers=2, qp=30)
    assert sim.dims == [(48, 32), (96, 64)]
    layer_bytes = [b"", b""]
    combined = b""
    for f in frames:
        parts = sim.encode_frame_layers(*f)
        for i, p in enumerate(parts):
            layer_bytes[i] += p
        combined += b"".join(parts)
    # every layer is a standalone AVC stream with its own SPS/PPS id
    for i, (w, h) in enumerate(sim.dims):
        dec = decoder_np.NpDecoder(layer_bytes[i], error_concealment=False)
        outs = list(dec.frames())
        assert len(outs) == len(frames)
        assert outs[0][0].shape == (h, w)
        for a, b in zip(outs[-1], sim.encs[i].recon):
            np.testing.assert_array_equal(a, b, err_msg=f"layer {i}")
    # the interleaved stream recompresses losslessly; the engine keeps
    # one temporal-prior store per resolution so the alternation does
    # not reset the PAST model every frame
    pip, st = native.compress(combined, verify=False)
    out, _ = native.decompress(pip)
    assert out == combined and st.n_fallback_slices == 0
    assert st.n_frames == 2 * len(frames)


def test_simulcast_three_layers_combined_decode():
    """3 dyadic layers; the combined stream parses as alternating
    resolutions (AU boundaries detected on pps_id switches)."""
    frames = _frames(n=3, W=128, H=64, seed=10)
    sim = SimulcastEncoder(128, 64, spatial_layers=3, qp=32)
    assert sim.dims == [(32, 16), (64, 32), (128, 64)]
    data = b"".join(sim.encode_frame(*f) for f in frames)
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data
    assert st.n_frames == 3 * len(frames)


def test_inter_layer_prediction_beats_simulcast():
    """inter_layer=True codes enhancement layers in the residual domain
    vs the upsampled base recon (the reference's SVC inter-layer intra +
    residual prediction, svc_mode_decision.cpp): on correlated content
    the enhancement stream must be measurably smaller than independent
    simulcast, the bundle must recompress losslessly, and the
    SimulcastDecoder recombination must reach sane fidelity."""
    from losslessh264_tpu.simulcast import SimulcastDecoder

    # smooth, cross-scale-correlated content (gradients + slow motion).
    # NB: no %256 wraps — a wrap edge saturates the inter-layer residual
    # and the per-MB mode decision rightly falls those MBs back to
    # source coding (the point of the adaptive mode), which is not what
    # this test measures.
    H, W = 64, 96
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(4):
        Y = ((xx * 2 + yy) // 2 + i * 3).astype(np.uint8)
        U = (xx // 2 + 64)[:H // 2, :W // 2].astype(np.uint8)
        V = (yy + 128)[:H // 2, :W // 2].astype(np.uint8)
        frames.append((Y, U, V))

    enh_plain = b""
    sim = SimulcastEncoder(W, H, spatial_layers=2, qp=30)
    for f in frames:
        enh_plain += sim.encode_frame_layers(*f)[1]

    ilp = SimulcastEncoder(W, H, spatial_layers=2, qp=30, inter_layer=True)
    base_il, enh_il = b"", b""
    for f in frames:
        parts = ilp.encode_frame_layers(*f)
        base_il += parts[0]
        enh_il += parts[1]

    assert len(enh_il) < 0.8 * len(enh_plain), \
        f"ILP enhancement {len(enh_il)} vs simulcast {len(enh_plain)}"

    # both layer streams are plain AVC: lossless recompression holds
    for blob in (base_il, enh_il):
        pip, _ = native.compress(blob, verify=False)
        out, _ = native.decompress(pip)
        assert out == blob

    # receiver recombination fidelity
    dec = SimulcastDecoder([base_il, enh_il], error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == len(frames)
    got = outs[-1][0]
    ref = frames[-1][0]
    mse = np.mean((got.astype(np.float64) - ref) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30, f"ILP recombination PSNR {psnr:.1f}"


def test_inter_layer_saturated_content_parity():
    """High-contrast content whose residual saturates: the old
    whole-frame clip(resid+128) silently flattened it (ADVICE r3). The
    per-MB mode plane must fall such MBs back to source coding, making
    ILP pixel-identical to plain simulcast there — and never worse."""
    from losslessh264_tpu.simulcast import SimulcastDecoder

    H, W = 64, 96
    rng = np.random.RandomState(3)
    # checkerboard of 0/255 16px tiles: downsampling+upsampling the base
    # makes mid-grey predictions, so residuals reach +-255 everywhere
    yy, xx = np.mgrid[0:H, 0:W]
    board = (((yy // 16) + (xx // 16)) % 2 * 255).astype(np.uint8)
    frames = []
    for i in range(3):
        Y = np.roll(board, i, axis=1)
        U = np.full((H // 2, W // 2), 60, np.uint8)
        V = ((xx[:H // 2, :W // 2] // 8 % 2) * 255).astype(np.uint8)
        frames.append((Y, np.ascontiguousarray(U),
                       np.ascontiguousarray(V)))

    def fidelity(enc):
        streams = [b"", b""]
        for f in frames:
            for i, p in enumerate(enc.encode_frame_layers(*f)):
                streams[i] += p
        dec = SimulcastDecoder(streams, error_concealment=False)
        outs = list(dec.frames())
        assert len(outs) == len(frames)
        se = n = 0
        for (gy, gu, gv), (sy, su, sv) in zip(outs, frames):
            for a, b in ((gy, sy), (gu, su), (gv, sv)):
                d = a.astype(np.float64) - b.astype(np.float64)
                se += (d * d).sum()
                n += d.size
        return 10 * np.log10(255 ** 2 / max(se / n, 1e-9))

    plain = fidelity(SimulcastEncoder(W, H, spatial_layers=2, qp=30))
    ilp = fidelity(SimulcastEncoder(W, H, spatial_layers=2, qp=30,
                                    inter_layer=True))
    # saturating MBs take source mode, so ILP fidelity tracks plain
    # simulcast instead of collapsing (whole-frame residual clip lost
    # ~all contrast here: the old path measured far below this)
    assert ilp >= plain - 0.1, (ilp, plain)


def test_ilp_decide_cost_not_variance():
    """VERDICT r4 #6: the per-MB mode decision must be grounded in coded
    cost, not variance.  Adversarial MB pair where the two disagree:
    - source = flat 16x16 tiles at 64/192 -> HIGH variance, ZERO
      DC-excluded SATD (codes for almost nothing);
    - residual = pixel-scale +-24 checkerboard -> LOW variance, HIGH
      SATD (expensive to code).
    Variance picks residual (wrong); cost must pick source."""
    from losslessh264_tpu.simulcast import SimulcastEncoder

    H, W = 32, 32
    yy, xx = np.mgrid[0:H, 0:W]
    src_y = (((yy // 16) + (xx // 16)) % 2 * 128 + 64).astype(np.uint8)
    # prediction that leaves a pixel-scale checkerboard residual
    checker = ((yy + xx) % 2 * 48 - 24)
    pred_y = np.clip(src_y.astype(np.int32) - checker, 0, 255) \
        .astype(np.uint8)
    flatc = np.full((H // 2, W // 2), 128, np.uint8)
    src = (src_y, flatc, flatc)
    pred = (pred_y, flatc, flatc)

    ry = src_y.astype(np.float64) - pred_y.astype(np.float64)
    assert ry.var() < src_y.astype(np.float64).var()  # variance disagrees
    mask = SimulcastEncoder._ilp_decide(src, pred)
    assert not mask.any(), "cost-based decision must choose source mode"

    # and on genuinely cheap residuals it still chooses residual mode
    smooth_pred = np.clip(src_y.astype(np.int32) - 2, 0, 255) \
        .astype(np.uint8)
    mask2 = SimulcastEncoder._ilp_decide(src, (smooth_pred, flatc, flatc))
    assert mask2.all()


def test_ilp_adversarial_content_not_worse_than_simulcast():
    """Structured high-contrast content where variance and coded cost
    disagree (VERDICT r4 #6): the cost-based per-MB decision must keep
    the ILP enhancement stream within simulcast's size, and fidelity
    must not collapse."""
    from losslessh264_tpu.simulcast import SimulcastDecoder

    H, W = 64, 96
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(3):
        # MB-aligned flat tiles (zero AC) at medium contrast: the
        # up(base) residual is edge ringing - low variance, high SATD
        Y = ((((yy // 16) + ((xx + i * 16) // 16)) % 2) * 128 + 64) \
            .astype(np.uint8)
        U = np.full((H // 2, W // 2), 96, np.uint8)
        V = np.full((H // 2, W // 2), 160, np.uint8)
        frames.append((Y, U, V))

    def psnr_y(outs):
        se = n = 0
        for (gy, gu, gv), (sy, su, sv) in zip(outs, frames):
            d = gy.astype(np.float64) - sy.astype(np.float64)
            se += (d * d).sum()
            n += d.size
        return 10 * np.log10(255 ** 2 / max(se / n, 1e-9))

    def run(enc):
        streams = [b"", b""]
        for f in frames:
            for i, p in enumerate(enc.encode_frame_layers(*f)):
                streams[i] += p
        if enc.inter_layer:
            dec = SimulcastDecoder(streams, error_concealment=False)
            outs = list(dec.frames())
        else:  # plain simulcast: the enhancement stream IS the display
            d = decoder_np.NpDecoder(streams[1], error_concealment=False)
            outs = [(y, u, v) for y, u, v in d.frames()]
        return len(streams[1]), psnr_y(outs)

    plain_b, plain_p = run(SimulcastEncoder(W, H, spatial_layers=2, qp=30))
    ilp_b, ilp_p = run(SimulcastEncoder(W, H, spatial_layers=2, qp=30,
                                        inter_layer=True))
    # the cost decision must fall back to source coding here, so the
    # only size delta allowed is the per-AU SEI mode-plane overhead
    assert ilp_b <= plain_b + 64 * len(frames), (ilp_b, plain_b)
    assert ilp_p >= plain_p - 0.1, (ilp_p, plain_p)


def test_inter_layer_non_mb_aligned_dims():
    """ADVICE r4 (medium): 200x120 passes the dyadic asserts but is not
    a multiple of 16 -> the per-MB ILP mask must cover partial edge MBs
    (ceil grid + edge padding) on both encoder and decoder sides."""
    from losslessh264_tpu.simulcast import SimulcastDecoder

    H, W = 120, 200
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(3):
        Y = ((xx + yy + i * 2) // 2).astype(np.uint8)
        U = (xx[:H // 2, :W // 2] // 4 + 60).astype(np.uint8)
        V = np.full((H // 2, W // 2), 140, np.uint8)
        frames.append((Y, np.ascontiguousarray(U), V))

    enc = SimulcastEncoder(W, H, spatial_layers=2, qp=30,
                           inter_layer=True)
    streams = [b"", b""]
    for f in frames:
        for i, p in enumerate(enc.encode_frame_layers(*f)):
            streams[i] += p
    dec = SimulcastDecoder(streams, error_concealment=False)
    outs = list(dec.frames())
    assert len(outs) == len(frames)
    assert outs[0][0].shape == (H, W)
    got = outs[-1][0].astype(np.float64)
    ref = frames[-1][0].astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((got - ref) ** 2), 1e-9))
    assert psnr > 30, psnr
