"""Rate-control modes (reference ratectl.cpp / RC_MODES,
codec_app_def.h:283-290) — controller unit tests plus the CBR
integration gate: the bitrate-mode controller must hold a target
bitrate within +/-5% over a 300-frame synthetic stream containing a
hard scene cut.
"""
import numpy as np
import pytest

from losslessh264_tpu import ratectl
from losslessh264_tpu.ratectl import (
    RateControl, TimestampRC, BufferBasedRC, ScreenContentRC)


def _synthetic_stream(n_frames, W, H, cut_at):
    """Moving textured scene with a hard cut to a different scene."""
    rng = np.random.RandomState(7)
    pad = 64
    sc1 = ((np.indices((H + pad, W + pad)).sum(0) * 3
            + rng.randint(0, 60, (H + pad, W + pad))) % 256).astype(np.uint8)
    sc2 = ((np.indices((H + pad, W + pad))[0] * 7
            + rng.randint(0, 90, (H + pad, W + pad))) % 256).astype(np.uint8)
    frames = []
    for i in range(n_frames):
        scene = sc1 if i < cut_at else sc2
        s = (i * 2) % 32
        Y = np.ascontiguousarray(scene[s:s + H, s:s + W])
        U = np.ascontiguousarray(scene[:H // 2, :W // 2])
        V = np.ascontiguousarray(scene[1:H // 2 + 1, :W // 2])
        frames.append((Y, U, V))
    return frames


@pytest.mark.slow
def test_cbr_holds_bitrate_across_scene_cut():
    """RC_BITRATE_MODE gate (VERDICT round-1 item 8): 300 frames,
    scene cut at 150, total bits within +/-5% of the target. The target
    is self-calibrated to a mid-QP operating point of the same content,
    so the controller has headroom on both sides and the test measures
    control quality, not content reachability."""
    from losslessh264_tpu.encoder_jax import JaxEncoder
    W, H, FPS = 128, 96, 30.0
    frames = _synthetic_stream(300, W, H, cut_at=150)
    probe = JaxEncoder(W, H, qp=36)
    sizes = [len(probe.encode_frame(*f)) for f in frames[:12]]
    target = float(np.median(sizes[2:])) * 8 * FPS  # steady P frames
    rc = RateControl(target, FPS, qp_init=36)
    # scene_cut detection stays off: the zero-MV SAD detector (like the
    # reference's SceneChangeDetection) classifies this content's global
    # texture motion as a cut every frame; the controller must absorb
    # the real cut at frame 150 as an expensive P frame instead
    enc = JaxEncoder(W, H, rc=rc, gop=0)
    total_bits = sum(8 * len(enc.encode_frame(*f)) for f in frames)
    achieved = total_bits / (300 / FPS)
    assert abs(achieved - target) / target < 0.05, \
        f"CBR missed: {achieved:.0f} bps vs {target:.0f} target"


def test_frame_skip_caps_buffer():
    rc = RateControl(100_000, 30.0, frame_skip=True, skip_buffer_ratio=0.5)
    # overspend: buffer grows somewhat past the skip threshold
    for _ in range(6):
        rc.frame_qp(1e6)
        rc.update(13_000)      # ~4x the per-frame budget
    assert rc.buffer > rc.skip_threshold
    skips = sum(rc.should_skip() for _ in range(20))
    assert skips > 0
    # the continual-skip cap guarantees it eventually encodes again
    assert skips < 20


def test_timestamp_rc_drains_by_wallclock():
    rc = TimestampRC(100_000, 30.0)
    rc.frame_qp(1e6, timestamp_ms=0)
    rc.update(60_000)          # waaay over budget: buffer fills
    assert rc.buffer > rc.skip_threshold
    # tiny dt: no drain worth mentioning -> skip
    assert rc.should_skip(timestamp_ms=1)
    # after a 1-second gap the buffer has drained 100k bits -> encode
    assert not rc.should_skip(timestamp_ms=1001)


def test_timestamp_rc_no_credit_banking():
    rc = TimestampRC(100_000, 30.0)
    rc.should_skip(timestamp_ms=0)
    rc.should_skip(timestamp_ms=10_000)   # long idle gap
    assert rc.buffer == 0.0               # floored, no negative credit


def test_buffer_based_servo():
    rc = BufferBasedRC(qp_init=32)
    rc.report_delivery(True)
    qps = [rc.frame_qp() for _ in range(10)]
    assert qps == sorted(qps, reverse=True), "on-time delivery relaxes QP"
    rc.report_delivery(False)
    q0 = rc.frame_qp()
    q1 = rc.frame_qp()
    assert q1 >= q0, "late delivery tightens QP"
    # scene change raises the floor
    rc2 = BufferBasedRC(qp_init=27, qp_min=26)
    rc2.report_delivery(True)
    for _ in range(5):
        rc2.frame_qp(scene_idc=ratectl.SCENE_IDC_LARGE)
    assert rc2.qp == 28  # qp_min + 2, not qp_min


def test_screen_content_rc_jumps_on_scene_change():
    rc = ScreenContentRC(500_000, 30.0, qp_init=30)
    # teach the model a stable cost density
    for _ in range(20):
        q = rc.frame_qp(1e5)
        rc.update(500_000 / 30.0)
    base = rc.frame_qp(1e5)
    rc.update(500_000 / 30.0)
    jumped = rc.frame_qp(3e6, scene_idc=ratectl.SCENE_IDC_LARGE)
    assert jumped > base + 3, "SCC jumps QP on an exploding frame"


@pytest.mark.slow
def test_encoder_skips_frame_without_state_advance():
    from losslessh264_tpu.encoder_jax import JaxEncoder
    W, H = 64, 48
    frames = _synthetic_stream(4, W, H, cut_at=99)
    rc = TimestampRC(50_000, 30.0)
    enc = JaxEncoder(W, H, rc=rc)
    out0 = enc.encode_frame(*frames[0], timestamp_ms=0)
    assert len(out0) > 0
    # cram the virtual buffer so the next non-IDR frame must drop
    rc.buffer = rc.skip_threshold * 10
    idx_before = enc.frame_idx
    out1 = enc.encode_frame(*frames[1], timestamp_ms=33)
    assert out1 == b""
    assert enc.frame_idx == idx_before, "skipped frame advances no state"
    out2 = enc.encode_frame(*frames[2], timestamp_ms=100_000)
    assert len(out2) > 0, "buffer drained by the timestamp gap"


@pytest.mark.slow
def test_skipped_stream_still_decodes():
    """A stream with dropped frames is still a valid bitstream: the
    decoder sees consecutive frame_nums (drops happen pre-encode)."""
    from losslessh264_tpu import decoder_np
    from losslessh264_tpu.encoder_jax import JaxEncoder
    W, H = 64, 48
    frames = _synthetic_stream(6, W, H, cut_at=99)
    rc = RateControl(30_000, 30.0, frame_skip=True, qp_init=40)
    enc = JaxEncoder(W, H, rc=rc)
    chunks = [enc.encode_frame(*f) for f in frames]
    data = b"".join(chunks)
    dec = decoder_np.NpDecoder(data)
    n = sum(1 for _ in dec.frames())
    assert n == sum(1 for c in chunks if c)
