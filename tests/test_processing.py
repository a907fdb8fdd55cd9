"""Processing library (VAA/scene-change/AQ/downsample/...) + rate
control. Reference test model: test/processing/ProcessUT_*."""
import numpy as np

from losslessh264_tpu import processing as proc
from losslessh264_tpu import ratectl

rng = np.random.default_rng(11)


def _nal_types(data):
    out = []
    i = 0
    while True:
        i = data.find(b"\x00\x00\x01", i)
        if i < 0:
            return out
        out.append(data[i + 3] & 0x1F)
        i += 3


def test_vaa_calc_matches_numpy():
    cur = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    ref = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    v = proc.vaa_calc(cur, ref)
    c = cur.astype(np.int64)
    r = ref.astype(np.int64)
    for my in range(3):
        for mx in range(4):
            cb = c[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            rb = r[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            assert int(v.ssd16x16[my, mx]) == int(((cb - rb) ** 2).sum())
            assert int(v.sum16x16[my, mx]) == int(cb.sum())
            assert int(v.sqsum16x16[my, mx]) == int((cb * cb).sum())
            for q in range(4):
                qy, qx = divmod(q, 2)
                s = np.abs(cb[qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8]
                           - rb[qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8]).sum()
                assert int(v.sad8x8[my, mx, q]) == int(s)


def test_scene_change():
    a = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    b = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    assert proc.is_scene_change(b, a)          # random vs random: all moves
    assert not proc.is_scene_change(a, a)      # identical: none


def test_adaptive_quant_map_range_and_flat():
    cur = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ref = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    dqp, avg = proc.adaptive_quant_map(cur, ref)
    assert dqp.shape == (4, 4)
    d = np.asarray(dqp)
    assert np.all(d >= -12) and np.all(d <= 6)
    flat = np.full((64, 64), 128, np.uint8)
    dqp_f, _ = proc.adaptive_quant_map(flat, flat)
    # flat frame: no texture/motion spread -> uniform map
    assert len(np.unique(np.asarray(dqp_f))) == 1


def test_downsample_pyramid():
    x = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    pyr = proc.downsample_pyramid(x, 3)
    assert pyr[1].shape == (32, 48) and pyr[2].shape == (16, 24)
    want = ((x.astype(int).reshape(32, 2, 48, 2).sum(axis=(1, 3)) + 2) >> 2)
    np.testing.assert_array_equal(np.asarray(pyr[1]), want.astype(np.uint8))


def test_background_and_complexity():
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert int(proc.frame_complexity(a, a)) == 0
    mask = np.asarray(proc.background_mask(a, a))
    assert mask.all()  # identical frames are all background


def test_scroll_detect():
    base = rng.integers(0, 256, (200, 64)).astype(np.uint8)
    ref = base[10:138]
    cur = base[22:150]   # scrolled down by 12 rows
    det, dy = proc.scroll_detect(cur, ref, max_shift=24)
    assert bool(det) and int(dy) == 12


def test_denoise_and_rotate():
    x = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    d = np.asarray(proc.denoise(x))
    assert d.shape == x.shape
    flat = np.full((16, 16), 77, np.uint8)
    np.testing.assert_array_equal(np.asarray(proc.denoise(flat)), flat)
    np.testing.assert_array_equal(np.asarray(proc.image_rotate(x, 90)),
                                  np.rot90(x, -1))


def test_rate_control_converges():
    rc = ratectl.RateControl(bitrate_bps=400_000, fps=25, qp_init=30)
    # synthetic encoder: bits halve per +6 QP, scale with complexity
    def fake_bits(qp, cx):
        return cx * 40.0 / ratectl.qstep(qp)
    qps = []
    for i in range(60):
        qp = rc.frame_qp(1000.0, is_idr=(i == 0))
        qps.append(qp)
        rc.update(fake_bits(qp, 1000.0))
    bpf = 400_000 / 25
    tail = [fake_bits(q, 1000.0) for q in qps[-10:]]
    assert abs(np.mean(tail) - bpf) / bpf < 0.25
    assert max(abs(qps[i + 1] - qps[i]) for i in range(len(qps) - 1)) <= 3


def test_encoder_scene_cut_and_rc():
    from losslessh264_tpu import decoder_np, encoder_jax
    rng2 = np.random.RandomState(5)
    H, W = 48, 64
    scene_a = rng2.randint(0, 255, (H, W)).astype(np.uint8)
    scene_b = rng2.randint(0, 255, (H, W)).astype(np.uint8)
    U = np.full((H // 2, W // 2), 90, np.uint8)
    V = np.full((H // 2, W // 2), 160, np.uint8)
    frames = [(scene_a, U, V)] * 3 + [(scene_b, U, V)] * 2
    rc = ratectl.RateControl(bitrate_bps=200_000, fps=25, qp_init=30)
    enc = encoder_jax.JaxEncoder(W, H, qp=30, rc=rc, scene_cut=True)
    chunks = [enc.encode_frame(*f) for f in frames]
    data = b"".join(chunks)
    outs = decoder_np.decode_to_yuv(data)
    assert len(outs) == 5
    # the scene cut (frame 3) must be coded as a fresh IDR
    assert _nal_types(chunks[3])[-1] == 5
    assert _nal_types(chunks[1])[-1] == 1
