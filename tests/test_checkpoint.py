"""Checkpoint/resume compression (SURVEY.md §5.4: the rebuild makes the
resumable state explicit; the reference has none)."""
import numpy as np
import pytest

from losslessh264_tpu import checkpoint, encoder_jax, native

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


@pytest.fixture(scope="module")
def multi_gop_stream():
    rng = np.random.RandomState(9)
    H, W = 48, 64
    bg = rng.randint(0, 255, (H + 64, W + 64)).astype(np.uint8)
    frames = []
    for i in range(8):
        Y = np.ascontiguousarray(bg[i * 4:i * 4 + H, i * 5:i * 5 + W])
        U = np.full((H // 2, W // 2), 100, np.uint8)
        V = np.full((H // 2, W // 2), 60, np.uint8)
        frames.append((Y, U, V))
    return encoder_jax.encode_yuv(frames, W, H, qp=28, gop=2)


def test_gop_starts(multi_gop_stream):
    starts = native.gop_starts(multi_gop_stream)
    assert starts[0] == 0
    assert len(starts) == 4  # gop=2 over 8 frames -> 4 IDR segments
    assert starts == sorted(starts)


def test_checkpoint_resume_roundtrip(multi_gop_stream, tmp_path):
    data = multi_gop_stream
    cc = checkpoint.CheckpointedCompressor(data, str(tmp_path))
    n = len(cc.ranges)
    assert n == 4
    # "crash" after two segments
    assert cc.run(max_segments=2) == 2
    assert len(cc.pending()) == n - 2
    with pytest.raises(RuntimeError):
        cc.assemble()
    # resume in a new instance (fresh process analog)
    cc2 = checkpoint.CheckpointedCompressor(data, str(tmp_path))
    assert len(cc2.pending()) == n - 2
    assert cc2.run() == n - 2
    pip = cc2.assemble()
    out, _ = native.decompress(pip)
    assert out == data
    # idempotent: nothing left to do
    assert cc2.run() == 0


def test_checkpoint_detects_corrupt_segment(multi_gop_stream, tmp_path):
    data = multi_gop_stream
    cc = checkpoint.CheckpointedCompressor(data, str(tmp_path))
    cc.run()
    # truncate one finished segment -> it must be detected and redone
    p = cc._seg_path(1)
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[: len(blob) // 2])
    assert cc.pending() == [1]
    cc.run()
    out, _ = native.decompress(cc.assemble())
    assert out == data
