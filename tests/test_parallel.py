"""Distributed GOP sharding (SURVEY.md §2.7/§5.8: the multi-host design
the rebuild adds — the reference has no distributed code at all)."""
import numpy as np
import pytest

from losslessh264_tpu import encoder_jax, native, parallel

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `make check-fast`


@pytest.fixture(scope="module")
def multi_gop_stream():
    rng = np.random.RandomState(21)
    H, W = 48, 64
    bg = rng.randint(0, 255, (H + 80, W + 80)).astype(np.uint8)
    frames = []
    for i in range(12):
        Y = np.ascontiguousarray(bg[i * 3:i * 3 + H, i * 4:i * 4 + W])
        U = np.full((H // 2, W // 2), 90 + i, np.uint8)
        V = np.full((H // 2, W // 2), 60, np.uint8)
        frames.append((Y, U, V))
    return encoder_jax.encode_yuv(frames, W, H, qp=26, gop=3)


def test_shard_plan_covers_input(multi_gop_stream):
    data = multi_gop_stream
    plan = native.shard_plan(data, 4)
    assert 2 <= len(plan) <= 4
    assert plan[0][0] == 0
    assert plan[-1][1] == len(data)
    for (s0, e0, _), (s1, e1, _) in zip(plan, plan[1:]):
        assert e0 == s1  # contiguous, no gaps
    # later shards carry the SPS/PPS context; the first needs none
    assert plan[0][2] == b""
    assert all(ctx for _, _, ctx in plan[1:])


def test_multihost_matches_single_host(multi_gop_stream):
    """N processes compressing strided shard subsets must assemble the
    byte-identical container a single host produces."""
    data = multi_gop_stream
    n_shards = 4
    single, _ = native.compress_sharded(data, n_shards)

    for pc in (1, 2, 3):
        payloads = {}
        for pi in range(pc):
            part = parallel.compress_multihost(data, n_shards, pi, pc)
            assert not set(part) & set(payloads)  # disjoint ownership
            payloads.update(part)
        assembled = parallel.assemble(data, payloads, n_shards)
        assert assembled == single
    out, _ = native.decompress(single)
    assert out == data


def test_assemble_rejects_missing_shard(multi_gop_stream):
    data = multi_gop_stream
    payloads = parallel.compress_multihost(data, 4, 0, 2)
    with pytest.raises(RuntimeError, match="missing shard"):
        parallel.assemble(data, payloads, 4)


def test_compress_distributed_single_process(multi_gop_stream):
    data = multi_gop_stream
    pip = parallel.compress_distributed(data, 4)
    single, _ = native.compress_sharded(data, 4)
    assert pip == single


def test_single_shard_plan_falls_back_to_plain(multi_gop_stream):
    data = multi_gop_stream
    plain, _ = native.compress(data, verify=False)
    payloads = parallel.compress_multihost(data, 1, 0, 1)
    assert parallel.assemble(data, payloads, 1) == plain


def test_corrupt_sharded_container_raises_cleanly(multi_gop_stream):
    """Truncated/corrupted PIPS must raise RuntimeError, never abort
    (a mid-spawn throw with joinable threads is std::terminate)."""
    data = multi_gop_stream
    pip, _ = native.compress_sharded(data, 4)
    assert pip[:4] == b"PIPS"
    with pytest.raises(RuntimeError):
        native.decompress(pip[: len(pip) // 2])
    bad = bytearray(pip)
    bad[len(pip) // 2] ^= 0xFF
    with pytest.raises(RuntimeError):
        native.decompress(bytes(bad))


def test_gop_parallel_decode_matches_sequential(multi_gop_stream):
    from losslessh264_tpu import decoder_np
    data = multi_gop_stream
    dec = decoder_np.NpDecoder(data)
    seq = [tuple(np.asarray(p) for p in f) for f in dec.frames()]
    par, crop = parallel.decode_yuv_gop_parallel(data, max_workers=4)
    assert crop == dec.crop_px
    assert len(par) == len(seq)
    for (a, b) in zip(par, seq):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
