"""Roundtrip benchmark: compress + decompress fps and compression ratio
on the reference roundtrip stream set, vs the reference's committed
baselines (BASELINE.md / walk.stats).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is roundtrip frames/s on tibby.264 (the largest
available stream — walk.264 is a stripped blob in the reference checkout);
vs_baseline compares against the reference's compress-side fps on the
same stream (103.5 fps, walk.stats:27).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from losslessh264_tpu import native  # noqa: E402

STREAM = "/root/reference/roundtriptest/tibby.264"
REF_COMPRESS_FPS = 103.5  # walk.stats:27 (tibby.264, x86-64 -O3 1 thread)
REF_SAVINGS = 0.077       # reference tibby.264 ratio (BASELINE.md)


def main():
    data = open(STREAM, "rb").read()
    # warmup + correctness
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data, "roundtrip not byte-exact"
    frames = max(1, st.n_frames)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        pip, st = native.compress(data, verify=False)
    t1 = time.perf_counter()
    for _ in range(reps):
        native.decompress(pip)
    t2 = time.perf_counter()

    compress_fps = frames * reps / (t1 - t0)
    decompress_fps = frames * reps / (t2 - t1)
    savings = 1.0 - len(pip) / len(data)

    result = {
        "metric": "roundtrip_compress_fps_tibby",
        "value": round(compress_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(compress_fps / REF_COMPRESS_FPS, 3),
        "extra": {
            "decompress_fps": round(decompress_fps, 2),
            "savings": round(savings, 4),
            "savings_vs_ref": round(savings / REF_SAVINGS, 3),
            "bytes": {"in": len(data), "pip": len(pip)},
            "encode_720p_fps": _bench_encode_720p(),
        },
    }
    print(json.dumps(result))


def _bench_encode_720p():
    """TPU encode throughput at 720p IPPP (the BASELINE config-5 analog;
    the reference's Cisco_Absolute_Power YUV is a stripped blob, so the
    content is synthetic 720p with global motion + texture)."""
    import numpy as np

    from losslessh264_tpu import encoder_jax

    rng = np.random.RandomState(1)
    W, H = 1280, 720
    base = (np.indices((H + 64, W + 64)).sum(0) % 256).astype(np.uint8)
    tex = rng.randint(0, 40, (H + 64, W + 64)).astype(np.uint8)
    scene = ((base.astype(int) + tex) % 256).astype(np.uint8)
    frames = []
    for i in range(25):
        s = i % 10
        Y = np.ascontiguousarray(scene[s * 3:s * 3 + H, s * 5:s * 5 + W])
        U = np.ascontiguousarray(scene[:H // 2, :W // 2])
        V = np.ascontiguousarray(scene[1:H // 2 + 1, 1:W // 2 + 1])
        frames.append((Y, U, V))
    enc = encoder_jax.JaxEncoder(W, H, qp=28)
    enc.encode_frame(*frames[0])    # compile I
    enc.encode_frames(frames[1:9])  # compile the K=8 scanned P program
    t0 = time.perf_counter()
    enc.encode_frames(frames[1:25])  # 3 pipelined K=8 runs
    t1 = time.perf_counter()
    return round(24 / (t1 - t0), 2)


if __name__ == "__main__":
    main()
