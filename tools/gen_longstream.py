"""Generate the long-stream gate: a walk.264 analog (>=1000 frames,
640x352, global motion + texture + periodic IDRs + scene cuts) encoded
by our own encoder, committed as tests/data/walk_analog.264.

The reference's largest roundtrip gate is walk.264 (640x352, 1331
frames, walk.stats:796-945), which is a stripped blob in this checkout —
this stream substitutes a comparable long-stream roundtrip + perf gate.

Run on the TPU box: python tools/gen_longstream.py
"""
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from losslessh264_tpu import encoder_jax  # noqa: E402

W, H = 640, 352
N_FRAMES = 1000
GOP = 100
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "walk_analog.264")


def scene(seed, phase):
    rng = np.random.RandomState(seed)
    pad = 96
    yy, xx = np.indices((H + pad, W + pad))
    base = ((yy * (2 + phase) + xx * 3) // 3 % 220).astype(np.int64)
    tex = rng.randint(0, 24, (H + pad, W + pad))
    cyy, cxx = np.indices((H // 2 + pad, W // 2 + pad))
    cbase = ((cyy * 2 + cxx * (1 + phase)) // 4 % 160 + 48).astype(np.int64)
    ctex = rng.randint(0, 10, (H // 2 + pad, W // 2 + pad))
    return ((base + tex) % 256).astype(np.uint8), \
        ((cbase + ctex) % 256).astype(np.uint8)


def frames():
    scenes = [scene(s, s % 3) for s in range(4)]
    for i in range(N_FRAMES):
        sy, sc = scenes[(i // 280) % 4]     # scene cut every 280 frames
        # walking-camera motion: smooth pan + slight bob
        dx = int(40 + 30 * np.sin(i * 0.03)) + (i % 7)
        dy = int(20 + 15 * np.sin(i * 0.011 + 1))
        Y = np.ascontiguousarray(sy[dy:dy + H, dx:dx + W])
        U = np.ascontiguousarray(sc[dy // 2:dy // 2 + H // 2,
                                    dx // 2:dx // 2 + W // 2])
        V = np.ascontiguousarray(sc[dy // 2 + 1:dy // 2 + 1 + H // 2,
                                    dx // 2 + 2:dx // 2 + 2 + W // 2])
        yield Y, U, V


def main():
    enc = encoder_jax.JaxEncoder(W, H, qp=36, gop=GOP)
    out = b"".join(enc.encode_frames(list(frames())))
    with open(OUT, "wb") as f:
        f.write(out)
    print(f"{OUT}: {len(out)} bytes, {N_FRAMES} frames, "
          f"sha256 {hashlib.sha256(out).hexdigest()}")


if __name__ == "__main__":
    main()
