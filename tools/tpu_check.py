"""Per-round TPU verification gate (`make check-tpu`) — runs ON THE REAL
CHIP and writes the committed artifact evidence/TPUCHECK.json.

The CPU test suite (tests/conftest.py pins JAX_PLATFORMS=cpu) never
touches the TPU; round 2's Pallas wrong-pixels episode showed backend
behavior can diverge silently. This gate covers, on the real backend:

  1. deblock implementation parity — scan vs legacy-diagonal vs Pallas
     kernel, element-exact across the documented size grid
     (9x4 .. 80x45 MBs) x seeds (VERDICT r3 weak #4);
  2. JaxDecoder full-stream CRC parity on the 4 roundtriptest streams
     (tibby / black / tibbycabac / tibby8x8cavlc) vs the reference
     decoder goldens — exercises the batched scan-run decode path;
  3. batched-P encode bit-exactness — encode_frames() (one scanned
     device program per 8-frame run) must produce byte-identical output
     to per-frame encode_frame() calls.

Usage: python tools/tpu_check.py   (exit 1 on any failure)
"""
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jaxcache"))

REF = "/root/reference/roundtriptest"
RESULT = {}
FAILED = []


def _record(section, name, ok, **extra):
    RESULT.setdefault(section, {})[name] = dict(ok=bool(ok), **extra)
    print(f"{'OK  ' if ok else 'FAIL'} {section}/{name} "
          + " ".join(f"{k}={v}" for k, v in extra.items()))
    if not ok:
        FAILED.append(f"{section}/{name}")


def check_deblock():
    import jax.numpy as jnp

    from losslessh264_tpu.ops import deblock as jdb

    def run(impl, mb_w, mb_h, Yw, Uw, Vw, args):
        prev = os.environ.get("PIP_DEBLOCK")
        os.environ["PIP_DEBLOCK"] = impl
        try:
            out = jdb.deblock_frame(
                mb_w, mb_h, jnp.asarray(Yw), jnp.asarray(Uw),
                jnp.asarray(Vw), *[jnp.asarray(args[k]) for k in
                                   ("cls", "qp", "nnz", "mv", "ref_idx",
                                    "slice_id", "deblock_idc", "alpha_off",
                                    "beta_off", "transform8")], 0)
            return [np.asarray(a) for a in out]
        finally:
            if prev is None:
                os.environ.pop("PIP_DEBLOCK", None)
            else:
                os.environ["PIP_DEBLOCK"] = prev

    grid = [(9, 4), (12, 7), (22, 18), (45, 30), (80, 45)]
    for mb_w, mb_h in grid:
        for seed in (0, 1):
            rng = np.random.RandomState(seed)
            n = mb_w * mb_h
            H, W = mb_h * 16, mb_w * 16
            P = jdb.WPAD
            Yw = rng.randint(0, 256, (H + 2 * P, W + 2 * P)).astype(np.int32)
            Uw = rng.randint(0, 256,
                             (H // 2 + 2 * P, W // 2 + 2 * P)).astype(np.int32)
            Vw = rng.randint(0, 256, Uw.shape).astype(np.int32)
            args = dict(
                cls=rng.randint(0, 9, (n,)).astype(np.int32),
                qp=rng.randint(10, 52, (n,)).astype(np.int32),
                nnz=rng.randint(0, 3, (n, 16)).astype(np.int32),
                mv=rng.randint(-16, 17, (n, 16, 2)).astype(np.int32),
                ref_idx=rng.randint(0, 2, (n, 16)).astype(np.int32),
                slice_id=(np.arange(n) // (mb_w * 2)).astype(np.int32),
                deblock_idc=np.zeros((n,), np.int32),
                alpha_off=np.zeros((n,), np.int32),
                beta_off=np.zeros((n,), np.int32),
                transform8=rng.randint(0, 2, (n,)).astype(np.int32))
            base = run("legacy", mb_w, mb_h, Yw, Uw, Vw, args)
            for impl in ("scan", "pallas"):
                got = run(impl, mb_w, mb_h, Yw, Uw, Vw, args)
                same = all((a == b).all() for a, b in zip(base, got))
                bad = (0 if same else
                       int(sum(int((a != b).sum())
                               for a, b in zip(base, got))))
                _record("deblock_parity", f"{impl}_{mb_w}x{mb_h}_s{seed}",
                        same, mismatch_px=bad)


def check_decode():
    from losslessh264_tpu import decoder_jax

    gold = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                       "tests", "data",
                                       "ref_yuv_crc.json")))
    for name in ("tibby", "black", "tibbycabac", "tibby8x8cavlc"):
        g = gold[name]
        data = open(os.path.join("/root/reference", g["stream"]),
                    "rb").read()
        t0 = time.time()
        bad = None
        frames = 0
        for i, (Y, U, V) in enumerate(
                decoder_jax.JaxDecoder(data).frames()):
            got = zlib.crc32(np.asarray(Y).tobytes() +
                             np.asarray(U).tobytes() +
                             np.asarray(V).tobytes())
            frames += 1
            if got != g["crc32"][i]:
                bad = i
                break
        ok = bad is None and frames == g["frames"]
        _record("decode_parity", name, ok, frames=frames,
                mismatch_frame=bad, secs=round(time.time() - t0, 1))


def check_encode_batch():
    from losslessh264_tpu import encoder_jax

    rng = np.random.RandomState(7)
    W, H = 320, 192
    base = rng.randint(0, 256, (H + 32, W + 32)).astype(np.uint8)
    frames = []
    for i in range(12):
        Y = np.ascontiguousarray(base[i:i + H, i * 2:i * 2 + W])
        U = np.ascontiguousarray(base[:H // 2, :W // 2])
        V = np.ascontiguousarray(base[1:H // 2 + 1, :W // 2])
        frames.append((Y, U, V))
    e1 = encoder_jax.JaxEncoder(W, H, qp=30)
    ref_out = [e1.encode_frame(*f) for f in frames]
    e2 = encoder_jax.JaxEncoder(W, H, qp=30)
    got_out = [e2.encode_frame(*frames[0])] + e2.encode_frames(frames[1:])
    ok = b"".join(ref_out) == b"".join(got_out)
    _record("encode_batch_exact", "320x192_12f", ok,
            bytes=len(b"".join(ref_out)))


def main():
    import jax
    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}")
    t0 = time.time()
    check_deblock()
    check_decode()
    check_encode_batch()
    art = os.path.join(os.path.dirname(__file__), "..", "evidence")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "TPUCHECK.json"), "w") as fh:
        json.dump({"backend": backend,
                   "total_secs": round(time.time() - t0, 1),
                   "failed": FAILED, "checks": RESULT}, fh, indent=1)
    print(f"{'PASS' if not FAILED else 'FAIL'} "
          f"({time.time() - t0:.0f}s, {len(FAILED)} failures)")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
