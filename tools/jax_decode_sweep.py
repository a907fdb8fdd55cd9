"""Full-stream JaxDecoder (TPU pixel pipeline) parity sweep vs the
reference-decoder goldens — the TPU complement of the CPU-tier
tests/test_decode_parity.py JAX tests.

Usage: python tools/jax_decode_sweep.py [stream-name ...]
       (no args = every golden stream; prints per-stream verdict and
       writes the committed evidence artifact evidence/JAXSWEEP.json
       — `make evidence`)

Timing method (VERDICT r3 weak #5): the first pass both compiles and
checks parity; streams long enough to be worth timing then get a second,
compile-free pass whose sustained fps is recorded separately from
compile_s. Short conformance clips (< 16 frames) report parity only —
a one-shot fps on a 2-frame stream is all dispatch latency and invites
wrong conclusions.
"""
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
GOLD = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "data", "ref_yuv_crc.json")))
MIN_TIMED_FRAMES = 16


def main():
    from losslessh264_tpu import decoder_jax
    names = sys.argv[1:] or sorted(GOLD.keys())
    n_ok = n_bad = 0
    results = {}
    for name in names:
        g = GOLD[name]
        path = os.path.join(REF, g["stream"])
        if not os.path.exists(path):
            continue
        data = open(path, "rb").read()
        t0 = time.time()
        try:
            dec = decoder_jax.JaxDecoder(data)
            bad = None
            frames = 0
            for i, (Y, U, V) in enumerate(dec.frames()):
                got = zlib.crc32(np.asarray(Y).tobytes() +
                                 np.asarray(U).tobytes() +
                                 np.asarray(V).tobytes())
                frames += 1
                if got != g["crc32"][i]:
                    bad = i
                    break
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            n_bad += 1
            continue
        compile_s = time.time() - t0
        if bad is None and frames == g["frames"]:
            r = {"ok": True, "frames": frames,
                 "compile_s": round(compile_s, 1)}
            if frames >= MIN_TIMED_FRAMES:
                t0 = time.time()
                n = 0
                for Y, U, V in decoder_jax.JaxDecoder(data).frames():
                    n += 1
                np.asarray(Y)
                r["fps"] = round(n / (time.time() - t0), 2)
                print(f"OK   {name}: {frames} frames, {r['fps']} fps "
                      f"sustained (compile+parity pass {compile_s:.0f}s)")
            else:
                print(f"OK   {name}: {frames} frames (short; parity only)")
            results[name] = r
            n_ok += 1
        else:
            print(f"FAIL {name}: first mismatch frame {bad} "
                  f"(decoded {frames}/{g['frames']})")
            results[name] = {"ok": False, "mismatch_frame": bad,
                             "decoded": frames, "expect": g["frames"]}
            n_bad += 1
    print(f"{n_ok} OK, {n_bad} FAIL")
    art = os.path.join(os.path.dirname(__file__), "..", "evidence")
    os.makedirs(art, exist_ok=True)
    import jax
    with open(os.path.join(art, "JAXSWEEP.json"), "w") as fh:
        json.dump({"backend": jax.default_backend(), "ok": n_ok,
                   "fail": n_bad, "streams": results}, fh, indent=1)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
