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
    names = [a for a in sys.argv[1:] if a != "synth720p"] \
        or (sorted(GOLD.keys()) if not sys.argv[1:] else [])
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
    # 720p-class serving stream (VERDICT r4 #1: the sweep must carry a
    # 720p row so the serving number lands in committed healthy-state
    # evidence). tests/data/synth720p.264 is a committed JaxEncoder
    # encode of the bench's 720p content (global motion + texture luma,
    # mild chroma); its CRCs come from NpDecoder at runtime (NpDecoder
    # is golden-validated against the reference decoder on the corpus),
    # so no stored golden can go stale.
    s720 = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "data", "synth720p.264")
    if (not sys.argv[1:] or "synth720p" in sys.argv[1:]) \
            and os.path.exists(s720):
        from losslessh264_tpu import decoder_np
        data = open(s720, "rb").read()
        want = [zlib.crc32(np.asarray(Y).tobytes()
                           + np.asarray(U).tobytes()
                           + np.asarray(V).tobytes())
                for Y, U, V in decoder_np.NpDecoder(data).frames()]
        t0 = time.time()
        got = []
        for Y, U, V in decoder_jax.JaxDecoder(data).frames():
            got.append(zlib.crc32(np.asarray(Y).tobytes()
                                  + np.asarray(U).tobytes()
                                  + np.asarray(V).tobytes()))
        compile_s = time.time() - t0
        if got == want:
            t0 = time.time()
            n = 0
            for Y, U, V in decoder_jax.JaxDecoder(data).frames():
                n += 1
            np.asarray(Y)
            fps = round(n / (time.time() - t0), 2)
            print(f"OK   synth720p: {n} frames, {fps} fps sustained "
                  f"(compile+parity pass {compile_s:.0f}s)")
            results["synth720p"] = {"ok": True, "frames": n, "fps": fps,
                                    "compile_s": round(compile_s, 1)}
            n_ok += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(got, want))
                       if a != b) if want != got[:len(want)] else None
            print(f"FAIL synth720p: first mismatch frame {bad}")
            results["synth720p"] = {"ok": False, "mismatch_frame": bad}
            n_bad += 1

    print(f"{n_ok} OK, {n_bad} FAIL")
    art = os.path.join(os.path.dirname(__file__), "..", "evidence")
    os.makedirs(art, exist_ok=True)
    import jax

    # same-run machine probe: decode rows are uninterpretable without it
    import bench as _b
    probe = round(_b._probe_gbps(), 2)
    path_out = os.path.join(art, "JAXSWEEP.json")
    # partial (arg-listed) runs MERGE into the existing artifact instead
    # of clobbering the full-sweep record; per-stream probe rides along
    # so mixed-state rows stay interpretable
    doc = {"backend": jax.default_backend(), "streams": {}}
    if sys.argv[1:] and os.path.exists(path_out):
        doc = json.load(open(path_out))
        for r in results.values():
            r["machine_probe_gbps"] = probe
    doc["streams"].update(results)
    doc["ok"] = sum(1 for r in doc["streams"].values() if r.get("ok"))
    doc["fail"] = sum(1 for r in doc["streams"].values()
                      if not r.get("ok"))
    doc["machine_probe_gbps"] = probe
    doc["degraded"] = probe < 1.0
    with open(path_out, "w") as fh:
        json.dump(doc, fh, indent=1)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
