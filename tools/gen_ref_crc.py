"""Regenerate tests/data/ref_yuv_crc.json: FULL-stream per-frame CRC32 of
the reference decoder's YUV output over every decodable stream.

Usage: python tools/gen_ref_crc.py [h264dec_path]

The reference binary is built out-of-tree (cp -r /root/reference /tmp/refsrc
&& make -C /tmp/refsrc -j8 libraries h264dec). For each stream we run
`h264dec in.264 /tmp/x.pip /tmp/x.yuv`, derive frame dimensions from our
own decoder's first frame, split the YUV, and CRC each frame (matching
tests/test_decode_parity.py's zlib.crc32(Y+U+V) formula). Streams the
reference cannot decode (or decodes to zero frames) are skipped with a
note. Mirrors the reference's own golden-hash test pattern
(test/api/decoder_test.cpp: full-stream SHA1 over decoded YUV).
"""
import json
import os
import subprocess
import sys
import tempfile
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "ref_yuv_crc.json")


def streams():
    for sub in ("roundtriptest", "res"):
        d = os.path.join(REF, sub)
        for f in sorted(os.listdir(d)):
            if f.endswith((".264", ".jsv", ".h264")):
                p = os.path.join(d, f)
                if os.path.getsize(p) > 64:  # skip stripped blobs
                    yield os.path.join(sub, f)


def our_dims(path):
    from losslessh264_tpu import decoder_np
    dec = decoder_np.NpDecoder(open(path, "rb").read())
    Y, U, V = next(dec.frames())
    return Y.shape[1], Y.shape[0]


def main():
    h264dec = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refsrc/h264dec"
    gold = {}
    with tempfile.TemporaryDirectory() as td:
        for rel in streams():
            path = os.path.join(REF, rel)
            name = os.path.splitext(os.path.basename(rel))[0]
            yuv = os.path.join(td, "o.yuv")
            pip = os.path.join(td, "o.pip")
            try:
                subprocess.run([h264dec, path, pip, yuv], timeout=600,
                               capture_output=True)
            except subprocess.TimeoutExpired:
                print(f"SKIP {rel}: reference decoder timeout")
                continue
            if not os.path.exists(yuv) or os.path.getsize(yuv) == 0:
                print(f"SKIP {rel}: reference produced no YUV")
                continue
            try:
                w, h = our_dims(path)
            except Exception as e:
                print(f"SKIP {rel}: our decoder failed first frame: {e}")
                continue
            fsz = w * h * 3 // 2
            data = open(yuv, "rb").read()
            os.unlink(yuv)
            if len(data) % fsz != 0:
                print(f"SKIP {rel}: YUV size {len(data)} not a multiple of "
                      f"{w}x{h} frame")
                continue
            n = len(data) // fsz
            crcs = [zlib.crc32(data[i * fsz:(i + 1) * fsz]) for i in range(n)]
            gold[name] = {"stream": rel, "w": w, "h": h, "frames": n,
                          "crc32": crcs}
            print(f"OK   {rel}: {n} frames {w}x{h}")
    with open(OUT, "w") as f:
        json.dump(gold, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(gold)} streams, "
          f"{sum(g['frames'] for g in gold.values())} frames")


if __name__ == "__main__":
    main()
