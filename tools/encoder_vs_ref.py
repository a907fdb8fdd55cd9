"""Encoder quality benchmark vs the REAL reference encoder (h264enc) at
matched QP/GOP — VERDICT r3 #5: all prior encoder evidence was
self-referential (PSNR vs own decode); this compares bytes + PSNR
side-by-side on the same sources.

Method:
  - sources: conformance streams decoded to YUV by our own validated
    decoder (tibby 320x240/94f CAVLC-era camera content, BA1_FT_C
    352x288/299f);
  - reference: h264enc built from /root/reference (welsenc.cfg analog
    with rate control OFF, fixed InitialQP, IntraPeriod 0 = IPPP,
    preprocessing/LTR/AQ off, single slice, CAVLC, 1 thread) — the
    closest configuration to our encoder's fixed-QP IPPP mode;
  - ours: JaxEncoder(qp=QP) IPPP over the same frames;
  - both outputs decoded by OUR decoder (bit-exact vs the reference
    decoder on the 40-stream golden corpus) and PSNR'd against the
    source YUV.

Writes evidence/ENCVSREF.json; bench.py embeds it as
extra["encoder_vs_ref"].
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jaxcache"))

REFSRC = "/root/reference"
BUILD = "/tmp/refbuild"
QP = 28

SOURCES = [
    ("tibby", "roundtriptest/tibby.264", 320, 240),
    ("ba1", "res/BA1_FT_C.264", 352, 288),
]


def build_ref_encoder():
    enc = os.path.join(BUILD, "h264enc")
    if os.path.exists(enc):
        return enc
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(f"cp -r {REFSRC}/* {BUILD}/", shell=True, check=True)
    subprocess.run(["make", "h264enc", "-j2"], cwd=BUILD, check=True,
                   capture_output=True)
    return enc


def decode_to_yuv(path):
    from losslessh264_tpu import decoder_np
    frames = []
    for Y, U, V in decoder_np.NpDecoder(open(path, "rb").read()).frames():
        frames.append((Y.copy(), U.copy(), V.copy()))
    return frames


def write_yuv(frames, path):
    with open(path, "wb") as fh:
        for Y, U, V in frames:
            fh.write(Y.tobytes())
            fh.write(U.tobytes())
            fh.write(V.tobytes())


def psnr(frames_a, frames_b):
    se = 0.0
    n = 0
    for (ya, ua, va), (yb, ub, vb) in zip(frames_a, frames_b):
        for a, b in zip((ya, ua, va), (yb, ub, vb)):
            d = a.astype(np.float64) - b.astype(np.float64)
            se += float((d * d).sum())
            n += d.size
    mse = se / max(n, 1)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def run_reference(enc, name, yuv_path, W, H, n_frames):
    cfg = os.path.join("/tmp", f"enc_{name}.cfg")
    lcfg = os.path.join("/tmp", f"enc_{name}_layer.cfg")
    out264 = os.path.join("/tmp", f"ref_{name}.264")
    with open(cfg, "w") as fh:
        fh.write(f"""UsageType 0
SourceWidth {W}
SourceHeight {H}
InputFile {yuv_path}
OutputFile {out264}
MaxFrameRate 30
FramesToBeEncoded {n_frames}
TemporalLayerNum 1
IntraPeriod 0
EnableSpsPpsIDAddition 0
EnableFrameCropping 1
EntropyCodingModeFlag 0
MaxNalSize 0
LoopFilterDisableIDC 0
LoopFilterAlphaC0Offset 0
LoopFilterBetaOffset 0
MultipleThreadIdc 1
RCMode -1
TargetBitrate 5000
MaxOverallBitrate 0
EnableFrameSkip 0
EnableDenoise 0
EnableSceneChangeDetection 0
EnableBackgroundDetection 0
EnableAdaptiveQuantization 0
EnableLongTermReference 0
LtrMarkPeriod 30
PrefixNALAddingCtrl 0
NumLayers 1
LayerCfg {lcfg}
""")
    with open(lcfg, "w") as fh:
        fh.write(f"""FrameWidth {W}
FrameHeight {H}
FrameRateOut 30
ReconFile /dev/null
ProfileIdc 66
InitialQP {QP}
SpatialBitrate 600
MaxSpatialBitrate 0
SliceMode 0
SliceSize 1500
SliceNum 1
""")
    t0 = time.time()
    r = subprocess.run([enc, cfg], cwd="/tmp", capture_output=True,
                       text=True, timeout=600)
    dt = time.time() - t0
    if not os.path.exists(out264):
        raise RuntimeError(f"h264enc failed: {r.stdout[-500:]} "
                           f"{r.stderr[-500:]}")
    return open(out264, "rb").read(), dt


def run_ours(frames, W, H, qp):
    from losslessh264_tpu import encoder_jax
    enc = encoder_jax.JaxEncoder(W, H, qp=qp)
    t0 = time.time()
    out = [enc.encode_frame(*frames[0])]
    out += enc.encode_frames(frames[1:])
    return b"".join(out), time.time() - t0


def main():
    enc = build_ref_encoder()
    result = {"qp": QP, "config": "IPPP fixed-QP, CAVLC, single slice, "
              "preprocessing off, loop filter on", "streams": {}}
    for name, rel, W, H in SOURCES:
        src = decode_to_yuv(os.path.join(REFSRC, rel))
        yuv_path = os.path.join("/tmp", f"src_{name}.yuv")
        write_yuv(src, yuv_path)
        ref_bytes, ref_s = run_reference(enc, name, yuv_path, W, H,
                                         len(src))
        ref_dec = decode_to_yuv_bytes(ref_bytes)
        ref_p = psnr(src, ref_dec)
        # our rate-distortion curve: the reference at the same nominal
        # QP lands at a lower PSNR (deadzone quant / psy rounding), so
        # the honest comparison is BITS AT EQUAL PSNR — sweep our QP
        # around it and interpolate our bits at the reference's PSNR
        pts = []
        for q in (QP, QP + 1, QP + 2, QP + 3):
            ob, osec = run_ours(src, W, H, q)
            op = psnr(src, decode_to_yuv_bytes(ob))
            pts.append({"qp": q, "bytes": len(ob),
                        "psnr": round(op, 3),
                        "fps_incl_compile": round(len(src) / osec, 1)})
        # linear interpolation of log(bits) over psnr
        import math
        eq_bits = None
        for a, b in zip(pts, pts[1:]):
            lo, hi = min(a["psnr"], b["psnr"]), max(a["psnr"], b["psnr"])
            if lo <= ref_p <= hi and hi > lo:
                t = (ref_p - a["psnr"]) / (b["psnr"] - a["psnr"])
                eq_bits = math.exp(
                    math.log(a["bytes"]) * (1 - t)
                    + math.log(b["bytes"]) * t)
                break
        r = {
            "frames": len(src),
            "ref_bytes": len(ref_bytes),
            "ref_psnr": round(ref_p, 3),
            "ref_fps": round(len(src) / ref_s, 1),
            "ours": pts,
            "ours_bytes_at_ref_psnr": (round(eq_bits)
                                       if eq_bits else None),
            "bytes_ratio_at_equal_psnr": (
                round(eq_bits / len(ref_bytes), 3) if eq_bits else None),
        }
        result["streams"][name] = r
        print(name, json.dumps(r))
    art = os.path.join(ROOT, "evidence")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "ENCVSREF.json"), "w") as fh:
        json.dump(result, fh, indent=1)


def decode_to_yuv_bytes(data):
    from losslessh264_tpu import decoder_np
    return [(Y.copy(), U.copy(), V.copy())
            for Y, U, V in decoder_np.NpDecoder(data).frames()]


if __name__ == "__main__":
    main()
