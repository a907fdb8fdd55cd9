"""CLI — the equivalent of the reference's one-binary `h264dec` driver
(codec/console/dec/h264dec.cpp:167-177: direction chosen by file type).

  python -m losslessh264_tpu in.264 out.pip    # compress
  python -m losslessh264_tpu in.pip out.264    # decompress
  python -m losslessh264_tpu roundtrip in.264  # compress+decompress+diff
  python -m losslessh264_tpu encode in.yuv WxH out.264 [--qp N]
                                               # TPU encode (I420 input;
                                               # the h264enc equivalent)
  python -m losslessh264_tpu decode in.264 out.yuv [--jax]
                                               # decode to I420 (SPS crop
                                               # applied; the reference
                                               # h264dec's YUV output)

Like the reference, direction is inferred: .pip input (magic "PIPT")
decompresses, anything else compresses.
"""
from __future__ import annotations

import argparse
import sys
import time

from . import native


def print_billing(st, in_bytes, out_bytes):
    """Feature | Bench | Ours | delta table (reference parity:
    analyze_billing.py rendering of the dual BILL_BITS/pip ledgers).
    Bench = bytes the original H.264 spent per feature; Ours = bytes the
    .pip spends. Both columns sum to their exact file sizes."""
    bench = st.bench or {}
    bill = st.bill or {}
    prior = st.prior or {}
    keys = sorted(set(bench) | set(bill),
                  key=lambda k: -(bench.get(k, 0) + bill.get(k, 0)))
    print(f"  {'feature':<12} {'bench':>10} {'ours':>10} {'delta':>9} "
          f"{'share':>6} {'hit%':>6}")
    tb = to_ = 0.0
    for k in keys:
        b = bench.get(k, 0) / 8.0
        o = bill.get(k, 0) / 8.0
        tb += b
        to_ += o
        tot, hits = prior.get(k, (0, 0))
        hit = f"{100*hits/tot:>5.1f}%" if tot else "     -"
        print(f"  {k:<12} {b:>10.0f} {o:>10.0f} {o-b:>+9.0f} "
              f"{100*o/out_bytes:>5.1f}% {hit}")
    print(f"  {'TOTAL':<12} {tb:>10.0f} {to_:>10.0f} {to_-tb:>+9.0f}")
    if round(tb) != in_bytes or round(to_) != out_bytes:
        print(f"  WARNING: ledger totals ({tb:.0f}/{to_:.0f}) != file sizes "
              f"({in_bytes}/{out_bytes})", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="losslessh264_tpu",
        description="Lossless H.264 recompression (Pied-Piper class), TPU-native rebuild",
    )
    ap.add_argument("input",
                    help="input file (.264 or .pip), 'roundtrip' or 'encode'")
    ap.add_argument("output", nargs="?", help="output file")
    ap.add_argument("extra", nargs="*",
                    help="encode mode: WxH out.264")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip compress-time roundtrip verification")
    ap.add_argument("--stats", action="store_true", help="print stats to stderr")
    ap.add_argument("--billing", action="store_true",
                    help="print per-feature compressed-size billing "
                         "(reference parity: analyze_billing.py)")
    ap.add_argument("--qp", type=int, default=28, help="encode QP")
    ap.add_argument("--gop", type=int, default=0,
                    help="encode GOP length (0 = single IDR)")
    ap.add_argument("--bitrate", type=float, default=0,
                    help="encode target bitrate (bps; enables rate control)")
    ap.add_argument("--fps", type=float, default=25.0, help="encode fps (RC)")
    ap.add_argument("--cabac", action="store_true",
                    help="encode with CABAC entropy coding")
    ap.add_argument("--aq", action="store_true",
                    help="encode with per-MB adaptive quantization")
    ap.add_argument("--denoise", action="store_true",
                    help="encode with luma denoise preprocessing")
    ap.add_argument("--spatial-layers", type=int, default=1,
                    help="encode N dyadic spatial simulcast layers "
                         "(each an independent AVC stream with its own "
                         "SPS/PPS id, interleaved low-res first)")
    ap.add_argument("--refs", type=int, default=1,
                    help="encode with N reference frames (1 or 2)")
    ap.add_argument("--slices", type=int, default=1,
                    help="encode with N row-aligned slices per frame")
    ap.add_argument("--temporal-layers", type=int, default=1,
                    help="encode with N dyadic temporal layers (1-4; "
                         "top-layer frames are droppable non-references; "
                         "3/4 use hierarchical-P with RPLR/MMCO)")
    ap.add_argument("--jax", action="store_true",
                    help="decode mode: use the TPU (JAX) pixel pipeline "
                         "instead of the numpy oracle")
    ap.add_argument("--shards", type=int, default=1,
                    help="compress GOP-sharded into N independent model/"
                         "stream sets (parallel; the multi-host unit)")
    args = ap.parse_args(argv)

    if args.input == "decode":
        if not args.output or len(args.extra) != 1:
            ap.error("decode mode: decode in.264 out.yuv")
        import numpy as np

        from . import decoder_np as dnp
        data = open(args.output, "rb").read()
        dec = (__import__("losslessh264_tpu.decoder_jax", fromlist=["x"])
               .JaxDecoder(data) if args.jax else dnp.NpDecoder(data))
        t0 = time.perf_counter()
        n_frames = 0
        with open(args.extra[0], "wb") as fh:
            for yuv in dec.frames():
                yuv = tuple(np.asarray(p) for p in yuv)
                Y, U, V = dnp.crop_yuv(yuv, dec.crop_px)
                fh.write(Y.tobytes())
                fh.write(U.tobytes())
                fh.write(V.tobytes())
                n_frames += 1
        t1 = time.perf_counter()
        if args.stats:
            print(f"decoded {n_frames} frames "
                  f"({n_frames/(t1-t0):.1f} fps)", file=sys.stderr)
        return 0

    if args.input == "parse":
        # parse-only decode (reference ISVCDecoder::DecodeParser):
        # per-AU NAL inventory + header facts, no pixel reconstruction
        if not args.output:
            ap.error("parse mode: parse in.264")
        from .parse import DecodeParser
        data = open(args.output, "rb").read()
        n = 0
        for au in DecodeParser(data):
            kinds = ",".join(str(t) for t, _ in au.nals)
            print(f"AU {n}: {len(au.annexb)} bytes, nal_types [{kinds}]"
                  f"{' IDR' if au.is_idr else ''} "
                  f"{au.width}x{au.height}")
            n += 1
        print(f"{n} access units")
        return 0

    if args.input == "encode":
        if not args.output or len(args.extra) != 2:
            ap.error("encode mode: encode in.yuv WxH out.264")
        yuv_path, dims, out_path = args.output, args.extra[0], args.extra[1]
        W, H = (int(v) for v in dims.lower().split("x"))
        import numpy as np

        from . import encoder_jax, ratectl
        fsz = W * H * 3 // 2
        raw = open(yuv_path, "rb").read()
        n_frames = len(raw) // fsz
        if n_frames == 0:
            ap.error(f"input smaller than one {dims} I420 frame")
        rc = (ratectl.RateControl(args.bitrate, args.fps, qp_init=args.qp)
              if args.bitrate else None)
        enc_kw = dict(qp=args.qp, gop=args.gop, rc=rc,
                      scene_cut=args.gop == 0,
                      cabac=args.cabac, aq=args.aq,
                      temporal_layers=args.temporal_layers,
                      gom_rc=rc is not None,
                      refs=args.refs, slices=args.slices,
                      denoise=args.denoise)
        if args.spatial_layers > 1:
            from .simulcast import SimulcastEncoder
            # one RateControl instance cannot be shared across layers
            enc_kw.update(rc=None, gom_rc=False)
            enc = SimulcastEncoder(W, H, spatial_layers=args.spatial_layers,
                                   **enc_kw)
        else:
            enc = encoder_jax.JaxEncoder(W, H, **enc_kw)
        frames = []
        for i in range(n_frames):
            o = i * fsz
            Y = np.frombuffer(raw, np.uint8, W * H, o).reshape(H, W)
            U = np.frombuffer(raw, np.uint8, W * H // 4,
                              o + W * H).reshape(H // 2, W // 2)
            V = np.frombuffer(raw, np.uint8, W * H // 4,
                              o + W * H * 5 // 4).reshape(H // 2, W // 2)
            frames.append((Y, U, V))
        t0 = time.perf_counter()
        # runs of P frames batch into scanned multi-frame device programs
        out = b"".join(enc.encode_frames(frames))
        t1 = time.perf_counter()
        open(out_path, "wb").write(out)
        if args.stats:
            print(f"encoded {n_frames} frames {dims} -> {len(out)} bytes, "
                  f"{n_frames/(t1-t0):.1f} fps", file=sys.stderr)
        return 0

    if args.input == "roundtrip":
        path = args.output
        if not path:
            ap.error("roundtrip mode requires an input file")
        data = open(path, "rb").read()
        t0 = time.perf_counter()
        if args.shards > 1:
            pip, st = native.compress_sharded(data, args.shards)
        else:
            pip, st = native.compress(data, verify=False)
        t1 = time.perf_counter()
        out, _ = native.decompress(pip)
        t2 = time.perf_counter()
        ok = out == data
        ratio = 100.0 * (1 - len(pip) / len(data))
        print(
            f"{path}: {len(data)} -> {len(pip)} bytes ({ratio:.1f}% saved), "
            f"{st.n_frames} frames, compress {st.n_frames/(t1-t0):.1f} fps, "
            f"decompress {st.n_frames/(t2-t1):.1f} fps, "
            f"bit-exact: {'YES' if ok else 'NO'}"
        )
        if args.billing and st.bill:
            print_billing(st, len(data), len(pip))
        return 0 if ok else 1

    if not args.output:
        ap.error("output file required")
    data = open(args.input, "rb").read()
    if data[:4] in (b"PIPT", b"PIPS"):
        out, st = native.decompress(data)
        open(args.output, "wb").write(out)
        if args.stats:
            print(f"decompressed {len(data)} -> {len(out)} bytes, "
                  f"{st.n_frames} frames", file=sys.stderr)
    elif args.shards > 1:
        out, st = native.compress_sharded(data, args.shards,
                                          verify=not args.no_verify)
        open(args.output, "wb").write(out)
        if args.stats:
            ratio = 100.0 * (1 - len(out) / len(data))
            print(
                f"compressed {len(data)} -> {len(out)} bytes "
                f"({ratio:.1f}% saved), {st.n_frames} frames, "
                f"{args.shards} shards",
                file=sys.stderr,
            )
    else:
        out, st = native.compress(data, verify=not args.no_verify)
        open(args.output, "wb").write(out)
        if args.stats:
            ratio = 100.0 * (1 - len(out) / len(data))
            print(
                f"compressed {len(data)} -> {len(out)} bytes ({ratio:.1f}% saved), "
                f"{st.n_frames} frames, {st.n_fallback_slices} fallback slices",
                file=sys.stderr,
            )
    if args.billing and st.bill:
        print_billing(st, len(data), len(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
