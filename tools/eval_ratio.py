"""Model-iteration harness: compression ratio over the tuning corpus.

Usage: python tools/eval_ratio.py [--save tag] [--diff tagA tagB]

Prints per-stream savings and a corpus total; --save records results to
/tmp/ratio_<tag>.json so successive model changes can be diffed.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from losslessh264_tpu import native  # noqa: E402

RT = "/root/reference/roundtriptest"
RES = "/root/reference/res"
STREAMS = [
    f"{RT}/tibby.264",
    f"{RT}/tibby8x8cavlc.264",
    f"{RT}/tibbycabac.264",
    f"{RT}/black.264",
    f"{RES}/BA1_FT_C.264",
    f"{RES}/BAMQ2_JVC_C.264",
    f"{RES}/test_qcif_cabac.264",
    f"{RES}/SVA_BA2_D.264",
    f"{RES}/BA_MW_D.264",
]

# reference (walk.stats) .pip sizes where known, else None
REF_PIP = {
    "tibby.264": 114003,
    "black.264": 3295,
    "BAMQ2_JVC_C.264": 262594,
    "BA1_FT_C.264": 545765,
}


def main():
    results = {}
    t_in = t_out = 0
    t0 = time.perf_counter()
    for path in STREAMS:
        name = os.path.basename(path)
        data = open(path, "rb").read()
        pip, st = native.compress(data, verify=False)
        out, _ = native.decompress(pip)
        ok = out == data
        results[name] = {"in": len(data), "pip": len(pip), "exact": ok}
        t_in += len(data)
        t_out += len(pip)
        ref = REF_PIP.get(name)
        refs = f"  ref {ref:>8}" if ref else ""
        flag = "" if ok else "  *** NOT EXACT ***"
        print(f"{name:28s} {len(data):>8} -> {len(pip):>8}  "
              f"({100 * (1 - len(pip) / len(data)):6.2f}%){refs}{flag}")
    dt = time.perf_counter() - t0
    print(f"{'TOTAL':28s} {t_in:>8} -> {t_out:>8}  "
          f"({100 * (1 - t_out / t_in):6.2f}%)   [{dt:.1f}s]")

    args = sys.argv[1:]
    if args[:1] == ["--save"]:
        with open(f"/tmp/ratio_{args[1]}.json", "w") as f:
            json.dump(results, f)
    if args[:1] == ["--diff"]:
        a = json.load(open(f"/tmp/ratio_{args[1]}.json"))
        print(f"\nvs {args[1]}:")
        for name, r in results.items():
            if name in a:
                d = r["pip"] - a[name]["pip"]
                print(f"  {name:28s} {d:+8d} bytes")


if __name__ == "__main__":
    main()
