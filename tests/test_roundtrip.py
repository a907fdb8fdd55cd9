"""Bit-exact roundtrip tests — the north-star test of the framework.

Reference parity: roundtriptest/run.sh (compress -> decompress -> diff)
over the default stream set plus the res/ conformance streams.
"""
import glob
import os

import pytest

from losslessh264_tpu import native

ROUNDTRIP = "/root/reference/roundtriptest"
RES = "/root/reference/res"


def roundtrip(path, min_savings=None, max_fallback=0):
    data = open(path, "rb").read()
    pip, st = native.compress(data, verify=False)
    out, _ = native.decompress(pip)
    assert out == data, f"reconstruction not byte-exact for {path}"
    if max_fallback is not None:
        assert st.n_fallback_slices <= max_fallback, (
            f"{st.n_fallback_slices} fallback slices in {path}"
        )
    if min_savings is not None:
        savings = 1 - len(pip) / len(data)
        assert savings >= min_savings, f"savings {savings:.3f} for {path}"
    return data, pip, st


# Reference baselines from BASELINE.md (walk.stats): savings we must beat.
def test_black():
    # reference: 14.2 %
    roundtrip(os.path.join(ROUNDTRIP, "black.264"), min_savings=0.142)


def test_tibby():
    # reference: 7.7 %
    roundtrip(os.path.join(ROUNDTRIP, "tibby.264"), min_savings=0.077)


def test_tibby8x8():
    roundtrip(os.path.join(ROUNDTRIP, "tibby8x8cavlc.264"), min_savings=0.077)


def test_tibbycabac():
    roundtrip(os.path.join(ROUNDTRIP, "tibbycabac.264"), min_savings=0.0)


def _conformance_files():
    pats = ["*.264", "*.jsv", "*.h264"]
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(os.path.join(RES, p))))
    return out


@pytest.mark.parametrize(
    "path", _conformance_files(), ids=[os.path.basename(p) for p in _conformance_files()]
)
def test_conformance_roundtrip(path):
    # every slice of every conformance stream must be entropy-modeled
    # (no verbatim fallbacks) and reconstruct byte-exactly
    roundtrip(path, min_savings=None, max_fallback=0)


def test_ba1_beats_reference():
    # reference: 12.0 %
    roundtrip(os.path.join(RES, "BA1_FT_C.264"), min_savings=0.120)


def test_bamq2_beats_reference():
    # reference EXPANDS this stream (-1.6 %); we must at least not expand
    roundtrip(os.path.join(RES, "BAMQ2_JVC_C.264"), min_savings=0.0)


def test_compress_time_verification():
    data = open(os.path.join(ROUNDTRIP, "tibby.264"), "rb").read()
    pip, _ = native.compress(data, verify=True)  # raises on mismatch
    assert len(pip) > 0


def test_sharded_roundtrip():
    # GOP-sharded parallel compression (multi-host distribution unit):
    # shards are model-independent; reconstruction must stay byte-exact
    for name in ["MIDR_MW_D.264", "BA1_FT_C.264"]:
        data = open(os.path.join(RES, name), "rb").read()
        pip, st = native.compress_sharded(data, 4)
        assert pip[:4] == b"PIPS"
        out, _ = native.decompress(pip)
        assert out == data


def test_billing_accounts_for_stream():
    data = open(os.path.join(ROUNDTRIP, "tibby.264"), "rb").read()
    pip, st = native.compress(data, verify=False)
    # both ledgers are exact (bits): see test_billing.py for the full set
    assert st.bill and round(sum(st.bill.values())) == 8 * len(pip)
    # luma AC (EOB + sign + magnitude sub-tags) is the dominant feature
    luma_ac = (st.bill["luma_ac"] + st.bill["luma_ac_sign"]
               + st.bill["luma_ac_mag"])
    assert luma_ac > 0.25 * 8 * len(pip)
