"""Dual billing ledgers (reference parity: BILL_BITS original-side
accounting in dec_golomb.h:71-82 / parse_mb_syn_cavlc.cpp:640-652, the
pip_decisions ours-side ledger in compression_stream.cpp:211-234, and the
BillTally total==file-size assertion, macroblock_model.cpp:124-154)."""
import os

import pytest

from losslessh264_tpu import native
from conftest import reference_stream

STREAMS = ["tibby.264", "tibbycabac.264", "tibby8x8cavlc.264", "black.264",
           "CVPCMNL1_SVA_C.264", "SVA_FM1_E.264"]


@pytest.mark.parametrize("name", STREAMS)
def test_ledger_totals_exact(name):
    data = open(reference_stream(name), "rb").read()
    pip, st = native.compress(data, verify=False)
    # bench ledger sums to exactly the input size (in bits)
    assert st.bench, "bench ledger empty"
    assert round(sum(st.bench.values())) == 8 * len(data)
    # ours ledger sums to exactly the output size
    assert round(sum(st.bill.values())) == 8 * len(pip)


def test_ledger_feature_split():
    """The ledgers are per-feature instruments, not a single bucket: the
    load-bearing tags must be populated on a P-frame CAVLC stream."""
    data = open(reference_stream("tibby.264"), "rb").read()
    _, st = native.compress(data, verify=False)
    for tag in ("mb_type", "skip", "luma_nz", "luma_ac", "luma_run",
                "mvd_x", "mvd_y", "cbp", "qp_delta", "slice_hdr",
                "startcode"):
        assert st.bench.get(tag, 0) > 0, f"bench[{tag}] empty"
    for tag in ("mb_type", "skip", "luma_nz", "luma_ac", "mvd_x", "mvd_y",
                "cbp_luma", "container"):
        assert st.bill.get(tag, 0) > 0, f"ours[{tag}] empty"
    # CAVLC-only features never appear in the ours ledger
    assert "luma_run" not in st.bill
    assert "cbp" not in st.bill


def test_ledger_cabac():
    data = open(reference_stream("tibbycabac.264"), "rb").read()
    _, st = native.compress(data, verify=False)
    # luma position bits bill at sub-decision resolution on CABAC
    # streams (cbf / significance / last / bypass sign), matching the
    # reference's billTo granularity — not the merged luma_nz row
    for tag in ("mb_type", "skip", "cabac_cbf", "cabac_sig",
                "cabac_last", "cabac_sign", "luma_ac", "cbp_luma",
                "qp_delta", "ref_idx", "mvd_sub_x"):
        assert st.bench.get(tag, 0) > 0, f"bench[{tag}] empty"
    assert st.bench.get("luma_nz", 0) == 0  # fully resolved into sub-tags
    # both ledgers still sum exactly to their file sizes
    assert round(sum(st.bench.values())) == 8 * len(data)


def test_ledger_sharded():
    data = open(reference_stream("tibby.264"), "rb").read()
    pip, st = native.compress_sharded(data, 3, verify=False)
    assert round(sum(st.bench.values())) == 8 * len(data)
    assert round(sum(st.bill.values())) == 8 * len(pip)
