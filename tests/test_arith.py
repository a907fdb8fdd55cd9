"""Bool arithmetic coder + prior codecs selftest.

Mirrors the reference's always-on test_arithmetic_coding
(test_arithmetic_coding.cpp, run at every h264dec start).
"""
from losslessh264_tpu import native


def test_arith_selftest():
    native.selftest_arith()


def test_prior_stats(monkeypatch, tibby_264):
    """PIP_PRIOR_STATS exposes per-feature adaptive-coder hit rates
    (reference PRIOR_STATS analog)."""
    import os

    from losslessh264_tpu import native
    monkeypatch.setenv("PIP_PRIOR_STATS", "1")
    data = open(tibby_264, "rb").read()
    pip, st = native.compress(data, verify=False)
    assert st.prior and "luma_ac" in st.prior
    tot, hits = st.prior["luma_ac"]
    assert 0 < hits <= tot
    assert hits / tot > 0.5  # the model predicts better than a coin
