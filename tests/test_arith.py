"""Bool arithmetic coder + prior codecs selftest.

Mirrors the reference's always-on test_arithmetic_coding
(test_arithmetic_coding.cpp, run at every h264dec start).
"""
from losslessh264_tpu import native


def test_arith_selftest():
    native.selftest_arith()
