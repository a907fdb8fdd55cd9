"""Frame-level rate control for the TPU encoder.

Compact equivalent of the reference encoder's rate controller
(codec/encoder/core/src/ratectl.cpp: WelsRcFrameLevel* — linear
R-Q model `bits = X * complexity / Qstep` with a leaky virtual buffer,
per-frame QP clamped to ±DELTA of the previous frame).
"""
from __future__ import annotations


def qstep(qp: int) -> float:
    """H.264 quantizer step size (doubles every 6 QP)."""
    return 0.85 * 2.0 ** ((qp - 12) / 6.0)


class RateControl:
    MAX_DELTA_QP = 3
    BUFFER_DRAIN = 0.20     # fraction of buffer error corrected per frame

    def __init__(self, bitrate_bps: float, fps: float, qp_init: int = 32,
                 qp_min: int = 16, qp_max: int = 46, idr_weight: float = 2.5):
        self.bpf = bitrate_bps / fps
        self.qp_min, self.qp_max = qp_min, qp_max
        self.idr_weight = idr_weight
        self.prev_qp = qp_init
        self.buffer = 0.0       # bits over (+) / under (-) budget so far
        self.model_x = None     # R-Q model gain, EMA-updated
        self._last = None       # (qp, complexity, is_idr) of pending frame

    def frame_qp(self, complexity: float, is_idr: bool = False) -> int:
        """QP to use for the next frame given its (SAD) complexity."""
        target = self.bpf - self.BUFFER_DRAIN * self.buffer
        if is_idr:
            target *= self.idr_weight
        target = max(target, self.bpf * 0.1)
        if self.model_x is None or complexity <= 0:
            qp = self.prev_qp
        else:
            want_qstep = self.model_x * complexity / target
            qp = 12 + 6 * _log2(max(want_qstep / 0.85, 1e-6))
            qp = int(round(qp))
            qp = max(self.prev_qp - self.MAX_DELTA_QP,
                     min(self.prev_qp + self.MAX_DELTA_QP, qp))
        qp = max(self.qp_min, min(self.qp_max, qp))
        self._last = (qp, complexity, is_idr)
        return qp

    def gom_dqp(self, row_complexity):
        """Per-MB-row (GOM) delta-QP plane for the coming frame.

        TPU-first equivalent of the reference's per-GOM QP loop
        (ratectl.cpp WelsRcGomTargetBits/GomRC): instead of adjusting QP
        sequentially from bits spent so far inside the frame, the whole
        plane is decided up front from per-GOM complexity — rows that
        would overspend (high SAD vs the frame average) take +dqp, flat
        rows take -dqp, keeping per-GOM bits near uniform without a
        serial in-frame feedback chain."""
        import numpy as np
        c = np.asarray(row_complexity, np.float64)
        if c.size == 0 or c.mean() <= 0:
            return np.zeros(c.size, np.int32)
        ratio = np.maximum(c / c.mean(), 1e-3)
        # bits ~ complexity / Qstep and Qstep doubles per 6 QP: +2 QP
        # per doubling of relative complexity halves the overshoot
        dqp = np.round(2.0 * np.log2(ratio))
        return np.clip(dqp, -self.MAX_DELTA_QP,
                       self.MAX_DELTA_QP).astype(np.int32)

    def update(self, bits_used: float) -> None:
        """Feed back the actual size of the frame just encoded."""
        if self._last is None:
            return
        qp, complexity, is_idr = self._last
        self._last = None
        budget = self.bpf * (self.idr_weight if is_idr else 1.0)
        self.buffer += bits_used - budget
        self.prev_qp = qp
        if complexity > 0:
            x = bits_used * qstep(qp) / complexity
            self.model_x = x if self.model_x is None else (
                0.75 * self.model_x + 0.25 * x)


def _log2(v: float) -> float:
    import math
    return math.log2(v)
